package graft.operators

import graft.functions.TextFns.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Library API for per-document corpus scoring over ANY (id, text) frame
  * — the operator forms behind catalog queries t01 (language ID), t02
  * (quality score), and t07 (hash split), which delegate here. All three
  * are the narrow shapes you want at 100 TB: language ID is one exploded
  * hash-aggregate back-joined on the id, quality scoring and splitting
  * are pure per-row column work with zero shuffles.
  */
object CorpusOps {

  /** Marker-token language ID: adds one `score_<lang>` column per
    * language (marker hits with multiplicity) and `pred_lang` (argmax,
    * lexicographic tiebreak). The text column is dropped before the
    * count back-join so payload never shuffles. */
  def languageId(src: DataFrame, idCol: String, textCol: String,
                 markers: Seq[(String, Seq[String])]): DataFrame = {
    val base = src.select(col(idCol), tokens(col(textCol)).as("__t"))
    val scoreAggs = markers.map { case (lang, words) =>
      sum(when(col("__tok").isin(words: _*), 1).otherwise(0))
        .cast("int").as(s"score_$lang")
    }
    val counts = base
      .select(col(idCol), explode(col("__t")).as("__tok"))
      .groupBy(col(idCol))
      .agg(scoreAggs.head, scoreAggs.tail: _*)
    val scored = src.drop(textCol)
      .join(counts, Seq(idCol), "left")
      .na.fill(0, markers.map(m => s"score_${m._1}"))
    val langs = markers.map(_._1)
    val pred = langs.foldRight(lit(langs.last)) { case (lang, rest) =>
      val isMax = langs.filter(_ != lang)
        .map(o => col(s"score_$lang") >= col(s"score_$o"))
        .reduce(_ && _)
      when(isMax, lit(lang)).otherwise(rest)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** Length/stopword/distinct-ratio quality scoring: adds the count and
    * ratio columns plus the `quality_ok` gate; drops the text. Pure
    * per-row array work — no shuffle at any corpus size. */
  def qualityScore(src: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String], minTokens: Int = 20,
                   maxStopRatio: Double = 0.2,
                   minDistinctRatio: Double = 0.1): DataFrame =
    src
      .withColumn("n_chars_actual", length(col(textCol)))
      .withColumn("__t", tokens(col(textCol)))
      .withColumn("n_tokens", size(col("__t")))
      .withColumn("n_stop",
        size(filter(col("__t"), x => x.isin(stopwords: _*))))
      .withColumn("n_distinct", size(array_distinct(col("__t"))))
      .withColumn("sum_tok_len",
        aggregate(transform(col("__t"), t => length(t)), lit(0),
          (a, x) => a + x))
      .withColumn("avg_token_len",
        col("sum_tok_len").cast("double") / col("n_tokens"))
      .withColumn("stopword_ratio",
        col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("distinct_ratio",
        col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("quality_ok",
        col("n_tokens") >= minTokens &&
          col("stopword_ratio") <= maxStopRatio &&
          col("distinct_ratio") >= minDistinctRatio)
      .drop("__t", "sum_tok_len", textCol)

  /** Deterministic md5-bucket split (t07's idiom): adds `bucket`
    * (0-999 from the id hash) and `split` — content-independent, stable
    * across engines/recomputes/repartitions, no RNG. */
  def hashSplit(src: DataFrame, idCol: String,
                trainPermille: Int = 800,
                valPermille: Int = 900): DataFrame = {
    val bucket = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(1000L))
    src.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < trainPermille, "train")
          .when(col("bucket") < valPermille, "val").otherwise("test"))
  }
}
