package graft.operators

import graft.functions.TextFns.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MODEL-BASED quality filtering — the classifier step the published
  * curation pipelines run after rule-based scoring: CCNet's fasttext
  * language-model filter, GPT-3/The Pile's "looks like reference text"
  * logistic filter, FineWeb-Edu's educational-value classifier. The
  * heuristic passes (t02 quality score) catch structural junk; a trained
  * classifier catches junk that LOOKS structurally fine by learning from
  * labeled exemplars ("reference-quality" vs "crawl-quality").
  *
  * Model: logistic regression over HASHED bag-of-words features (the
  * fasttext trick — a fixed B-bucket hash space instead of a learned
  * vocabulary, so the model is a B+1 double array and feature extraction
  * is vocabulary-free). Hashing reuses t19's engine-portable recipe:
  * bucket = first 2 hex digits of md5(token).
  *
  * Scale design: the corpus folds ONCE into a (doc, bucket, n) feature
  * table — one narrow explode + one map-side-combined aggregate — and
  * every training iteration runs on that table: scores via a broadcast
  * join with the B-row weight table (no corpus re-read, no re-tokenize),
  * per-bucket gradients via one pair-keyed aggregate. The driver holds
  * only the B+1 weights; batch gradient descent, so each iteration is a
  * fixed 2-shuffle dataflow regardless of corpus size. Inference is the
  * same broadcast join without the gradient leg.
  */
object QualityClassifier {

  /** Trained model: `weights(b)` per hash bucket + intercept. */
  final case class Model(weights: Array[Double], bias: Double,
      buckets: Int) {
    require(weights.length == buckets)
  }

  /** Engine-portable token bucket in [0, 256): first 2 hex digits of
    * md5(token) — the t19 hashed-feature recipe. */
  def bucket(tok: Column): Column =
    conv(substring(md5(tok), 1, 2), 16, 10).cast("int")

  /** (id, bucket, x) L1-normalized hashed bag-of-words — built once,
    * persisted by the caller across training iterations. */
  def features(df: DataFrame, id: String, text: Column): DataFrame =
    df.select(col(id), explode(tokens(text)).as("tok"))
      .select(col(id), bucket(col("tok")).as("bucket"))
      .groupBy(col(id), col("bucket")).agg(count(lit(1)).as("n"))
      .withColumn("x", col("n").cast("double") /
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(id))))
      .drop("n")

  private def weightDf(feats: DataFrame, m: Model): DataFrame = {
    val s = feats.sparkSession
    import s.implicits._
    broadcast(m.weights.toSeq.zipWithIndex
      .map { case (w, b) => (b, w) }.toDF("bucket", "w"))
  }

  /** Per-doc raw score w·x + bias over a feature table. */
  private def scores(feats: DataFrame, id: String, m: Model): DataFrame =
    feats.join(weightDf(feats, m), "bucket")
      .groupBy(col(id))
      .agg((sum(col("x") * col("w")) + lit(m.bias)).as("score"))

  /** Batch-gradient-descent training on (id, text, label∈{0,1}).
    * `iters` fixed full-batch iterations at rate `lr` — each is one
    * broadcast-join score pass + one bucket-keyed gradient aggregate.
    * The feature table is built once and localCheckpointed. */
  def train(df: DataFrame, id: String, text: Column, label: Column,
      buckets: Int = 256, iters: Int = 50, lr: Double = 2.0): Model = {
    require(buckets == 256, "bucket() hashes to 256 buckets")
    val labels = df.select(col(id), label.cast("double").as("y"))
    val feats = features(df, id, text).join(labels, id).localCheckpoint()
    val n = feats.select(col(id)).distinct().count().toDouble
    var m = Model(Array.fill(buckets)(0.0), 0.0, buckets)
    var it = 0
    while (it < iters) {
      // err = sigmoid(w·x + b) - y, one row per doc
      val err = scores(feats, id, m)
        .join(labels, id)
        .select(col(id),
          (lit(1.0) / (lit(1.0) + exp(-col("score"))) - col("y")).as("err"))
      // per-bucket gradient: Σ err·x / n ; bias: Σ err / n
      val grad = feats.join(err, id)
        .groupBy(col("bucket"))
        .agg(sum(col("x") * col("err")).as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val biasGrad = err.agg(sum(col("err"))).head().getDouble(0) / n
      val w = m.weights.clone()
      grad.foreach { case (b, g) => w(b) -= lr * g / n }
      m = Model(w, m.bias - lr * biasGrad, buckets)
      it += 1
    }
    m
  }

  /** Per-doc quality probability under a trained model. */
  def score(df: DataFrame, id: String, text: Column, m: Model): DataFrame =
    scores(features(df, id, text), id, m)
      .select(col(id),
        (lit(1.0) / (lit(1.0) + exp(-col("score")))).as("p_quality"))
}
