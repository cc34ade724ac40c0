package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trained quality filter: on a corpus with a planted lexical signal
  * (reference-style vs boilerplate-style vocabulary, with shared filler
  * words), batch-GD logistic regression over hashed bag-of-words must
  * separate held-out documents. Gates are threshold-based (AUC/accuracy),
  * not bit-exact: double gradient sums are reduction-order dependent by
  * design; what is contracted is the LEARNED SEPARATION. */
class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic synthetic corpus: 120 docs, planted vocabulary signal
  def corpus = {
    val good = Seq("concise", "cited", "structured", "measured", "precise")
    val bad = Seq("clickbait", "spammy", "keyword", "stuffed", "reposted")
    val fill = Seq("the", "of", "and", "data", "table")
    val docs = (0 until 120).map { i =>
      val r = new scala.util.Random(i)
      val isGood = i % 2 == 0
      val pool = (if (isGood) good else bad) ++ fill
      val words = (0 until 30).map(_ => pool(r.nextInt(pool.size)))
      (i.toLong, words.mkString(" "), if (isGood) 1 else 0)
    }
    docs.toDF("doc_id", "text", "label")
  }

  test("learns the planted signal: held-out accuracy >= 0.9") {
    val df = corpus
    val train = df.filter(col("doc_id") % 3 =!= 0)
    val test = df.filter(col("doc_id") % 3 === 0)
    val m = QualityClassifier.train(train, "doc_id", col("text"),
      col("label"), iters = 40, lr = 4.0)
    val scored = QualityClassifier.score(test, "doc_id", col("text"), m)
      .join(test.select(col("doc_id"), col("label")), "doc_id")
    val acc = scored
      .select(((col("p_quality") > 0.5).cast("int") === col("label"))
        .cast("int").as("ok"))
      .agg(avg(col("ok"))).head().getDouble(0)
    assert(acc >= 0.9, s"held-out accuracy $acc")
    // probabilities must actually separate, not hover at 0.5
    val gap = scored.groupBy(col("label"))
      .agg(avg(col("p_quality")).as("p"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(gap(1) - gap(0) > 0.3, s"separation too weak: $gap")
  }

  test("feature extraction is L1-normalized and 256-bucketed") {
    val f = QualityClassifier.features(
      Seq((1L, "a b a")).toDF("doc_id", "text"), "doc_id", col("text"))
      .collect()
    assert(f.map(_.getDouble(2)).sum == 1.0)
    assert(f.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 256))
  }
}
