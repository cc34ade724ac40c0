package graft

import graft.operators.BloomDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom pre-filter contract: zero false negatives (every historical key
  * probes true), filterNew returns exactly the genuinely-new keys, and
  * the sketch's false-positive rate stays near its design point — the
  * properties that make the history-join skippable for most of a batch. */
class BloomDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def history = spark.range(0, 1000).select(
    concat(lit("doc_"), col("id")).as("text_hash"),
    col("id").as("hist_id"))

  test("no false negatives: every historical key might-contain = true") {
    val sketch = BloomDedup.buildSketch(history, col("text_hash"), 1000)
    val misses = history
      .filter(!BloomDedup.mightContain(sketch, col("text_hash")))
      .count()
    assert(misses == 0)
  }

  test("filterNew keeps exactly the genuinely-new keys") {
    // batch: 500 overlapping (doc_0..499), 500 new (new_0..499)
    val batch = spark.range(0, 1000).select(
      when(col("id") < 500, concat(lit("doc_"), col("id")))
        .otherwise(concat(lit("new_"), col("id") - 500)).as("text_hash"),
      col("id").as("batch_id"))
    val kept = BloomDedup.filterNew(batch, history, "text_hash", 1000)
    assert(kept.count() == 500)
    assert(kept.filter(col("text_hash").startsWith("doc_")).count() == 0)
  }

  test("empty history: the whole batch is new (null-sketch guard)") {
    // BloomFilterAggregate over zero rows yields a NULL sketch; without
    // the guard, mightContain(null, k) is null and both filter branches
    // would silently drop every row of the batch
    val emptyHist = history.filter(lit(false))
    val batch = spark.range(0, 100).select(
      concat(lit("doc_"), col("id")).as("text_hash"))
    assert(BloomDedup.filterNew(batch, emptyHist, "text_hash", 1000)
      .count() == 100)
  }

  test("false-positive rate stays near the design fpp") {
    val sketch = BloomDedup.buildSketch(history, col("text_hash"), 1000,
      fpp = 0.01)
    val probes = spark.range(0, 10000)
      .select(concat(lit("absent_"), col("id")).as("k"))
    val fp = probes.filter(BloomDedup.mightContain(sketch, col("k")))
      .count()
    // design point 1% over 10k absent probes; generous 3x headroom
    assert(fp <= 300, s"false-positive count $fp exceeds 3x design fpp")
  }
}
