package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Cross-run incremental dedup via a Bloom membership sketch of the
  * HISTORICAL corpus — the shape that keeps "is this new document a
  * duplicate of anything we already hold?" cheap at 100 TB: the history
  * is folded ONCE into a KB–MB bloom (mergeable per-partition, exact OR
  * on the driver), every new batch probes the broadcast sketch as a pure
  * codegen'd column (no false negatives), and only the tiny
  * might-contain subset (true dups + fpp of the batch) pays an exact
  * anti-join against the history. Definite-new rows never touch the
  * history at all.
  *
  * Uses Spark's own native bloom expressions (the ones InjectRuntimeFilter
  * plans for runtime join pruning — see PlanAuditSpec) via the Bridge
  * shim, not a UDF: the probe stays inside whole-stage codegen.
  */
object BloomDedup {

  /** Fold `key` into a serialized bloom filter sized for `expectedItems`
    * at ~`fpp` false-positive rate (m = -n·ln p / ln²2 bits). */
  def buildSketch(df: DataFrame, key: Column, expectedItems: Long,
                  fpp: Double = 0.01): Array[Byte] = {
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.toExpression(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    df.select(Bridge.toColumn(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Pure column: may `key` be in the sketch? (false ⇒ definitely new) */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    Bridge.toColumn(BloomFilterMightContain(
      Literal.create(sketch, BinaryType),
      new XxHash64(Seq(Bridge.toExpression(key)))))

  /** Rows of `batch` whose `key` is NOT present in `history`: bloom
    * pre-filter, then exact anti-join for the might-contain survivors
    * only. */
  def filterNew(batch: DataFrame, history: DataFrame, key: String,
                expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val sketch = buildSketch(history, col(key), expectedItems, fpp)
    // BloomFilterAggregate over ZERO input rows yields a null sketch, and
    // mightContain(null, k) is null — which BOTH filters below would drop,
    // silently losing the whole batch. Empty history ⇒ nothing can be a
    // duplicate ⇒ the batch passes through unchanged.
    if (sketch == null) return batch
    val flagged = batch.withColumn("__maybe",
      mightContain(sketch, col(key)))
    val definiteNew = flagged.filter(!col("__maybe")).drop("__maybe")
    val verified = flagged.filter(col("__maybe")).drop("__maybe")
      .join(history.select(col(key)).distinct(), Seq(key), "left_anti")
    definiteNew.unionByName(verified)
  }
}
