package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing (concat-and-chunk): lay a shard's rows end-to-end in
  * a deterministic order and cut the token stream into fixed-capacity
  * chunks — the layout step between corpus curation and training. Each
  * row learns its byte-offset placement (`start_offset`/`cum_end`) and
  * the chunk range it spans; a row crossing a capacity boundary is split
  * across consecutive chunks, which is exactly GPT-style
  * concatenate-then-chunk pretraining layout.
  *
  * Scale: the window partitions by `shard` — packing parallelizes across
  * shards, state per task is one running sum. A GLOBAL (un-partitioned)
  * running sum would plan a single-task window; at 100 TB you always
  * pack within shards (source, date, split, …) and accept ≤1 partial
  * chunk of waste per shard boundary.
  */
object Packing {

  /** Add packing columns to `df`: running `cum_end`, `start_offset`, and
    * the inclusive `first_chunk`/`last_chunk` range plus `n_chunks`.
    * `order` must be a total order within a shard or placement is
    * nondeterministic. All arithmetic is integer-exact. */
  def pack(df: DataFrame, shard: Column, order: Column, nTokens: Column,
           capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val w = Window.partitionBy(shard).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_end", sum(nTokens.cast("long")).over(w))
      .withColumn("start_offset", col("cum_end") - nTokens)
      .withColumn("first_chunk", floor(col("start_offset") / capacity))
      .withColumn("last_chunk", floor((col("cum_end") - 1) / capacity))
      .withColumn("n_chunks",
        col("last_chunk") - col("first_chunk") + lit(1L))
  }
}
