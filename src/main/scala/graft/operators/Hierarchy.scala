package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rooted-hierarchy flattening: (key, parent) edges of a forest → one row
  * per node carrying its TOP-LEVEL ancestor (the root's direct child — the
  * "category" a node rolls up to) and its depth below that ancestor. The
  * classic dim-hierarchy/BOM/org-chart flatten that warehouses spell
  * `WITH RECURSIVE` (the DuckDB oracle form for q54).
  *
  * A literal per-level recursion is depth-many sequential joins — wrong at
  * 100 TB where a deep chain serializes the whole job. This uses POINTER
  * DOUBLING instead: each round replaces every node's ancestor pointer with
  * its ancestor's ancestor and accumulates the hop distance, so round r
  * reaches 2^r levels — a FIXED `doublingRounds` of node-keyed hash joins
  * covers any depth ≤ 2^rounds (6 rounds = depth 64, beyond any real
  * dimension hierarchy; keys would overflow 64 bits before a halving
  * parent chain exceeds it). Top-level nodes self-loop with distance 0, so
  * overshooting is idempotent and the fixed round count keeps the operator
  * a pure deterministic query — no driver-side convergence loop.
  *
  * Scale notes: state is three longs per node; every join is a hash join
  * keyed on the node id (shuffle-partitioned, nothing broadcast). Each
  * round is truncated with an EAGER localCheckpoint — the round self-joins
  * its own previous output, so without truncation the logical plan doubles
  * per round (the Cluster.connectedComponents lesson, PLANS.md); these
  * node-keyed joins never want broadcast, so the checkpoint's stats loss
  * is immaterial.
  */
object Hierarchy {

  /** Flatten a forest given as (keyCol, parentCol) rows. Nodes whose
    * parent equals `rootParent` — or is NULL, the other common "no
    * parent" encoding — are top-level (their own top ancestor, depth 0).
    * Every non-top parent value must itself appear as a key (closure);
    * unknown parents are treated as top boundaries.
    *
    * Returns (k, top_key, depth) with the input key column renamed `k`.
    */
  def flatten(nodes: DataFrame, keyCol: String, parentCol: String,
      rootParent: Long = 0L, doublingRounds: Int = 6): DataFrame = {
    val isTop = col(parentCol).isNull || col(parentCol) === rootParent
    var cur = nodes.select(
      col(keyCol).cast("long").as("k"),
      when(isTop, col(keyCol))
        .otherwise(col(parentCol)).cast("long").as("anc"),
      when(isTop, lit(0L)).otherwise(lit(1L))
        .as("d"))
      .localCheckpoint(true)
    (1 to doublingRounds).foreach { _ =>
      cur = cur.as("A")
        .join(cur.select(col("k").as("b_k"), col("anc").as("b_anc"),
          col("d").as("b_d")).as("B"),
          col("A.anc") === col("B.b_k"), "left")
        .select(col("A.k").as("k"),
          coalesce(col("b_anc"), col("A.anc")).as("anc"),
          (col("A.d") + coalesce(col("b_d"), lit(0L))).as("d"))
        .localCheckpoint(true)
    }
    cur.select(col("k"), col("anc").as("top_key"), col("d").as("depth"))
  }
}
