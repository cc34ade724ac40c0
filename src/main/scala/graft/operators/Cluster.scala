package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected-component style clustering by iterative min-label
  * propagation — the canonicalization step after near-dup pair detection
  * (LSH gives PAIRS; dedup needs GROUPS: every doc in a near-dup cluster
  * maps to one canonical id).
  *
  * Each round every node takes the min of its own label and its
  * neighbors' labels; after k rounds labels are exact for components of
  * diameter ≤ k and a deterministic function of the edge set otherwise —
  * near-dup clusters are short-diameter in practice, and a FIXED round
  * count keeps the operator a pure deterministic query (oracle-matchable;
  * no driver-side convergence loop deciding when to stop).
  *
  * Scale notes: one round = two hash joins + one aggregation, all keyed
  * on node id — shuffle-partitioned, no broadcast of anything unbounded.
  * Labels are cached per round (at cluster scale: checkpointed) so round
  * r+1 reads materialized round-r output instead of re-deriving the
  * whole lineage (which doubles per round otherwise).
  */
object Cluster {

  /** Undirected edges (u, v) → (doc_id, lbl) after `rounds` rounds of
    * min-label propagation. Nodes are the endpoints of the edges. */
  def minLabelPropagation(pairs: DataFrame, aCol: String, bCol: String,
      rounds: Int): DataFrame = {
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .cache()
    val nodes = edges.select(col("u").as("doc_id")).distinct()
    var labels = nodes.withColumn("lbl", col("doc_id")).cache()
    (1 to rounds).foreach { _ =>
      // string-aliased frames: labels appears twice (self-join), so
      // dataset-apply column refs would be ambiguous
      val next = labels.as("L")
        .join(edges.as("E"), col("L.doc_id") === col("E.u"), "left")
        .join(labels.select(col("doc_id").as("n_id"),
          col("lbl").as("n_lbl")).as("R"),
          col("E.v") === col("R.n_id"), "left")
        .groupBy(col("L.doc_id").as("doc_id"), col("L.lbl").as("lbl"))
        .agg(min(col("n_lbl")).as("min_n"))
        .select(col("doc_id"),
          least(col("lbl"), coalesce(col("min_n"), col("lbl"))).as("lbl"))
        .cache()
      // Materialize round r eagerly so round r-1's cache (its only
      // remaining consumer) can be dropped NOW — without this the operator
      // leaks one InMemoryRelation per round into the session until the
      // caller clears the whole cache. Caches are label-sized (two longs
      // per clustered node); the count is a tiny job. At cluster scale,
      // checkpoint each round instead.
      next.count()
      labels.unpersist()
      labels = next
    }
    // the final round is materialized above, so the edge cache (feeding
    // only lineage, not the cached result) can go too
    edges.unpersist()
    // the returned frame holds the ONE remaining label-sized cache;
    // callers drop it with unpersist()/clearCache() when done
    labels
  }

  /** Convenience: cluster id per node + canonical flag. */
  def canonicalize(pairs: DataFrame, aCol: String, bCol: String,
      rounds: Int): DataFrame =
    minLabelPropagation(pairs, aCol, bCol, rounds)
      .select(col("doc_id"), col("lbl").as("cluster_id"),
        (col("doc_id") === col("lbl")).as("is_canonical"))
}
