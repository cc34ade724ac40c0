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

  /** Eagerly materialize `df` with TRUNCATED lineage. The form depends
    * on the session: with a checkpoint dir configured
    * (`sc.setCheckpointDir` — the cluster-scale deployment step) a
    * RELIABLE checkpoint is taken, whose blocks survive executor loss
    * (dynamic allocation, spot decommissions); otherwise an eager
    * `localCheckpoint`, whose documented caveat — blocks die with
    * their executor — is immaterial in local/single-host mode, where
    * this engine's tests and benches run. Same results either way;
    * the cluster operator opts into durability with one line. */
  private def truncated(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(true)

  /** Free a RETIRED round's reliable-checkpoint files NOW (no-op for
    * localCheckpoint rounds, whose blocks the ContextCleaner reclaims
    * on GC). The ContextCleaner deletes reliable-checkpoint FILES only
    * under `spark.cleaner.referenceTracking.cleanCheckpoints=true`
    * (default false), so without this every round would leak one
    * `rdd-<id>` directory for the life of the session. Only safe once
    * no live plan references the frame — callers invoke it strictly
    * AFTER the next round has materialized to its OWN files. */
  private def dropRetired(df: DataFrame): Unit =
    org.apache.spark.sql.graft.Bridge.checkpointFile(df).foreach { dir =>
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }

  /** Undirected edges (u, v) → (doc_id, lbl) after `rounds` rounds of
    * min-label propagation. Nodes are the endpoints of the edges.
    *
    * Each round's labels are materialized eagerly; `checkpoint` picks
    * HOW (results are identical — OperatorsSpec pins the equivalence):
    *
    *  - `true` (default, the cluster-scale form): EAGER
    *    `localCheckpoint` — same materialization cost as cache+count,
    *    but it also TRUNCATES the logical plan to a leaf. The round
    *    body self-joins the previous labels TWICE, so the cached
    *    variant's plan tree doubles per round — recomputation is
    *    stopped by the cache, but driver-side analysis/AQE planning
    *    cost (and at ≥10 rounds, plan-string rendering) grows with the
    *    tree, the round-10 verdict's "first thing to fall over at
    *    100×". Stats loss is immaterial here: node-keyed joins are the
    *    shuffle joins a propagation pass wants, and AQE still converts
    *    label-sized sides to broadcast at runtime from observed sizes.
    *    A retired round's localCheckpoint blocks are dropped by the
    *    ContextCleaner when the frame goes out of scope; a retired
    *    round's RELIABLE checkpoint files are deleted eagerly by the
    *    loop itself (dropRetired) — the ContextCleaner never deletes
    *    checkpoint FILES under the default
    *    cleanCheckpoints=false.
    *  - `false`: per-round cache + count + explicit unpersist of the
    *    retired round — keeps full lineage (useful when a caller wants
    *    Catalyst to see through the rounds, e.g. tiny fixed-round runs
    *    feeding a hinted-broadcast pipeline). */
  def minLabelPropagation(pairs: DataFrame, aCol: String, bCol: String,
      rounds: Int, checkpoint: Boolean = true): DataFrame = {
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .cache()
    def materialize(df: DataFrame): DataFrame =
      if (checkpoint) truncated(df)
      else { df.cache(); df.count(); df }
    val nodes = edges.select(col("u").as("doc_id")).distinct()
    var labels = materialize(nodes.withColumn("lbl", col("doc_id")))
    (1 to rounds).foreach { _ =>
      // string-aliased frames: labels appears twice (self-join), so
      // dataset-apply column refs would be ambiguous
      val next = materialize(labels.as("L")
        .join(edges.as("E"), col("L.doc_id") === col("E.u"), "left")
        .join(labels.select(col("doc_id").as("n_id"),
          col("lbl").as("n_lbl")).as("R"),
          col("E.v") === col("R.n_id"), "left")
        .groupBy(col("L.doc_id").as("doc_id"), col("L.lbl").as("lbl"))
        .agg(min(col("n_lbl")).as("min_n"))
        .select(col("doc_id"),
          least(col("lbl"), coalesce(col("min_n"), col("lbl"))).as("lbl")))
      // round r is materialized, so round r-1 (its only remaining
      // consumer is gone) can be freed NOW — in cache mode the
      // unpersist drops the InMemoryRelation the operator would
      // otherwise leak per round; in reliable-checkpoint mode
      // dropRetired deletes the retired round's rdd-<id> files, which
      // the ContextCleaner never would (cleanCheckpoints defaults
      // false); in localCheckpoint mode both are harmless no-ops
      labels.unpersist()
      // only the truncated modes own their materialization; in cache
      // mode the frame's lineage may CONTAIN caller-owned checkpoints
      // (Bridge.checkpointFile is root-only, but don't even look)
      if (checkpoint) dropRetired(labels)
      labels = next
    }
    // the final round is materialized above, so the edge cache (feeding
    // only lineage, not the materialized result) can go too
    edges.unpersist()
    // the returned frame holds the ONE remaining label-sized
    // materialization; cache-mode callers drop it with unpersist()/
    // clearCache(); localCheckpoint blocks free with the frame; the
    // FINAL round's reliable-checkpoint directory (one per call) backs
    // the returned frame, so it lives until cleanCheckpoints reclaims
    // it or the session's checkpoint dir is removed
    labels
  }

  /** Convenience: cluster id per node + canonical flag. */
  def canonicalize(pairs: DataFrame, aCol: String, bCol: String,
      rounds: Int, checkpoint: Boolean = true): DataFrame =
    minLabelPropagation(pairs, aCol, bCol, rounds, checkpoint)
      .select(col("doc_id"), col("lbl").as("cluster_id"),
        (col("doc_id") === col("lbl")).as("is_canonical"))

  /** EXACT connected components for graphs of ANY diameter: min-label
    * propagation with POINTER JUMPING (each round also replaces every
    * label by its label's label, so label information travels doubling
    * distances — the large-star/small-star family), iterated to a fixed
    * point. Where `minLabelPropagation`'s fixed round count is exact only
    * up to diameter k (the right contract for an oracle-matchable catalog
    * query over shallow near-dup clusters), this is the LIBRARY form for
    * arbitrary graphs: a 10k-node path converges in ~log₂ rounds, not
    * 10k. Each round is three node-keyed hash joins + one aggregation —
    * nothing broadcast, nothing driver-sized except the per-round change
    * count that decides convergence.
    *
    * Each round's labels are truncated with an EAGER localCheckpoint, not
    * cache(): the round's frame self-joins the previous round's TWICE, so
    * while a cache would stop recomputation, the LOGICAL plan would still
    * quadruple per round — by round ~10 the plan tree itself (and AQE's
    * plan-string rendering) OOMs the driver. Checkpointing cuts the
    * lineage to a leaf each round; the stats loss that makes checkpoint
    * wrong for d02's hinted-broadcast pipeline (PLANS.md) is immaterial
    * here — these node-keyed joins are the shuffle joins a converging
    * graph pass wants anyway. Returns (labels, rounds run). */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 50): (DataFrame, Int) = {
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .cache()
    val nodes = edges.select(col("u").as("doc_id")).distinct()
    var labels = nodes.withColumn("lbl", col("doc_id"))
      .transform(truncated)
    var rounds = 0
    var changed = 1L
    while (changed > 0 && rounds < maxRounds) {
      // neighbor min — one minLabelPropagation round
      val prop = labels.as("L")
        .join(edges.as("E"), col("L.doc_id") === col("E.u"), "left")
        .join(labels.select(col("doc_id").as("n_id"),
          col("lbl").as("n_lbl")).as("R"),
          col("E.v") === col("R.n_id"), "left")
        .groupBy(col("L.doc_id").as("doc_id"), col("L.lbl").as("lbl"))
        .agg(min(col("n_lbl")).as("min_n"))
        .select(col("doc_id"),
          least(col("lbl"), coalesce(col("min_n"), col("lbl"))).as("lbl"))
        .transform(truncated)
      // pointer jump: lbl := lbl(lbl) — labels are node ids, so chase
      // one hop through the label table itself; this is what turns the
      // per-round propagation radius from +1 into ×2
      val jumped = prop.as("P")
        .join(prop.select(col("doc_id").as("p_id"),
          col("lbl").as("p_lbl")).as("J"),
          col("P.lbl") === col("J.p_id"), "left")
        .select(col("P.doc_id").as("doc_id"),
          coalesce(col("J.p_lbl"), col("P.lbl")).as("lbl"))
        .transform(truncated)
      changed = jumped.as("N")
        .join(labels.select(col("doc_id"),
          col("lbl").as("__old")).as("O"), Seq("doc_id"))
        .filter(col("lbl") =!= col("__old")).count()
      // jumped is materialized and the change count has consumed the
      // old labels — free the round's two retired checkpoints (prop
      // fed only jumped; old labels fed only the count)
      dropRetired(prop)
      dropRetired(labels)
      labels = jumped
      rounds += 1
    }
    edges.unpersist()
    (labels, rounds)
  }
}
