package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The approximate dedup operators are not just deterministic — they are
  * GOOD: measured against the exact ground truth on the correctness-scale
  * corpus. (LSH theory at 8 bands × 2 rows: detection probability
  * 1-(1-j²)⁸ ≈ 0.90 at j = 0.5 and → 1 as j → 1; these assertions pin the
  * measured recall so a regression in banding/signatures fails loudly.)
  */
class RecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.01"

  private def q(name: String) =
    SparkEntry.catalog.find(_.name == name).get.run(spark, sf)

  private def pairSet(df: org.apache.spark.sql.DataFrame,
      a: String, b: String): Set[(Long, Long)] =
    df.select(col(a), col(b)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("d02 MinHash+LSH recalls ≥ 80% of true near-dup pairs (j ≥ 0.5)") {
    // ground truth: the exact all-pairs query, tightened to d02's threshold
    val truth = pairSet(q("d04_ngram_jaccard")
      .filter(col("jaccard") >= 0.5), "doc_a", "doc_b")
    val found = pairSet(q("d02_minhash_lsh"), "doc_a", "doc_b")
    assert(truth.nonEmpty)
    val recall = (truth & found).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall over ${truth.size} true pairs")
    // and no false positives: d02 verifies candidates with exact jaccard
    assert((found -- truth).isEmpty)
    // (identical-input ⇒ identical-signature is covered by PropertySpec;
    // this corpus contains near-dups but no byte-identical texts)
  }

  test("IVF probe search (s04) recalls ≥ 80% of brute-force top-5" +
      " neighbors on the shared query set") {
    // s01 is the exact baseline (top-10 for queries 0-4); s04 probes 2 of
    // 8 cells. Measured recall@5 on this corpus: 0.92 — assert a margin
    // below so only a real regression (not a reseeded corpus) fails.
    val truth = q("s01_knn_brute").filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val found = q("s04_ivf_search")
      .select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = truth.map { case (qid, t) =>
      (t & found.getOrElse(qid, Set.empty)).size.toDouble / t.size
    }
    assert(recalls.sum / recalls.size >= 0.8,
      s"avg recall ${recalls.sum / recalls.size}")
  }

  test("quantized+rerank search (s05) recalls ≥ 90% of brute-force top-5" +
      " neighbors on the shared query set") {
    // SQ8 loses precision only in the candidate CUT (top-20 by quantized
    // cosine); the exact re-rank cannot introduce false neighbors, so
    // any loss vs s01 means a true neighbor fell below quantized rank 20.
    val truth = q("s01_knn_brute").filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val found = q("s05_quantized_rerank")
      .select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = truth.map { case (qid, t) =>
      (t & found.getOrElse(qid, Set.empty)).size.toDouble / t.size
    }
    assert(recalls.sum / recalls.size >= 0.9,
      s"avg recall ${recalls.sum / recalls.size}")
  }

  test("LSH-fed clusters (d06) equal exact-all-pairs-fed clusters on the" +
      " test corpus") {
    // d06's production edge source is the LSH-verified pair set; the
    // bounded exact all-pairs pipeline stays as the ground truth. On this
    // corpus LSH recall at j ≥ 0.5 is high enough that the RESULTING
    // CLUSTERS must be identical — a divergence means either banding
    // regressed or the propagation operator treats the two edge sets
    // differently.
    import graft.operators.Cluster
    import graft.queries.DedupQ
    val exact = Cluster.canonicalize(
        DedupQ.exactJaccardPairs(spark, sf, 0.5), "doc_a", "doc_b", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = q("d06_dedup_clusters")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh == exact,
      s"LSH-fed clusters diverge: missing ${(exact -- lsh).size}," +
        s" extra ${(lsh -- exact).size}")
  }

  test("embedding LSH near-dup (d07) recalls ≥ 90% of exact cosine pairs" +
      " (d05) with zero false positives") {
    // d05 is the exact all-pairs ground truth (cos ≥ 0.4); d07 is the
    // bucketed production path. Measured on this corpus: 0.966 (57/59) —
    // assert a margin below so only a banding regression fails. False
    // positives are impossible by construction (exact cosine verify), so
    // any extra pair means the verify threshold drifted.
    val truth = pairSet(q("d05_embed_neardup"), "vec_a", "vec_b")
    val found = pairSet(q("d07_embed_lsh_neardup"), "vec_a", "vec_b")
    assert(truth.nonEmpty)
    val recall = (truth & found).size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall over ${truth.size} true pairs")
    assert((found -- truth).isEmpty,
      s"${(found -- truth).size} false positives")
  }

  test("q51 sketch WAU: every day's HLL estimate is within 5% of the" +
      " exact rolling distinct, and no collect_set appears in the plan") {
    val df = q("q51_sketch_wau")
    // the approx_ok column IS the bound — assert it holds on every row,
    // and pin the numeric error directly from the lineage's own columns
    val bad = df.filter(!col("approx_ok")).count()
    assert(bad == 0, s"$bad days exceeded the 5% HLL error bound")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_set"),
      "q51's production lineage must stay sketch-only (no exact sets)")
  }

  test("the strongest near-dup pairs (j ≥ 0.8) are ALL recalled") {
    // LSH detection probability at j = 0.8 is 1-(1-0.64)⁸ ≈ 0.9997 —
    // missing one of these would indicate broken banding, not bad luck
    val strong = pairSet(q("d04_ngram_jaccard")
      .filter(col("jaccard") >= 0.8), "doc_a", "doc_b")
    assert(strong.nonEmpty)
    val found = pairSet(q("d02_minhash_lsh"), "doc_a", "doc_b")
    assert((strong -- found).isEmpty,
      s"missed ${(strong -- found).size} of ${strong.size} strong pairs")
  }
}
