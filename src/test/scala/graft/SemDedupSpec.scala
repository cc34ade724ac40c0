package graft

import graft.functions.VectorFns
import graft.operators.SemDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup at production K (the operator form of d13): KMeans cells,
  * within-cell pairwise prune, keep-farthest-from-centroid. The keep
  * rule's defining properties are pinned directly: the kept set is an
  * independent set under the near-dup relation WITHIN cells, and every
  * dropped vector has a beating witness — both hold for ANY clustering,
  * which is what lets the clustering vary (label seeds in d13's oracle,
  * real Lloyd rounds here) without changing the operator contract. */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def cosCol(an: String, bn: String, av: String,
      bv: String) =
    when(col(an) === 0 || col(bn) === 0, lit(null))
      .otherwise(VectorFns.dot(col(av), col(bv)) / (col(an) * col(bn)))

  test("kept set has NO same-cell pair above threshold; every dropped" +
      " vector has a beating same-cell witness; one row per vector") {
    val corpus = Tables.embeddings(spark, sf)
    val out = SemDedup.run(spark, corpus, k = 8, threshold = 0.4).cache()
    try {
      assert(out.count() == corpus.count(), "one decision per vector")
      val nDropped = out.filter(!col("kept")).count()
      assert(nDropped > 0, "the corpus carries near-dup pairs")

      val scored = out
        .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
        .select(col("vec_id"), col("cell"), col("cos_c"), col("kept"),
          col("embedding"), VectorFns.norm(col("embedding")).as("n"))
        .cache()
      // independence: among kept vectors no same-cell cosine >= τ pair
      val kept = scored.filter(col("kept"))
      val violations = kept.as("a").join(kept.as("b"),
          col("a.cell") === col("b.cell") &&
            col("a.vec_id") < col("b.vec_id"))
        .filter(cosCol("a.n", "b.n", "a.embedding", "b.embedding") >= 0.4)
        .count()
      assert(violations == 0,
        s"$violations kept same-cell near-dup pairs survived")
      // soundness: each dropped vector lost to SOME same-cell near-dup
      val witnessed = scored.filter(!col("kept")).as("a")
        .join(scored.as("b"),
          col("a.cell") === col("b.cell") &&
            col("a.vec_id") =!= col("b.vec_id") &&
            (col("b.cos_c") < col("a.cos_c") ||
              (col("b.cos_c") === col("a.cos_c") &&
                col("b.vec_id") < col("a.vec_id"))))
        .filter(cosCol("a.n", "b.n", "a.embedding", "b.embedding") >= 0.4)
        .select(col("a.vec_id")).distinct().count()
      assert(witnessed == nDropped,
        s"$witnessed of $nDropped dropped vectors have witnesses")
      scored.unpersist()
    } finally out.unpersist()
  }
}
