package graft

import graft.operators.{KMeans, VectorSearch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Iterated Lloyd k-means (round-3 judge stretch #8): convergence to the
  * planted clusters, round-over-round assignment stability at the fixed
  * point, bit-determinism across independent fits, and composition with
  * the IVF search family on the real embeddings test table. */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  // two tight planted clusters; seeds (the two lowest ids) start INSIDE
  // cluster A, so recovering B requires actual Lloyd movement
  val planted = Seq(
    (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.8f, 0.05f)),
    (4L, Seq(0.95f, 0.02f)),
    (11L, Seq(0.0f, 1.0f)), (12L, Seq(0.1f, 0.9f)), (13L, Seq(0.05f, 0.8f)),
    (14L, Seq(0.02f, 0.95f)))
    .toDF("id", "v")

  test("fit recovers planted clusters and converges to a fixed point" +
      " (one more round changes no assignment)") {
    val m = KMeans.fit(spark, planted, k = 2, maxRounds = 10,
      idCol = "id", vecCol = "v")
    assert(m.rounds < 10, "did not converge on a trivially separable set")
    val cells = m.assignments.select(col("id"), col("cell"))
      .as[(Long, Int)].collect().toMap
    val a = Set(1L, 2L, 3L, 4L).map(cells)
    val b = Set(11L, 12L, 13L, 14L).map(cells)
    assert(a.size == 1 && b.size == 1 && a != b,
      s"planted clusters split or merged: $cells")
    // fixed point: assignments under the fitted centroids are stable
    // against one more update round
    val more = KMeans.fit(spark, planted, k = 2, maxRounds = m.rounds + 1,
      idCol = "id", vecCol = "v")
    assert(TestSpark.rows(m.assignments.orderBy("id")) ==
      TestSpark.rows(more.assignments.orderBy("id")))
  }

  test("fit is bit-deterministic: two independent fits on the real" +
      " embeddings table agree exactly (quantized integer sums)") {
    val emb = Tables.embeddings(spark, sf)
    def run() = {
      val m = KMeans.fit(spark, emb, k = 8, maxRounds = 3)
      (m.rounds, TestSpark.rows(
        m.assignments.select("vec_id", "cell").orderBy("vec_id")))
    }
    val (r1, a1) = run()
    val (r2, a2) = run()
    assert(r1 == r2 && a1 == a2)
  }

  test("fitted centroids feed the IVF family: ivfSearch over them" +
      " returns sane per-query neighbors") {
    val emb = Tables.embeddings(spark, sf)
    val m = KMeans.fit(spark, emb, k = 8, maxRounds = 3)
    val queries = emb.filter(col("vec_id") < 3)
    val out = VectorSearch.ivfSearch(emb, queries, m.centroids, k = 5,
      nprobe = 2)
    val perQuery = out.groupBy("query_id").count()
      .as[(Long, Long)].collect().toMap
    assert(perQuery.keySet == Set(0L, 1L, 2L))
    assert(perQuery.values.forall(_ == 5))
  }
}
