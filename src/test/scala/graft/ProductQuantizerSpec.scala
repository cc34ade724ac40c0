package graft

import graft.functions.VectorFns
import graft.operators.ProductQuantizer
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PQ contract on the real embeddings table: deterministic fits, exact
  * self-consistency of the codes, and ADC recall gated against the
  * exact inner-product baseline (RecallSpec's philosophy for the
  * compressed-scan operator). */
class ProductQuantizerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, sf)

  test("fit + encode are bit-deterministic across runs") {
    def run() = {
      val m = ProductQuantizer.fit(spark, emb, m = 8, k = 256, rounds = 3)
      TestSpark.rows(ProductQuantizer.encode(emb, m)
        .orderBy("vec_id", "sub"))
    }
    assert(run() == run())
  }

  test("every vector gets exactly m codes, all within [0, k)") {
    val model = ProductQuantizer.fit(spark, emb, m = 8, k = 256, rounds = 3)
    val enc = ProductQuantizer.encode(emb, model)
    val perVec = enc.groupBy("vec_id").count()
      .as[(Long, Long)].collect()
    assert(perVec.forall(_._2 == 8) && perVec.length == 500)
    val codes = enc.select("code").as[Int].collect()
    assert(codes.forall(c => c >= 0 && c < 256))
  }

  // m=8 x 8-bit codes (k=256) is the standard PQ config; a NumPy
  // reference implementation reproduces the same recall levels on this
  // corpus (m=8/k=32: 0.38, m=8/k=256: 0.72), confirming the recall is a
  // property of the near-uniform unit-norm data, not the Spark plan.
  test("ADC search recalls >= 60% of the exact inner-product top-10" +
      " (compressed scan, 32x smaller vector state)") {
    val model = ProductQuantizer.fit(spark, emb, m = 8, k = 256, rounds = 3)
    val enc = ProductQuantizer.encode(emb, model)
    val queries = emb.filter(col("vec_id") < 5)
    val got = ProductQuantizer.search(enc, model, queries, topK = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    // exact inner-product baseline
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("ip").desc, col("vec_id").asc)
    val exact = broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q")))
      .join(emb, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        VectorFns.dot(col("q"), col("embedding")).as("ip"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select("query_id", "vec_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val recalls = exact.map { case (q, truth) =>
      (truth & got.getOrElse(q, Set.empty)).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"PQ mean recall@10 = $mean%.3f")
    assert(mean >= 0.6, f"mean recall@10 $mean%.3f below gate")
  }

  test("PQ candidate scan + exact re-rank (s05's pattern) recovers" +
      " >= 90% of the exact top-10 — the production composition") {
    val model = ProductQuantizer.fit(spark, emb, m = 8, k = 256, rounds = 3)
    val enc = ProductQuantizer.encode(emb, model)
    val queries = emb.filter(col("vec_id") < 5)
    // stage 1: compressed scan keeps a 50-candidate sliver per query
    val cands = ProductQuantizer.search(enc, model, queries, topK = 50)
      .select(col("query_id"), col("neighbor_id"))
    // stage 2: ONLY the sliver joins back to the float vectors
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("ip").desc, col("neighbor_id").asc)
    val reranked = cands
      .join(emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q"))), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFns.dot(col("q"), col("cv")).as("ip"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("ip").desc, col("vec_id").asc)
    val exact = broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q")))
      .join(emb, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        VectorFns.dot(col("q"), col("embedding")).as("ip"))
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= 10)
      .select("query_id", "vec_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val recalls = exact.map { case (q, truth) =>
      (truth & reranked.getOrElse(q, Set.empty)).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"PQ+rerank mean recall@10 = $mean%.3f")
    assert(mean >= 0.9, f"reranked recall@10 $mean%.3f below gate")
  }

  // s07_pq_rerank ships the exact top-5 and its DuckDB oracle is plain
  // exact kNN, so its correctness PRECONDITION is: the catalog config's
  // ADC sliver contains every true cosine top-5 neighbor. Pin exactly
  // that (the config was chosen after m=8 measured recall@5 < 1 on the
  // 5k-vector tier; a regression here = a red driver row).
  test("catalog config (m=16, k=256, 150-candidate sliver) covers the" +
      " exact cosine top-5 — s07's oracle precondition") {
    val model = ProductQuantizer.fit(spark, emb, m = 16, k = 256,
      rounds = 3)
    val enc = ProductQuantizer.encode(emb, model)
    val queries = emb.filter(col("vec_id") < 10)
    val sliver = ProductQuantizer.search(enc, model, queries, topK = 150)
      .select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val nrm = VectorFns.norm(col("embedding"))
    val e = emb.select(col("vec_id"), col("embedding"), nrm.as("n"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val top5 = broadcast(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("q"),
          col("n").as("qn")))
      .join(e, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (VectorFns.dot(col("q"), col("embedding")) /
          (col("qn") * col("n"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "vec_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    top5.foreach { case (q, truth) =>
      val missed = truth -- sliver.getOrElse(q, Set.empty)
      assert(missed.isEmpty,
        s"query $q: true top-5 neighbors $missed outside the ADC sliver")
    }
  }
}
