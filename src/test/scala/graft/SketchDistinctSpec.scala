package graft

import graft.operators.SketchDistinct
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The incremental distinct-count rollup converges to the full
  * recompute: any refresh order yields the same per-key sketches as
  * sketching the union (HLL union is associative/commutative/idempotent
  * at fixed lgK), and at test cardinalities the sketch's sparse mode
  * makes estimates EXACT, so equality — not a bound — is asserted. */
class SketchDistinctSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val batches = Seq(
    Seq(("d1", "u1"), ("d1", "u2"), ("d2", "u1")),
    Seq(("d1", "u2"), ("d1", "u3"), ("d2", "u9"), ("d3", "u1")),
    Seq(("d1", "u1"), ("d3", "u1"), ("d3", "u2")))

  test("sequential refreshes == exact distinct over the union of" +
      " batches (sparse-mode exactness at small cardinality)") {
    val tgt = s"${Files.createTempDirectory("graft_skd")}/rollup"
    val skd = new SketchDistinct(spark, tgt, Seq("day"), "user")
    batches.foreach(b => skd.refresh(b.toDF("day", "user")))
    val got = skd.read()
      .select(col("day"), col("n_rows"), col("distinct_est"))
      .as[(String, Long, Long)].collect().toSet
    val want = batches.flatten.toDF("day", "user")
      .groupBy("day").agg(count(lit(1)).as("n"),
        countDistinct(col("user")).as("d"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == want, s"got $got want $want")
  }

  test("refresh order does not matter (mergeable-sketch contract)") {
    val t1 = s"${Files.createTempDirectory("graft_skd2")}/r1"
    val t2 = s"${Files.createTempDirectory("graft_skd3")}/r2"
    val a = new SketchDistinct(spark, t1, Seq("day"), "user")
    val b = new SketchDistinct(spark, t2, Seq("day"), "user")
    batches.foreach(x => a.refresh(x.toDF("day", "user")))
    batches.reverse.foreach(x => b.refresh(x.toDF("day", "user")))
    def rows(s: SketchDistinct) = s.read()
      .select("day", "n_rows", "distinct_est")
      .as[(String, Long, Long)].collect().toSet
    assert(rows(a) == rows(b))
  }

  test("streamDistinctRollup keeps the rollup equal to the batch" +
      " recompute across micro-batch runs") {
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft_skd_stream").toString
    val in = s"$base/in"; val tgt = s"$base/rollup"; val cp = s"$base/cp"
    val sch = StructType(Seq(StructField("day", StringType),
      StructField("user", StringType)))
    batches.take(2).flatten.toDF("day", "user").write.parquet(in)
    val ingest = new graft.streaming.StreamingIngest(spark)
    ingest.streamDistinctRollup(in, sch, tgt, cp, Seq("day"), "user")
      .awaitTermination()
    // second run: only the NEW file becomes a batch (checkpoint)
    batches(2).toDF("day", "user").write.mode("append").parquet(in)
    ingest.streamDistinctRollup(in, sch, tgt, cp, Seq("day"), "user")
      .awaitTermination()
    val skd = new SketchDistinct(spark, tgt, Seq("day"), "user")
    val got = skd.read().select("day", "distinct_est")
      .as[(String, Long)].collect().toSet
    val want = batches.flatten.toDF("day", "user")
      .groupBy("day").agg(countDistinct(col("user")).as("d"))
      .as[(String, Long)].collect().toSet
    assert(got == want)
  }

  test("a replay-style duplicate batch changes no estimate" +
      " (HLL union is idempotent on identical inputs)") {
    val tgt = s"${Files.createTempDirectory("graft_skd4")}/rollup"
    val skd = new SketchDistinct(spark, tgt, Seq("day"), "user")
    batches.foreach(x => skd.refresh(x.toDF("day", "user")))
    val before = skd.read().select("day", "distinct_est")
      .as[(String, Long)].collect().toSet
    skd.refresh(batches.head.toDF("day", "user")) // replayed batch
    val after = skd.read().select("day", "distinct_est")
      .as[(String, Long)].collect().toSet
    assert(before == after)
  }
}
