package graft

import graft.operators.{PartitionedSnapshots => PS, Snapshots, Tags}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Named version tags: durable refs on committed versions, readable via
  * `VERSION AS OF 'name'`, immune to vacuum until dropped — the
  * reproducibility pin for "the exact corpus this run trained on". */
class TagsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() =
    Files.createTempDirectory("graft_tags").toString + "/t"

  test("set/resolve/list/drop; default-current; duplicate, numeric and " +
      "uncommitted-version refusals") {
    val t = tmp()
    PS.write(spark, t, Seq((1L, "A", "v1")).toDF("k", "d", "v"), "d")
    PS.upsert(spark, t, Seq((1L, "A", "v2")).toDF("k", "d", "v"),
      Seq("k"), "d")
    assert(Tags.set(t, "golden", Some(1L)) == 1L)
    assert(Tags.set(t, "latest") == 2L) // default: current
    assert(Tags.resolve(t, "golden").contains(1L))
    assert(Tags.list(t) == Map("golden" -> 1L, "latest" -> 2L))
    val dup = intercept[IllegalStateException](Tags.set(t, "golden"))
    assert(dup.getMessage.contains("already exists"), dup.getMessage)
    assert(Tags.set(t, "golden", Some(2L), replace = true) == 2L)
    val num = intercept[IllegalArgumentException](Tags.set(t, "42"))
    assert(num.getMessage.contains("numeric"), num.getMessage)
    val missing = intercept[IllegalStateException](
      Tags.set(t, "phantom", Some(99L)))
    assert(missing.getMessage.contains("no committed snapshot v99"))
    assert(Tags.drop(t, "latest"))
    assert(!Tags.drop(t, "latest"))
    assert(Tags.list(t) == Map("golden" -> 2L))
  }

  test("vacuum immunity, partitioned format: a tagged pre-horizon " +
      "version (and the owner dirs its manifest references) survives; " +
      "dropping the tag releases it") {
    val t = tmp()
    PS.write(spark, t,
      Seq((1L, "A", "a1"), (2L, "B", "b1")).toDF("k", "d", "v"), "d") // v1
    PS.upsert(spark, t, Seq((1L, "A", "a2")).toDF("k", "d", "v"),
      Seq("k"), "d")                                                  // v2
    PS.upsert(spark, t, Seq((1L, "A", "a3")).toDF("k", "d", "v"),
      Seq("k"), "d")                                                  // v3
    PS.upsert(spark, t, Seq((2L, "B", "b2")).toDF("k", "d", "v"),
      Seq("k"), "d")                                                  // v4
    Tags.set(t, "golden", Some(2L))
    val dropped = PS.vacuum(t, keep = 1)
    assert(!dropped.contains(2L), s"tagged v2 vacuumed: $dropped")
    // the tagged version still READS correctly — its manifest's owner
    // dirs (v1's B partition, v2's A partition) were kept alive
    assert(PS.readVersion(spark, t, 2L).select("k", "v")
      .as[(Long, String)].collect().toMap ==
      Map(1L -> "a2", 2L -> "b1"))
    // release the pin: the next vacuum reclaims it
    assert(Tags.drop(t, "golden"))
    val dropped2 = PS.vacuum(t, keep = 1)
    assert(dropped2.contains(2L), s"untagged v2 not reclaimed: $dropped2")
    // current still intact
    assert(PS.read(spark, t).select("k", "v")
      .as[(Long, String)].collect().toMap ==
      Map(1L -> "a3", 2L -> "b2"))
  }

  test("vacuum immunity, full-copy format") {
    val t = tmp()
    Snapshots.write(spark, t, Seq((1L, "x1")).toDF("id", "v")) // v1
    Snapshots.write(spark, t, Seq((1L, "x2")).toDF("id", "v")) // v2
    Snapshots.write(spark, t, Seq((1L, "x3")).toDF("id", "v")) // v3
    Tags.set(t, "pinned", Some(1L))
    assert(!Snapshots.vacuum(t, keep = 1).contains(1L))
    assert(Snapshots.readVersion(spark, t, 1L).select("v")
      .as[String].head() == "x1")
    Tags.drop(t, "pinned")
    assert(Snapshots.vacuum(t, keep = 1).contains(1L))
  }
}
