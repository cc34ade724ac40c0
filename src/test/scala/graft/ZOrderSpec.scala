package graft

import graft.operators.{Compaction, ZOrder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Z-order clustering: the Morton key itself is a pure function (checked
  * bit-for-bit), and the rewrite's FILE-LAYOUT contract is that every
  * output file covers a narrow range in EVERY clustered dimension — the
  * property that lets row-group stats prune scans on any of them. The
  * control shows a lexicographic sort leaves the trailing dimension
  * full-range in every file. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits with dims.head most significant") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 1L), (65535L, 65535L))
      .toDF("a", "b")
      .select(ZOrder.zValue(Seq(col("a"), col("b"))).as("z"))
    // a's bit j lands at 2j+1, b's at 2j: (1,0)->10b, (0,1)->01b,
    // (3,1)->1011b, full 16-bit grid -> 2^32-1
    assert(df.as[Long].collect().toSeq ==
      Seq(0L, 2L, 1L, 11L, 4294967295L))
  }

  test("scale maps [lo,hi] onto the 16-bit grid with clamping") {
    val df = Seq(0.0, 32.0, 63.0, -5.0, 99.0).toDF("v")
      .select(ZOrder.scale(col("v"), 0.0, 63.0).as("s"))
    val out = df.as[Long].collect().toSeq
    assert(out(0) == 0L && out(2) == 65535L)
    assert(out(1) == math.floor(32.0 / 63.0 * 65535).toLong)
    assert(out(3) == 0L && out(4) == 65535L) // clamped
  }

  test("equal z-quarters of a 64x64 grid are exactly the four 32x32" +
      " quadrants (curve locality, no sampling involved)") {
    val grid = spark.range(4096)
      .select((col("id") / 64).cast("int").as("x"),
        (col("id") % 64).cast("int").as("y"))
    val z = ZOrder.zValue(Seq(
      ZOrder.scale(col("x"), 0.0, 63.0), ZOrder.scale(col("y"), 0.0, 63.0)))
    val quarters = grid.withColumn("z", z)
      // 2^32 z-space / 4 equal quarters = the top (x_msb, y_msb) bit pair
      .withColumn("q", floor(col("z") / lit(1L << 30)))
      .groupBy(col("q"))
      .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
        min(col("y")).as("y0"), max(col("y")).as("y1"))
      .as[(Long, Int, Int, Int, Int)].collect().toSet
    assert(quarters == Set(
      (0L, 0, 31, 0, 31), (1L, 0, 31, 32, 63),
      (2L, 32, 63, 0, 31), (3L, 32, 63, 32, 63)))
  }

  test("clusterZOrder files prune on the TRAILING dimension; a" +
      " lexicographic sort touches every file (the control)") {
    val base = Files.createTempDirectory("graft_zorder").toString
    val part = s"$base/part=1"
    val grid = spark.range(4096)
      .select((col("id") / 64).cast("int").as("x"),
        (col("id") % 64).cast("int").as("y"))
    grid.write.parquet(part)
    new Compaction(spark).clusterZOrder(base, Seq("x", "y"),
      filesPerPartition = Some(4))

    def filesTouched(path: String, cond: org.apache.spark.sql.Column) =
      spark.read.parquet(path).filter(cond)
        .select(input_file_name()).distinct().count()

    // control: single-key sort — every file spans y fully, so a y-filter
    // must open all 4
    val linear = s"$base/linear=1"
    grid.repartitionByRange(4, col("x"))
      .sortWithinPartitions(col("x")).write.parquet(linear)
    assert(filesTouched(linear, col("y") < 16) == 4)

    // z-order: a y-slice lives in the y_msb=0 files only (2 of 4 in the
    // ideal split; ≤3 even when a sampled range boundary crosses a
    // quadrant edge — the seed varies with session history)
    assert(filesTouched(part, col("y") < 16) <= 3)
    // the leading dimension prunes too (x<16 = one quadrant's half)
    assert(filesTouched(part, col("x") < 16) <= 3)
    assert(spark.read.parquet(part).count() == 4096)
  }
}
