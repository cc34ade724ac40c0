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

  test("clusterZOrder gives every file a half-range bbox in BOTH dims;" +
      " a lexicographic sort leaves dim y full-range (the control)") {
    val base = Files.createTempDirectory("graft_zorder").toString
    val part = s"$base/part=1"
    // deterministic 64x64 grid
    val grid = spark.range(4096)
      .select((col("id") / 64).cast("int").as("x"),
        (col("id") % 64).cast("int").as("y"))
    grid.write.parquet(part)

    def perFileRanges(): Seq[(Long, Long)] =
      spark.read.parquet(part)
        .groupBy(input_file_name())
        .agg((max(col("x")) - min(col("x"))).cast("long").as("xr"),
          (max(col("y")) - min(col("y"))).cast("long").as("yr"))
        .select(col("xr"), col("yr"))
        .as[(Long, Long)].collect().toSeq

    new Compaction(spark).clusterZOrder(base, Seq("x", "y"),
      filesPerPartition = Some(4))
    val zRanges = perFileRanges()
    assert(zRanges.size == 4)
    // 4 files over a 64x64 grid = the four 32x32 quadrants (the top
    // z-bit pair is (x_msb, y_msb)); allow slack for the range
    // partitioner's sampled boundaries
    zRanges.foreach { case (xr, yr) =>
      assert(xr <= 40 && yr <= 40,
        s"z-ordered file spans x=$xr y=$yr — not a quadrant")
    }

    // control: single-key sort -> y is full-range in every file
    val linear = s"$base/linear=1"
    grid.repartitionByRange(4, col("x"))
      .sortWithinPartitions(col("x")).write.parquet(linear)
    val linRanges = spark.read.parquet(linear)
      .groupBy(input_file_name())
      .agg((max(col("y")) - min(col("y"))).cast("long").as("yr"))
      .select(col("yr")).as[Long].collect().toSeq
    assert(linRanges.forall(_ == 63L))
  }
}
