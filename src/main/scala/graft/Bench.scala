package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall-clock seconds.
  * Progress goes to stderr so a hung query is identifiable. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // HotSpot never JIT-compiles methods over 8 KB bytecode; Spark's
      // default hugeMethodLimit (65535) lets whole-stage codegen emit
      // methods the JVM then runs interpreted AND spends tens of seconds
      // trying to compile (measured: q01 172s -> 3s). Cap at the JIT limit
      // so pathological fusions fall back to non-fused codegen.
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      // Test tables are SINGLE parquet files; with the default 128 MB
      // split size every scan is one task and the whole query runs on one
      // core. 4 MB splits parallelize local scans; a real cluster's
      // many-file tables make this knob irrelevant there.
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.catalog.map { q =>
      System.err.println(s"[bench] start ${q.name}")
      val t0 = System.nanoTime()
      try { q.run(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] done  ${q.name} $dt%.2fs")
      // each query is self-contained; drop its cached intermediates so
      // storage memory never competes with later queries' execution
      spark.catalog.clearCache()
      q.name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
