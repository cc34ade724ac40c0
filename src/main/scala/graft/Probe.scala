package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc plan/stage profiler: times the sub-stages of a named query so a
  * slow query's cost can be attributed to a stage instead of guessed at.
  * Not part of the driver contract; a development tool.
  */
object Probe {
  private val jit = java.lang.management.ManagementFactory.getCompilationMXBean

  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val j0 = jit.getTotalCompilationTime
    val r = f
    val dj = (jit.getTotalCompilationTime - j0) / 1e3
    System.err.println(
      f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs (jit $dj%.1fs)")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val what = args.headOption.getOrElse("explain")
    what match {
      case "explain" =>
        val q = SparkEntry.catalog.find(_.name.startsWith(args(1))).get
        q.run(spark, sfDir).explain("formatted")
      case "mimic" =>
        // exactly Bench's sequence for one query: same-SF adjacent warmup
        // with clearCache after, a C2-queue drain, then two timed runs at
        // sfDir (warming at a smaller SF compiles different AQE plans —
        // see PLANS.md finding 2)
        val q = SparkEntry.catalog.find(_.name.startsWith(args(1))).get
        time(s"${q.name} warmup $sfDir") {
          q.run(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
        spark.catalog.clearCache()
        var last = -1L
        var waited = 0
        while (waited < 120 && jit.getTotalCompilationTime != last) {
          last = jit.getTotalCompilationTime
          Thread.sleep(250); waited += 1
        }
        time(s"${q.name} timed $sfDir") {
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
        spark.catalog.clearCache()
        time(s"${q.name} timed again") {
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
      case name =>
        val q = SparkEntry.catalog.find(_.name.startsWith(name)).get
        // twice: first pass pays compile, second is steady-state
        time(s"${q.name} run1") {
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
        spark.catalog.clearCache()
        time(s"${q.name} run2") {
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
    }
    spark.stop()
  }


}
