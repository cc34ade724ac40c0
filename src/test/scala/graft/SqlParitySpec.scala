package graft

import graft.queries.SqlParity
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface returns the same rows as the DataFrame engine of
  * record: for each SqlParity entry, register the test tables as temp
  * views, run spark.sql, and compare ordered rows with the catalog
  * implementation at sf0.001. */
class SqlParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def registerViews(): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      Tables.load(spark, sf, t).createOrReplaceTempView(t)
    }
    Tables.events(spark, sf).createOrReplaceTempView("events")
    Tables.documents(spark, sf).createOrReplaceTempView("documents")
    Tables.embeddings(spark, sf).createOrReplaceTempView("embeddings")
  }

  SqlParity.sql.foreach { case (name, text) =>
    test(s"spark.sql parity: $name") {
      registerViews()
      val q = SparkEntry.catalog.find(_.name == name).get
      val viaDf = q.run(spark, sf).collect().map(_.toSeq).toSeq
      val viaSql = spark.sql(text).collect().map(_.toSeq).toSeq
      assert(viaSql == viaDf)
    }
  }
}
