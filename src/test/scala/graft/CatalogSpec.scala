package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke for the driver contract: every catalog query runs on sf0.001 and
  * has a syntactically valid oracle (correctness itself is gated by the
  * DuckDB differential harness — tools/verify.sh). */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  // queries whose result is legitimately empty at tiny scale
  val mayBeEmpty = Set("q06_anti_join", "d02_minhash_lsh", "d04_ngram_jaccard")

  // every query is oracle-checked (q29's sketch is validated via its
  // engine-agreeable approx_ok bound column)
  val oracleFree = Set.empty[String]

  test("catalog names are unique and every query has an oracle" +
      " unless declared oracle-free") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet ==
      SparkEntry.queries.keySet -- oracleFree)
  }

  SparkEntry.catalog.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df = q.run(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
