package graft

import graft.functions.{DotProduct, TextFns, VectorFns}
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DotProduct expression: interpreted eval matches the higher-order" +
      " formulation exactly, including fold order") {
    val df = Seq((Array(0.1f, 0.2f, 0.3f), Array(1.5f, -2.5f, 3.0f)))
      .toDF("a", "b")
    val native = df.select(DotProduct(col("a"), col("b"))).first().getDouble(0)
    val hof = df.select(VectorFns.seqSum(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")))).first().getDouble(0)
    assert(native == hof) // bit-identical, not approx
    // null input -> null
    val withNull = Seq((Option.empty[Array[Float]], Option(Array(1f))))
      .toDF("a", "b")
    assert(withNull.select(DotProduct(col("a"), col("b"))).first().isNullAt(0))
    // length mismatch -> zip semantics (shorter wins)
    val uneven = Seq((Array(2f, 10f), Array(3f))).toDF("a", "b")
    assert(uneven.select(DotProduct(col("a"), col("b")))
      .first().getDouble(0) == 6.0)
  }

  test("dot_product is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      """SELECT dot_product(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |                   CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d
        |""".stripMargin).first().getDouble(0)
    assert(got == 11.0)
  }

  test("minhash_sig and rolling_fp are callable from SQL") {
    GraftExtensions.register(spark)
    val sig = spark.sql(
      "SELECT minhash_sig(array('a b', 'b c')) AS s")
      .first().getSeq[String](0)
    assert(sig.length == 16 && sig.forall(_.length == 8))
    val fp = spark.sql(
      "SELECT rolling_fp('the quick brown fox', 8, 3) AS f")
      .first().getString(0)
    assert(fp.split("\\|").length == 3)
    val sh = spark.sql(
      "SELECT shingles(array('a', 'b', 'c', 'd'), 3) AS sh")
      .first().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
  }

  test("bpe_merge and bpe_encode are callable from SQL") {
    GraftExtensions.register(spark)
    val merged = spark.sql(
      "SELECT bpe_merge(array('l', 'o', 'w'), 'l', 'o') AS m")
      .first().getSeq[String](0)
    assert(merged == Seq("lo", "w"))
    val toks = spark.sql(
      "SELECT bpe_encode('lowest', 'e s', 'es t', 'est </w>', 'l o'," +
        " 'lo w') AS t")
      .first().getSeq[String](0)
    assert(toks == Seq("low", "est</w>"))
  }

  test("shingles builds word k-grams; short inputs give empty arrays") {
    val df = Seq("a b c d", "a b", "x").toDF("t")
      .select(TextFns.shingles(TextFns.tokens(col("t")), 3).as("sh"))
    val got = df.as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a b c", "b c d"), Seq(), Seq()))
  }

  test("minhash: identical sets hash identically; signature similarity " +
      "tracks jaccard direction") {
    val df = Seq(
      ("x", "a b c d e f g h"),
      ("y", "a b c d e f g h"),          // identical
      ("z", "a b c d e f zz qq"),        // similar
      ("w", "p q r s t u v w")           // disjoint
    ).toDF("id", "t")
      .select(col("id"),
        TextFns.minhashSignature(
          array_distinct(TextFns.tokens(col("t"))), 16).as("sig"))
    val sigs = df.as[(String, Seq[String])].collect().toMap
    assert(sigs("x") == sigs("y"))
    def agree(a: Seq[String], b: Seq[String]) =
      a.zip(b).count { case (p, q) => p == q }
    assert(agree(sigs("x"), sigs("z")) > agree(sigs("x"), sigs("w")))
  }

  test("ShinglesExpr matches the staggered-slice zip_with formulation") {
    val df = Seq("a b c d e", "a b", "x", "", "a a a").toDF("t")
      .select(TextFns.tokens(col("t")).as("toks"))
    for (k <- Seq(1, 2, 3)) {
      val native = df.select(graft.functions.TextExprs.shingles(col("toks"), k))
        .as[Seq[String]].collect().toSeq
      val hof = df.select(TextFns.shingles(col("toks"), k))
        .as[Seq[String]].collect().toSeq
      assert(native == hof, s"k=$k")
    }
  }

  test("MinhashSigExpr matches the transform/array_min formulation" +
      " byte-for-byte (the form the DuckDB oracle mirrors)") {
    val df = Seq("a b c d e f g h", "x", "", "a a b b")
      .toDF("t")
      .select(array_distinct(
        TextFns.shingles(TextFns.tokens(col("t")), 2)).as("sh"))
    val native = df
      .select(graft.functions.TextExprs.minhashSig(col("sh")))
      .as[Seq[Option[String]]].collect().toSeq
    val viaHof = {
      val withMd5s = (0 until 4).foldLeft(df) { (d, seed) =>
        d.withColumn(s"m$seed",
          transform(col("sh"), e => md5(concat(lit(s"$seed:"), e))))
      }
      withMd5s.select(array((for { seed <- 0 until 4; c <- 0 until 4 } yield
        array_min(transform(col(s"m$seed"),
          h => substring(h, 1 + 8 * c, 8)))): _*))
        .as[Seq[Option[String]]].collect().toSeq
    }
    assert(native == viaHof)
    assert(native.last.forall(_.isDefined)) // non-empty set: 16 real hashes
    assert(native(2).forall(_.isEmpty))     // empty set: 16 nulls
  }

  test("RollingFpExpr matches the transform/array_sort/slice formulation" +
      " byte-for-byte, including short-text and duplicate-window cases") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "short",            // < width: one whole-text window
      "aaaaaaaaaaaaaaaa", // all windows identical (duplicate hashes kept)
      "exactly8"          // == width: exactly one window
    ).toDF("text")
    val native = df
      .select(graft.functions.TextExprs.rollingFp(col("text"), 8, 3))
      .as[String].collect().toSeq
    val viaHof = df.select(concat_ws("|", slice(array_sort(
      expr("transform(sequence(1, greatest(length(text) - 7, 1))," +
        " i -> md5(substr(text, i, 8)))")), 1, 3)))
      .as[String].collect().toSeq
    assert(native == viaHof)
  }

  test("approx_count_distinct stays within its error bound at sf0.001" +
      " (HLL sketch path for 100TB-scale distincts)") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val exact = li.select(countDistinct(col("l_partkey"))).first().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02))
      .first().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }

  test("cms_probe estimates from count_min_sketch's binary: never " +
      "undercounts, exact on unique keys, null-safe") {
    val df = Seq(1L, 1L, 1L, 2L, 2L, 3L).toDF("k")
    df.createOrReplaceTempView("cms_in")
    val rows = spark.sql("""
      WITH sk AS (SELECT count_min_sketch(k, CAST(0.001 AS DOUBLE),
        CAST(0.99 AS DOUBLE), 7) AS s FROM cms_in)
      SELECT k, cms_probe(s, k) AS est
      FROM (SELECT DISTINCT k FROM cms_in) CROSS JOIN sk ORDER BY k""")
      .as[(Long, Long)].collect().toMap
    // a CMS estimate is an upper bound; at this tiny cardinality and
    // width it is exact
    assert(rows == Map(1L -> 3L, 2L -> 2L, 3L -> 1L), s"$rows")
    // absent key: still >= 0 (CMS never answers negative)
    val absent = spark.sql("""
      WITH sk AS (SELECT count_min_sketch(k, CAST(0.001 AS DOUBLE),
        CAST(0.99 AS DOUBLE), 7) AS s FROM cms_in)
      SELECT cms_probe(s, 999L) FROM sk""").as[Long].head()
    assert(absent >= 0L)
    // null inputs are null-safe
    assert(spark.sql("""
      WITH sk AS (SELECT count_min_sketch(k, CAST(0.001 AS DOUBLE),
        CAST(0.99 AS DOUBLE), 7) AS s FROM cms_in)
      SELECT cms_probe(s, CAST(NULL AS BIGINT)) FROM sk""")
      .collect().head.isNullAt(0))
  }
}
