package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join operator vs the naive range-join-then-rank reference:
  * identical rows on random data (inclusive and exclusive modes),
  * null carry for rows with no prior match, same-instant semantics,
  * and determinism under repartitioning. */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // quotes: unique per (sym, qt) by construction; trades probe them
  def quotes = {
    val r = new scala.util.Random(3)
    (for (s <- Seq("A", "B", "C"); t <- 0 until 40) yield
      (s, t * 10L + r.nextInt(5), s"$s-q$t", r.nextDouble() * 100))
      .toDF("sym", "qt", "quote_id", "px")
      .groupBy("sym", "qt").agg(max("quote_id").as("quote_id"),
        max("px").as("px")) // collapse any same-instant collisions
  }
  def trades = {
    val r = new scala.util.Random(7)
    (for (s <- Seq("A", "B", "C", "D"); t <- 0 until 60) yield
      (s"$s-t$t", s, r.nextInt(420).toLong)).toDF("trade_id", "sym", "tt")
  }

  private def reference(inclusive: Boolean) = {
    val cond = if (inclusive) col("qt") <= col("tt")
               else col("qt") < col("tt")
    val w = Window.partitionBy(col("trade_id"))
      .orderBy(col("qt").desc)
    trades.join(quotes, Seq("sym"), "left")
      .filter(cond || col("qt").isNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("trade_id"), col("sym"), col("tt"),
        col("quote_id"), col("px"), col("qt").as("qt__asof"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("inclusive == naive reference; unmatched trades carry nulls") {
    val got = AsofJoin.joinAsof(trades, quotes, Seq("sym"), "tt", "qt")
    // same columns, same rows — but the reference drops trades whose
    // EVERY quote is later (anti-join shape), so compare on matched and
    // assert unmatched separately
    val matched = reference(inclusive = true)
    assert(rows(got.filter(col("quote_id").isNotNull)
      .select("trade_id", "sym", "tt", "quote_id", "px", "qt__asof")) ==
      rows(matched.filter(col("quote_id").isNotNull)))
    // sym D has no quotes at all: every D trade survives with nulls
    assert(got.filter(col("sym") === "D").count() == 60)
    assert(got.filter(col("sym") === "D")
      .filter(col("quote_id").isNotNull).count() == 0)
    // every trade appears exactly once
    assert(got.count() == trades.count())
    // determinism under repartitioning
    assert(rows(AsofJoin.joinAsof(trades.repartition(7),
      quotes.repartition(3), Seq("sym"), "tt", "qt")) == rows(got))
  }

  test("composite keys: matching respects every key column") {
    val t = Seq(("t1", "A", "US", 10L), ("t2", "A", "EU", 10L))
      .toDF("trade_id", "sym", "venue", "tt")
    val q = Seq(("A", "US", 5L, "us-quote"), ("A", "EU", 7L, "eu-quote"))
      .toDF("sym", "venue", "qt", "quote_id")
    val got = AsofJoin.joinAsof(t, q, Seq("sym", "venue"), "tt", "qt")
      .select("trade_id", "quote_id").as[(String, String)]
      .collect().toSet
    assert(got == Set(("t1", "us-quote"), ("t2", "eu-quote")))
  }

  test("nullable right columns carry atomically from the latest row") {
    // latest quote before t=3 is q2 whose px is NULL — the carry must
    // deliver (q2, null, qt=2), never mix q1's px=5.0 with q2's id
    val t = Seq(("t1", "A", 3L), ("t2", "A", 1L)).toDF("trade_id", "sym", "tt")
    val q = Seq(("A", 1L, "q1", Some(5.0)), ("A", 2L, "q2", None))
      .toDF("sym", "qt", "quote_id", "px")
    val got = AsofJoin.joinAsof(t, q, Seq("sym"), "tt", "qt")
      .select("trade_id", "quote_id", "px", "qt__asof")
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getLong(3))).toSet
    assert(got == Set(("t1", "q2", None, 2L), ("t2", "q1", Some(5.0), 1L)))
    // exclusive at tt=2: only q1 (strictly before) matches
    val excl = AsofJoin.joinAsof(t.filter(col("tt") === 3L)
      .withColumn("tt", lit(2L)), q, Seq("sym"), "tt", "qt",
      inclusive = false).select("quote_id", "px").head()
    assert(excl.getString(0) == "q1" && excl.getDouble(1) == 5.0)
  }

  test("random nullable right data == naive reference") {
    val r = new scala.util.Random(11)
    val q = (for (s <- Seq("A", "B"); t <- 0 until 40) yield
      (s, t * 10L + r.nextInt(5), s"$s-q$t",
        if (r.nextBoolean()) Some(r.nextDouble() * 100) else None))
      .toDF("sym", "qt", "quote_id", "px")
      .groupBy("sym", "qt").agg(max("quote_id").as("quote_id"),
        max("px").as("px"))
    val t = (for (s <- Seq("A", "B"); i <- 0 until 60) yield
      (s"$s-t$i", s, r.nextInt(420).toLong)).toDF("trade_id", "sym", "tt")
    val got = AsofJoin.joinAsof(t, q, Seq("sym"), "tt", "qt")
    val w = Window.partitionBy(col("trade_id")).orderBy(col("qt").desc)
    val naive = t.join(q, Seq("sym"), "left")
      .filter(col("qt") <= col("tt") || col("qt").isNull)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("trade_id"), col("sym"), col("tt"),
        col("quote_id"), col("px"), col("qt").as("qt__asof"))
    assert(rows(got.filter(col("quote_id").isNotNull)
      .select("trade_id", "sym", "tt", "quote_id", "px", "qt__asof")) ==
      rows(naive.filter(col("quote_id").isNotNull)))
    assert(got.count() == t.count())
  }

  test("exclusive mode: a quote AT the trade instant does not match") {
    val t = Seq(("t1", "A", 10L)).toDF("trade_id", "sym", "tt")
    val q = Seq(("A", 10L, "q10", 1.0), ("A", 5L, "q5", 2.0))
      .toDF("sym", "qt", "quote_id", "px")
    val incl = AsofJoin.joinAsof(t, q, Seq("sym"), "tt", "qt")
      .select("quote_id").as[String].head()
    val excl = AsofJoin.joinAsof(t, q, Seq("sym"), "tt", "qt",
      inclusive = false).select("quote_id").as[String].head()
    assert(incl == "q10" && excl == "q5")
  }
}
