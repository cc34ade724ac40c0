package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CorpusOps over an arbitrary (id, text) frame with renamed columns:
  * language argmax with lexicographic ties, quality gates at their
  * thresholds, and a total/stable hash split. */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val markers = Seq("en" -> Seq("the", "dog"), "fr" -> Seq("le", "chien"))

  test("languageId scores marker hits with multiplicity and argmaxes" +
      " with lexicographic tiebreak") {
    val docs = Seq(
      (1L, "the dog sees the cat"),      // en: 3, fr: 0
      (2L, "le chien voit le chat"),     // en: 0, fr: 3
      (3L, "x y z"),                     // 0-0 tie -> 'en' (lexicographic)
      (4L, ""))                          // no tokens -> scores 0
      .toDF("k", "body")
    val out = CorpusOps.languageId(docs, "k", "body", markers)
      .select("k", "score_en", "score_fr", "pred_lang")
      .as[(Long, Int, Int, String)].collect().toSet
    assert(out == Set((1L, 3, 0, "en"), (2L, 0, 3, "fr"),
      (3L, 0, 0, "en"), (4L, 0, 0, "en")))
  }

  test("qualityScore applies the token/stopword/distinct gates") {
    val docs = Seq(
      (1L, (1 to 25).map(i => s"w$i").mkString(" ")), // 25 distinct ok
      (2L, "short text"),                             // too few tokens
      (3L, ("the " * 30).trim))                       // all stopwords
      .toDF("k", "body")
    val out = CorpusOps.qualityScore(docs, "k", "body", Seq("the", "a"))
      .select("k", "quality_ok").as[(Long, Boolean)].collect().toMap
    assert(out(1L) && !out(2L) && !out(3L))
  }

  test("hashSplit is total, matches its own bucket thresholds, and is" +
      " stable across recomputation") {
    val docs = spark.range(0, 500).select(col("id"))
    val a = CorpusOps.hashSplit(docs, "id")
      .select("id", "bucket", "split")
      .as[(Long, Long, String)].collect()
    assert(a.length == 500)
    a.foreach { case (_, b, s) =>
      val expect = if (b < 800) "train" else if (b < 900) "val" else "test"
      assert(s == expect)
    }
    val b = CorpusOps.hashSplit(docs, "id")
      .select("id", "bucket", "split")
      .as[(Long, Long, String)].collect()
    assert(a.toSeq == b.toSeq)
  }
}
