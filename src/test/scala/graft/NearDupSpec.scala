package graft

import graft.operators.NearDup
import org.scalatest.funsuite.AnyFunSuite

/** The NearDup operator API works over arbitrary (id, text) frames —
  * not just the test tables — honors the threshold, and the clusters
  * view groups transitively-linked docs under the minimum id. */
class NearDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 1/2 near-identical, 3 links to 2 but not 1 (transitive chain),
  // 4 unrelated
  val docs = Seq(
    (101L, "the quick brown fox jumps over the lazy dog again and again"),
    (102L, "the quick brown fox jumps over the lazy dog again and once"),
    (103L, "quick brown fox jumps over the lazy dog again and once more"),
    (104L, "completely different text about spark shuffle partitions"))
    .toDF("my_id", "body")

  test("lshPairs finds near-dups on renamed columns and honors the" +
      " threshold") {
    val pairs = NearDup.lshPairs(docs, "my_id", "body", 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((101L, 102L)))
    assert(!pairs.exists(p => p._1 == 104L || p._2 == 104L))
    // a stricter threshold prunes the weaker links
    val strict = NearDup.lshPairs(docs, "my_id", "body", 0.95)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(strict.subsetOf(pairs))
  }

  test("maxBucketSize drops degenerate HOT buckets (one boilerplate " +
      "clique cannot dominate the pair stage) while ordinary near-dup " +
      "pairs survive; the default keeps every bucket") {
    // 40 byte-identical boilerplate docs: every band bucket they share
    // has 40 members and would alone generate 40*39/2 = 780 candidates
    val clique = (1L to 40L).map(i =>
      (i, "cookie banner accept all reject all manage preferences now"))
    val corpus = (clique ++ Seq(
      (101L, "the quick brown fox jumps over the lazy dog again and again"),
      (102L, "the quick brown fox jumps over the lazy dog again and once"),
      (104L, "completely different text about spark shuffle partitions")))
      .toDF("my_id", "body")
    val capped = NearDup.lshPairs(corpus, "my_id", "body", 0.5,
      maxBucketSize = Some(10))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((101L, 102L)),
      "small-bucket near-dup pairs must survive the cap")
    assert(!capped.exists(p => p._1 <= 40L || p._2 <= 40L),
      s"the degenerate clique's pairs must be dropped: $capped")
    // default: every bucket kept — the clique's pairs all verify
    val full = NearDup.lshPairs(corpus, "my_id", "body", 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(full.count(p => p._1 <= 40L && p._2 <= 40L) == 40 * 39 / 2)
    assert(full.contains((101L, 102L)))
    spark.catalog.clearCache() // lshPairs signature caches
  }

  test("pairs from a persisted signature table equal the direct path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sigs")
      .toString + "/sigs"
    NearDup.writeSignatures(docs, "my_id", "body", dir)
    val persisted = NearDup.pairsFromSignatures(spark, dir, 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val direct = NearDup.lshPairs(docs, "my_id", "body", 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(persisted == direct && persisted.nonEmpty)
  }

  test("pairsWithCorpus: a new batch pairs against the persisted corpus" +
      " and within itself; the corpus is never self-joined; its" +
      " signatures append so the NEXT batch sees it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inc_sigs")
      .toString + "/sigs"
    NearDup.writeSignatures(docs, "my_id", "body", dir)
    // batch: 201 near-dups corpus doc 101; 202/203 near-dup each other
    // only; 204 unique
    val batch = Seq(
      (201L, "the quick brown fox jumps over the lazy dog again today"),
      (202L, "structured streaming keeps state in checkpointed stores ok"),
      (203L, "structured streaming keeps state in checkpointed stores now"),
      (204L, "unrelated corpus about parquet footers and row groups"))
      .toDF("my_id", "body")
    val pairs = NearDup.pairsWithCorpus(spark, batch, "my_id", "body",
      dir, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((101L, 201L)), s"missed corpus-cross pair: $pairs")
    assert(pairs.contains((202L, 203L)), s"missed within-batch pair: $pairs")
    assert(!pairs.exists(p => p._1 == 204L || p._2 == 204L))
    // NO corpus-corpus pairs re-reported (found when those docs arrived)
    assert(!pairs.contains((101L, 102L)))
    // the batch's signatures landed: a second batch near-dupping 202
    // finds it as CORPUS now
    val batch2 = Seq(
      (301L, "structured streaming keeps state in checkpointed stores too"))
      .toDF("my_id", "body")
    val pairs2 = NearDup.pairsWithCorpus(spark, batch2, "my_id", "body",
      dir, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs2.exists(p => p._2 == 301L && Set(202L, 203L)(p._1)),
      s"appended signatures invisible to the next batch: $pairs2")
  }

  test("clusters canonicalize transitive chains to the minimum id") {
    val cl = NearDup.clusters(docs, "my_id", "body", 0.5)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(cl(101L) == 101L && cl(102L) == 101L)
    // 103 joins the component iff it pairs with 101 or 102 — either way
    // its cluster id must be a member of that component or itself
    assert(Set(101L, 103L).contains(cl.getOrElse(103L, 103L)))
    assert(!cl.contains(104L) || cl(104L) == 104L)
  }
}
