package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale corpus pipelines:
  * tokenization, shingling, MinHash, SimHash — all over codegen'd built-in
  * functions (no UDFs), so the whole pipeline stays inside whole-stage
  * codegen and is portable to a DuckDB oracle for differential testing.
  *
  * Hashing design: every hash is an md5 hex string (identical bytes in any
  * engine). MinHash uses the LEXICOGRAPHIC minimum of seeded md5 strings — a
  * valid min-wise permutation family — so no engine-specific integer hashing
  * is needed anywhere. Where integer hash values are required (SimHash bit
  * weights) we parse hex nibbles with `conv`, which DuckDB mirrors via
  * `CAST('0x…')`.
  *
  * Scale notes: tokenize/shingle/minhash are narrow per-row transforms (no
  * shuffle); LSH banding turns the O(n²) all-pairs dedup into a shuffle on
  * band keys where only same-bucket docs meet — the standard way to near-dup
  * a 100 TB corpus.
  */
object TextFns {

  /** Whitespace tokenization, lowercased, empty tokens removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " +"), t => length(t) > 0)

  /** Word k-shingles: ["a","b","c","d"], k=3 → ["a b c","b c d"].
    * Built from k staggered O(n) slices + one zip_with fold — NOT a
    * per-index slice (which is O(n²) per row and dominated a 500-doc
    * corpus pass by minutes). */
  def shingles(toks: Column, k: Int): Column = {
    val n = size(toks)
    val win = n - (k - 1)
    val parts = (0 until k).map(i => slice(toks, lit(i + 1), win))
    val joined = parts.reduceLeft((acc, p) =>
      zip_with(acc, p, (a, b) => concat(a, lit(" "), b)))
    when(n < k, array().cast("array<string>")).otherwise(joined)
  }

  /** One MinHash value: lexicographic min of seed-prefixed md5 over the
    * element set. Returns a 32-char hex string (null if set empty). */
  def minhash(elems: Column, seed: Int): Column =
    array_min(transform(elems, e => md5(concat(lit(seed + ":"), e))))

  /** Full MinHash signature as an array of `n` hex strings. */
  def minhashSignature(elems: Column, n: Int): Column =
    array((0 until n).map(s => minhash(elems, s)): _*)

  /** LSH band keys: signature of n = bands*rowsPerBand hashes → `bands`
    * bucket keys, each the md5 of band-index + its row hashes. Docs sharing
    * ANY band key become candidate pairs. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|",
        (lit(b.toString) +:
          (0 until rowsPerBand).map(r => sig.getItem(b * rowsPerBand + r))): _*))
    }: _*)

  /** Exact Jaccard similarity of two string-array SETS (exact decimal
    * division not needed: |∩| and |∪| are ints; one double division is
    * deterministic). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(null)).otherwise(inter / uni)
  }

  /** Per-token signed bit weights for SimHash: for hex digit position p
    * (1-based) of md5(token), nibble value v = conv(digit,16,10); bit j of
    * the nibble contributes +1 if set else -1. Used via explode + groupBy
    * in the query layer; see DedupQ.simhash. */
  def hexNibble(hexStr: Column, pos: Int): Column =
    conv(substring(hexStr, pos, 1), 16, 10).cast("int")

  /** Count of regex matches (BPE-ish token count). Keep patterns to the
    * RE2 ∩ java.util.regex common subset for oracle portability. */
  def regexTokenCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))
}
