package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text/dedup scalar functions built from codegen'd Catalyst builtins (no
  * UDFs in the hot path — everything here stays inside whole-stage codegen).
  */
object TextFunctions {

  /** 64-bit SimHash over a token array: per token, xxhash64(token) casts a
    * +1/-1 vote per bit; the fingerprint sets bit j iff the vote sum is
    * positive. Pure expression fold — distributable over any Dataset without
    * a shuffle. (The 16-bit md5 variant in GraftQueries exists only for
    * cross-engine DuckDB checking; this is the production function.) */
  def simhash64(tokens: Column): Column = {
    // counts: array of 64 vote sums
    val counts = aggregate(
      tokens,
      array_repeat(lit(0L), 64),
      (acc, tok) => {
        val h = xxhash64(tok)
        zip_with(acc, sequence(lit(0), lit(63)),
          (c, j) => c + (call_function("shiftright", h, j).bitwiseAND(lit(1L)) * 2 - 1))
      })
    // fold bits into one long
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (c, j) => when(c > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Whitespace tokens of a text column. */
  def wsTokens(text: Column): Column = split(text, "\\s+")

  /** Shingles: k-token sliding windows of a token array (for MinHash).
    * transform over the index range; arrays shorter than k yield empty. */
  def shingles(tokens: Column, k: Int): Column = {
    val n = size(tokens)
    when(n >= k,
      transform(sequence(lit(0), n - k),
        i => concat_ws(" ", slice(tokens, i + 1, lit(k)))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature (numHashes values) over a shingle array: minhash_i =
    * min over shingles of xxhash64(i || shingle). Expression-only, ONE pass:
    * a single `aggregate` folds a numHashes-wide running-minimum array (the
    * per-hash formulation scanned — and re-derived — the shingle array once
    * per hash; higher-order functions are interpreted, so that multiplied
    * real work, not just codegen). */
  def minhash(shingleArr: Column, numHashes: Int): Column =
    aggregate(shingleArr, array_repeat(lit(Long.MaxValue), numHashes),
      (acc, sh) => zip_with(acc, sequence(lit(0), lit(numHashes - 1)),
        (m, i) => least(m, xxhash64(concat(i.cast("string"), lit("_"), sh)))))

  /** LSH band keys from a minhash signature: bands of `rowsPerBand` hashes,
    * each hashed to one bucket key. */
  def lshBands(signature: Column, rowsPerBand: Int): Column =
    transform(sequence(lit(0), (size(signature) / rowsPerBand).cast("int") - 1), b =>
      struct(b.as("band"),
        xxhash64(concat_ws("_",
          slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)).cast("array<string>"))).as("key")))
}
