package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing primitives.
  *
  * Spark's native `hash()`/`xxhash64()` have no DuckDB equivalent, so every
  * hash that must be oracle-checkable goes through md5 hex: take the first
  * 15 hex chars (60 bits, fits a signed 64-bit int) and parse base-16.
  * Spark: `conv(substring(md5(s),1,15),16,10)::long`; DuckDB:
  * `('0x'||substr(md5(s),1,15))::BIGINT` — verified bit-identical.
  *
  * All Column builders here are built-in expressions (codegen'd); md5 is
  * not as cheap as xxhash64 but stays vectorized and map-only. Swap
  * [[hash60]]'s body for `xxhash64` when oracle parity is not required.
  */
object TextHash {

  val Mersenne61 = (1L << 61) - 1

  /** 60-bit deterministic hash of a string column, identical in DuckDB. */
  def hash60(s: Column): Column =
    conv(substring(md5(s.cast("string")), 1, 15), 16, 10).cast("long")

  /** Seeded variant: k independent hash functions via seed-prefixing —
    * h_i(x) = hash60(i || ':' || x). Cheap, engine-portable, and
    * empirically uniform (md5 avalanche).
    */
  def hash60Seeded(s: Column, seed: Int): Column =
    hash60(concat_ws(":", lit(seed.toString), s.cast("string")))

  /** Word shingles: array of n-grams of `n` consecutive whitespace tokens.
    * Documents shorter than n tokens yield their single full-token join, so
    * every non-empty document has >=1 shingle (MinHash needs a non-empty
    * set).
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    val starts = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    transform(starts, i => concat_ws(" ", slice(toks, i + 1, lit(n))))
  }

  /** Character shingles of length k (positions 1..len-k+1). */
  def charShingles(text: Column, k: Int): Column = {
    val starts = sequence(lit(1), greatest(length(text) - (k - 1), lit(1)))
    transform(starts, i => text.substr(i, lit(k)))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum over the shingle set. Returns array<long> of length numHashes.
    */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map(seed =>
      array_min(transform(shingles, s => hash60Seeded(s, seed)))): _*)

  /** SimHash over word shingles: for each of `bits` bit positions, sum
    * +1/-1 according to that bit of each shingle's hash; the sign vector
    * packed into a long. Hamming-close simhashes => similar shingle sets.
    */
  def simHash(shingles: Column, bits: Int = 16): Column = {
    val hashes = transform(shingles, s => hash60(s))
    (0 until bits).map { b =>
      val bitSum = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
