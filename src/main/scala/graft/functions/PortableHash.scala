package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable 60-bit hash: the first 15 hex digits of md5, read as an
  * integer. Every mainstream engine (and the DuckDB correctness oracle)
  * computes the identical value:
  *
  *   Spark :  conv(substring(md5(x), 1, 15), 16, 10)::long
  *   DuckDB:  ('0x' || substring(md5(x), 1, 15))::BIGINT
  *
  * Used wherever a hash value is part of the *result contract* — minhash
  * signatures, simhash bits, LSH hyperplanes, rolling fingerprints — so the
  * driver's DuckDB oracle can recompute results exactly instead of falling
  * back to row-count checks. 15 hex digits = 60 bits keeps the value
  * strictly positive in a signed 64-bit integer on both engines.
  *
  * The engine-internal fast paths (bucket join keys, exact-dedup digests)
  * keep xxhash64 — portability only matters where the hash value itself is
  * observable in query output or influences which rows are emitted.
  */
object PortableHash {

  /** 60-bit md5-derived hash of the UTF-8 bytes of `c` (cast to string). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Seeded family member i: hash of "<value>_<i>" — the construction the
    * DuckDB oracle mirrors with `x::VARCHAR || '_' || i::VARCHAR`.
    */
  def seeded(c: Column, i: Column): Column = hash60(concat_ws("_", c, i))

  /** SQL fragment (DuckDB dialect) computing the same value as `hash60`,
    * for building oracle queries: substitute the argument expression.
    */
  def duckdbHash60(arg: String): String =
    s"('0x' || substring(md5($arg), 1, 15))::BIGINT"

  /** Driver-side evaluation of the same 60-bit hash (for deriving plan
    * constants — LSH hyperplanes, universal-hash coefficients — that the
    * oracle re-derives with its md5).
    */
  def local60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.map(b => f"$b%02x").mkString.take(15), 16)
  }
}
