package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash helpers with two tiers:
  *
  *  - `fast32/fast64`: `xxhash64`-based — the production path (codegen'd,
  *    no hex round-trip). Use for shuffles, bucketing, LSH at scale.
  *  - `md32`: md5-hex-prefix → bigint in [0, 2^32). Slower, but the exact
  *    same value is computable in any engine with `md5` (DuckDB:
  *    `cast(('0x' || substr(md5(s),1,8)) AS BIGINT)`), so cross-engine
  *    oracles can verify MinHash/SimHash/LSH results bit-for-bit.
  *
  * Every sketch operator takes the hash as a parameter; verification
  * queries pin `md32`, benches use the fast tier.
  */
object PortableHash {

  /** 32-bit portable hash of `s` salted with `salt`. */
  def md32(s: Column, salt: Int): Column =
    conv(substring(md5(concat(s, lit(":" + salt)).cast("binary")), 1, 8), 16, 10)
      .cast("long")

  /** Unsalted variant (matches plain `md5(s)` prefix). */
  def md32(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 8), 16, 10).cast("long")

  /** Fast non-portable 64-bit hash (production tier). */
  def fast64(s: Column, salt: Int): Column = xxhash64(s, lit(salt))

  /** Fast non-negative 32-bit-range hash. */
  def fast32(s: Column, salt: Int): Column =
    pmod(xxhash64(s, lit(salt)), lit(1L << 32))

  /** Driver-side md5 hex (same bytes as Spark's `md5`/DuckDB's `md5`) —
    * for plan-time constants like LSH hyperplane signs. */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
