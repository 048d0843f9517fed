package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column expressions that produce bit-identical results in Spark and
  * DuckDB — the foundation for oracle-verifiable text/dedup/similarity
  * operators. Every helper here has a documented SQL twin used by
  * [[graft.Oracles]].
  *
  * Scale note: all of these are pure codegen'd Catalyst expressions
  * (md5/conv/split/HOFs) — no UDFs, so they stay inside whole-stage
  * codegen and vectorize over the parquet scan.
  */
object Portable {

  /** Whitespace tokenization. Twin: `regexp_split_to_array(trim(x), '\s+')`.
    * `trim` first so neither engine emits leading/trailing empty tokens. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Deterministic 32-bit hash of a string as a non-negative BIGINT.
    * Twin: `('0x' || substr(md5(x), 1, 8))::BIGINT`. md5 hex is lowercase
    * in both engines; 8 hex chars = 32 bits, always fits a long. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Second, independent 32-bit hash of the same string (md5 hex chars
    * 9-16 — disjoint from [[hash32]]'s 1-8). Twin:
    * `('0x' || substr(md5(x), 9, 8))::BIGINT`. Used where 64 portable
    * bits are needed (e.g. the 64-bit SimHash) without ever forming a
    * value that touches a BIGINT sign bit on either engine. */
  def hash32Hi(c: Column): Column =
    conv(substring(md5(c), 9, 8), 16, 10).cast("long")

  /** Universal-hash family over a 32-bit base hash: `(a*h + b) mod p`
    * with p = 2^31-1 (Mersenne prime). a,b < 2^31 and h < 2^32 keep the
    * product < 2^63 — no overflow, no negative operands, so Spark `pmod`
    * and DuckDB `%` agree exactly. Twin: `(a * h + b) % 2147483647`. */
  val P31: Long = 2147483647L
  def universalHash(h: Column, a: Long, b: Long): Column =
    pmod(lit(a) * h + lit(b), lit(P31))

  /** Deterministic (a, b) coefficient pairs for seeds 0..n-1, derived
    * from a fixed linear congruential sequence so both the Spark side and
    * the oracle-SQL generator produce identical constants. */
  def hashCoeffs(n: Int): Seq[(Long, Long)] = {
    var x = 1234567891L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; x % (P31 - 1) + 1 }
    Seq.fill(n)((next(), next()))
  }
}
