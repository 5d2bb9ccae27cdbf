package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * Dedup / fingerprint / LSH operators need a hash that is (a) stable
  * across JVM versions and cluster restarts, (b) cheap, and (c)
  * reproducible in other engines so results can be oracle-checked. Spark's
  * built-in `hash()`/`xxhash64()` are stable but not portable; instead we
  * derive 32-bit hashes from the first 8 hex chars of MD5, which every
  * engine computes identically over UTF-8 bytes.
  *
  * MD5 here is a content fingerprint, not a security boundary. The
  * reference uses non-cryptographic Bloom hashing for the same purpose
  * (/root/reference/src/meta.rs:91-110, `fastbloom`).
  *
  * All of this stays inside whole-stage codegen (built-in `md5`/`conv`
  * expressions — no UDFs), so it runs at full speed on a 1000-executor
  * scan.
  */
object hashing {

  /** Unsigned 32-bit hash of a string column as a LongType in [0, 2^32).
    * Portable definition: `int(md5(utf8(s))[0:8 hex], 16)`. */
  def h32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** Independent hash family member: mixes a salt into the input.
    * `h32s(c, j) = h32(c || '#' || j)`. */
  def h32s(c: Column, salt: Int): Column =
    h32(concat(c, lit("#" + salt)))

  /** Second independent 32-bit word from the SAME md5 digest (hex chars
    * 9-16 = bytes 4-7) — pairs with [[h32]] to give 64 portable hash bits
    * per input at the cost of one digest. */
  def h32b(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 9, 8), 16, 10).cast("long")

  /** Full 128-bit content fingerprint (hex). */
  def fingerprint128(c: Column): Column = md5(c.cast("binary"))

  /** Portable 63-bit hash in [0, 2^63): `h32·2³¹ + (h32b mod 2³¹)` —
    * both words from ONE md5 digest (whole-stage codegen CSEs the
    * digest). Max value (2³²-1)·2³¹ + 2³¹-1 = 2⁶³-1, so the result is
    * exact in a signed Long on every engine — no unsigned-64 or
    * double-mantissa trap. Used where 32 bits collide too often (KMV
    * order statistics at k·√n ≳ 2¹⁶). */
  def h63(c: Column): Column =
    h32(c) * lit(2147483648L) + h32b(c) % lit(2147483648L)

  /** Largest prime below 2^32 — modulus of the affine hash family. */
  val AffineP = 4294967291L

  private def affineA(j: Int): Long = 2L * j + 1
  private def affineB(j: Int): Long = 12582917L * j

  /** Member `j` of a universal affine family over an h32 base hash:
    * `h_j = ((2j+1)·h + j·12582917) mod P`. One md5 per input, k cheap
    * arithmetic transforms — 16× fewer digests than salting the input k
    * times. `(2j+1)·h < 2^37`, so no overflow under ANSI arithmetic. */
  def affine(h: Column, j: Int): Column =
    (h * lit(affineA(j)) + lit(affineB(j))) % lit(AffineP)

  /** DuckDB SQL fragment for [[affine]] over expression `h`. */
  def sqlAffine(h: String, j: Int): String =
    s"((${affineA(j)} * $h + ${affineB(j)}) % $AffineP)"

  /** DuckDB fragment for [[affine]] with the member index as a SQL
    * variable `j` (for list comprehensions over `range(0, k)`). */
  def sqlAffineVar(h: String, jVar: String): String =
    s"(((2*$jVar + 1) * $h + 12582917 * $jVar) % $AffineP)"

  /** DuckDB SQL fragment computing the same `h32` over expression `e`. */
  def sqlH32(e: String): String =
    s"(('0x' || substr(md5($e), 1, 8))::BIGINT)"

  /** DuckDB fragment for [[h32b]] (md5 hex chars 9-16). */
  def sqlH32b(e: String): String =
    s"(('0x' || substr(md5($e), 9, 8))::BIGINT)"

  /** DuckDB fragment for [[h63]]. */
  def sqlH63(e: String): String =
    s"(${sqlH32(e)} * 2147483648 + ${sqlH32b(e)} % 2147483648)"

  /** DuckDB SQL fragment for the salted family member. */
  def sqlH32s(e: String, salt: Int): String =
    sqlH32(s"($e || '#$salt')")

  /** Driver-side twin of [[h32]] for a literal string — md5 bytes 0-3 as
    * an unsigned 32-bit value. Used where an operator needs the cell/
    * bucket of a HANDFUL of literal probe values computed on the driver
    * (e.g. Count-Min point estimates) with bit-identical arithmetic. */
  def h32Of(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Driver-side twin of [[affine]]. */
  def affineOf(h: Long, j: Int): Long =
    (h * affineA(j) + affineB(j)) % AffineP
}
