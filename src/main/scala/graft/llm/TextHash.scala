package graft.llm

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing for the dedup/similarity
  * operators: the first 15 hex chars of md5 as a non-negative 60-bit
  * integer. Chosen because the identical value is computable in Spark
  * (`conv(substr(md5(x),1,15),16,10)`), in DuckDB
  * (`('0x'||substr(md5(x),1,15))::bigint`), and on the JVM — so every
  * signature/bucket below is oracle-checkable bit-for-bit, unlike
  * engine-specific hashes (Spark murmur3 vs DuckDB's internal hash).
  */
object TextHash {

  /** Modulus for MinHash permutations: the Mersenne prime 2^31-1, so
    * `a*h + b` stays well inside signed-64 range (a,h < 2^31).
    */
  val Prime: Long = 2147483647L

  /** 60-bit md5 prefix hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** `hash60 mod Prime` — the shingle-hash domain for MinHash. */
  def hashMod(c: Column): Column = pmod(hash60(c), lit(Prime))

  /** 32-bit md5 prefix hash (for SimHash bit vectors). */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** The same 60-bit hash computed on the JVM (plane/coefficient
    * generation — embedded as literals in both the Spark plan and the
    * generated oracle SQL).
    */
  def jvmHash60(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** MinHash permutation coefficients (a_i, b_i), a_i non-zero mod Prime,
    * derived deterministically from the seed strings `graft_a_i` /
    * `graft_b_i`.
    */
  def minhashCoefficients(n: Int): Seq[(Long, Long)] =
    (0 until n).map { i =>
      (1L + jvmHash60(s"graft_a_$i") % (Prime - 1),
        jvmHash60(s"graft_b_$i") % Prime)
    }

  /** Random-hyperplane sign matrix for LSH buckets: `planes(p)(d)` is
    * +1/-1 from the parity of `jvmHash60("p_d")` (d is 1-based to match
    * SQL list indexing).
    */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Int]] =
    (0 until nPlanes).map { p =>
      (1 to dim).map { d =>
        if (jvmHash60(s"${p}_$d") % 2 == 0) 1 else -1
      }
    }
}
