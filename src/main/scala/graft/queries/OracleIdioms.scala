package graft.queries

/** Version-stable DuckDB oracle idioms.
  *
  * Round-9 postmortem: the driver's DuckDB harness disagreed with the
  * in-container DuckDB 1.0.0 on exactly the gates whose FINAL columns
  * were DECIMAL(38,0)/HUGEINT (q174/q186/q197/q207) — every gate whose
  * output is pure BIGINT/VARCHAR/DATE was green in both. The defensive
  * contract encoded here:
  *
  *   1. final result columns are BIGINT, VARCHAR, or DATE — never
  *      HUGEINT or DECIMAL (those are fine as INTERMEDIATES; the
  *      q180/q193 pattern, green in every driver run, routes >64-bit
  *      products through them and casts the final column back);
  *   2. digests avoid the `('0x' || substr(md5(..),1,15))::BIGINT`
  *      hex-string cast in favor of an arithmetic strpos fold — same
  *      value, zero dependence on string→int cast behavior;
  *   3. bit lengths avoid `length(bin(w))` (render-width dependent)
  *      in favor of counting powers of two ≤ w from a VALUES table;
  *   4. DOUBLE final columns are allowed ONLY when the value is
  *      per-row deterministic or integer-derived — a ratio of exact
  *      BIGINTs, a dot product over a fixed-order array, an exact
  *      rank pick. NEVER a cross-row float accumulation
  *      (`sum(double)`, `avg(double)` over a shuffled relation):
  *      float addition is non-associative, so partitioning would
  *      change the bits and the driver hash. Audited round 11: all 18
  *      DOUBLE-emitting gates satisfy this.
  *
  * Everything here is SQL-92-shaped arithmetic any DuckDB build
  * evaluates identically; each idiom also has a standalone canary gate
  * (PortabilityQueries q214+) so a future harness drift localizes to
  * one tiny query instead of scattered fingerprint gates.
  */
object OracleIdioms {

  /** The repo's 60-bit md5-prefix digest (= native `md5_prefix60`) as
    * pure arithmetic: parse the first 15 hex chars of md5 by digit
    * lookup. Max value 16^15-1 = 2^60-1; every term and the sum fit
    * BIGINT.
    */
  def hex60(inner: String): String =
    (1 to 15).map { i =>
      val coef = 1L << (4 * (15 - i))
      s"(strpos('0123456789abcdef', substr(md5($inner), $i, 1)) - 1) * $coef"
    }.mkString("(", "\n               + ", ")")

  /** `pw(p)` VALUES rows for 2^0..2^49: `bitlen(w) = sum(w >= p)` over
    * a cross join reproduces `length(bin(w))` for w in [1, 2^50).
    */
  val pow2Values50: String =
    (0 until 50).map(i => s"(${1L << i})").mkString(", ")

  /** `p2(e, v)` VALUES pairs (e, 2^e) for e = 0..59 — exponent lookup
    * without `<<` on a computed shift amount.
    */
  val pow2Pairs60: String =
    (0 until 60).map(i => s"($i, ${1L << i})").mkString(", ")

  /** 2^62 — the fold modulus that maps an unbounded nonnegative digest
    * sum onto BIGINT. Order-independence and multiplicity-sensitivity
    * of a fingerprint sum survive a fixed modulus; the emitted column
    * becomes the one type every driver run has always compared
    * bit-exactly.
    */
  val fold62 = "4611686018427387904"
}
