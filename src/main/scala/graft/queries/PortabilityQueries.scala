package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 portability canaries — one tiny gate per DuckDB oracle
  * idiom the query surface relies on, so a driver-harness DuckDB
  * change localizes to ONE obviously-named canary instead of four
  * scattered fingerprint gates (the round-9 failure mode: q174 / q186
  * / q197 / q207 hash-mismatched in the driver while bit-identical
  * in-container, and the shared idiom had to be reverse-engineered
  * from which gates went red).
  *
  * Design rules (see [[OracleIdioms]]):
  *  - every canary's FINAL columns are BIGINT — the one type every
  *    driver run has always compared bit-exactly — so a canary can
  *    only fail when the idiom ITSELF computes a different value;
  *  - each canary computes the same quantity two ways where the idiom
  *    has a version-stable arithmetic twin (hex cast vs strpos fold,
  *    bin() length vs powers table), so the failing COLUMN names the
  *    drifted construct;
  *  - inputs are the 5-row `region` table — constant keys 0..4, no
  *    data dependence beyond "driver testdata exists".
  *
  * Idioms deliberately NOT canaried: DECIMAL(38,0)/HUGEINT as FINAL
  * column types. No gate emits them anymore (OracleIdioms rule 1 —
  * they were the round-9 casualty set), so there is nothing left for
  * such a canary to protect; their ARITHMETIC (which many oracles use
  * internally) is covered by q217/q218.
  */
object PortabilityQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q214: the md5-prefix digest two ways — the ('0x'||hex)::BIGINT
    // string cast (still used by many green oracles: q177, q208,
    // q210, …) against the strpos arithmetic fold (OracleIdioms.hex60,
    // used by the fingerprint gates). Spark's native md5_prefix60 is
    // the single source of truth; if either DuckDB idiom drifts, only
    // its column goes red.
    "q214_canary_digest" -> QuerySpec(
      (s, dir) => {
        Tables.region(s, dir).createOrReplaceTempView("g_q214_region")
        s.sql("""
          SELECT r_regionkey AS k,
                 md5_prefix60(CAST(r_regionkey AS STRING)) AS d_cast,
                 md5_prefix60(CAST(r_regionkey AS STRING)) AS d_fold
          FROM g_q214_region ORDER BY k""")
      },
      s"""SELECT r_regionkey AS k,
             CAST(('0x' || substr(md5(CAST(r_regionkey AS VARCHAR)), 1, 15))::BIGINT
                  AS BIGINT) AS d_cast,
             CAST(${OracleIdioms.hex60("CAST(r_regionkey AS VARCHAR)")}
                  AS BIGINT) AS d_fold
         FROM region ORDER BY k"""),

    // Q215: integer bit length two ways — length(bin(w)) (render-width
    // dependent; the q186 round-9 suspect) against the powers-of-two
    // VALUES fold. w spans small and ~50-bit magnitudes from the
    // digest family so both ends of the width range are exercised.
    "q215_canary_binlen" -> QuerySpec(
      (s, dir) => {
        Tables.region(s, dir).createOrReplaceTempView("g_q215_region")
        s.sql("""
          WITH w AS (SELECT r_regionkey AS k,
                            md5_prefix60(CAST(r_regionkey AS STRING))
                              div 1024 AS w
                     FROM g_q215_region)
          SELECT k, w, CAST(length(bin(w)) AS BIGINT) AS bl_bin,
                 CAST(length(bin(w)) AS BIGINT) AS bl_arith
          FROM w ORDER BY k""")
      },
      s"""WITH pw(p) AS (VALUES ${OracleIdioms.pow2Values50}),
         w AS (SELECT r_regionkey AS k,
                      ${OracleIdioms.hex60("CAST(r_regionkey AS VARCHAR)")}
                        // 1024 AS w
               FROM region),
         bl AS (SELECT k, w,
                       sum(CASE WHEN w >= p THEN 1 ELSE 0 END) AS bl_arith
                FROM w CROSS JOIN pw GROUP BY 1, 2)
         SELECT k, w, CAST(length(bin(w)) AS BIGINT) AS bl_bin,
                CAST(bl_arith AS BIGINT) AS bl_arith
         FROM bl ORDER BY k"""),

    // Q216: signed integer division and modulo — every ppm gate rides
    // on Spark `div` == DuckDB `//` truncating TOWARD ZERO and on
    // C-style remainder sign (sign of the dividend). Both engines
    // verified truncating on 1.0.0; a DuckDB switch to floor division
    // would flip the negative rows here first.
    "q216_canary_intdiv" -> QuerySpec(
      (s, dir) => {
        Tables.region(s, dir).createOrReplaceTempView("g_q216_region")
        s.sql("""
          WITH n AS (SELECT r_regionkey AS k,
                            CAST(7 * (r_regionkey - 2) AS BIGINT) AS num
                     FROM g_q216_region)
          SELECT k, num, CAST(num div 3 AS BIGINT) AS q_trunc,
                 CAST(num % 3 AS BIGINT) AS r_mod
          FROM n ORDER BY k""")
      },
      """WITH n AS (SELECT r_regionkey AS k,
                           CAST(7 * (r_regionkey - 2) AS BIGINT) AS num
                    FROM region)
         SELECT k, num, CAST(num // 3 AS BIGINT) AS q_trunc,
                CAST(num % 3 AS BIGINT) AS r_mod
         FROM n ORDER BY k"""),

    // Q217: HUGEINT intermediates + `<<` shifts (the q186/q187 sketch
    // arithmetic), folded mod 2^62 to a BIGINT final: a >64-bit
    // product that wraps or saturates differently would shift the
    // folded value.
    "q217_canary_hugeint" -> QuerySpec(
      (s, dir) => {
        Tables.region(s, dir).createOrReplaceTempView("g_q217_region")
        s.sql("""
          SELECT r_regionkey AS k,
                 CAST(CAST(1234567890123456789 AS DECIMAL(38,0))
                      * (r_regionkey + 2) % 4611686018427387904
                      AS BIGINT) AS wide_prod,
                 CAST(shiftleft(CAST(1 AS BIGINT), 40 + r_regionkey)
                      % 1000003 AS BIGINT) AS shifted
          FROM g_q217_region ORDER BY k""")
      },
      """SELECT r_regionkey AS k,
             CAST(CAST(1234567890123456789 AS HUGEINT)
                  * (r_regionkey + 2) % 4611686018427387904
                  AS BIGINT) AS wide_prod,
             CAST((CAST(1 AS BIGINT) << CAST(40 + r_regionkey AS INTEGER))
                  % 1000003 AS BIGINT) AS shifted
         FROM region ORDER BY k"""),

    // Q218: DECIMAL(38,0) intermediate arithmetic (the q180/q193 ppm
    // routing pattern): a 20-digit product folded to BIGINT. Exercises
    // decimal multiply precision rules + decimal modulo on both
    // engines without ever emitting a decimal column.
    "q218_canary_decimal" -> QuerySpec(
      (s, dir) => {
        Tables.region(s, dir).createOrReplaceTempView("g_q218_region")
        s.sql("""
          SELECT r_regionkey AS k,
                 CAST(CAST('12345678901234567890' AS DECIMAL(38,0))
                      * (r_regionkey + 1) % 4611686018427387904
                      AS BIGINT) AS dec_prod
          FROM g_q218_region ORDER BY k""")
      },
      """SELECT r_regionkey AS k,
             CAST(CAST('12345678901234567890' AS DECIMAL(38,0))
                  * (r_regionkey + 1) % 4611686018427387904
                  AS BIGINT) AS dec_prod
         FROM region ORDER BY k"""),

    // Q293: the exclusive running-sum window frame (ROWS ... AND 1
    // PRECEDING + coalesce) against its version-stable twin
    // (inclusive frame minus the current row) — the idiom the q235
    // oracle leaned on when it went red in round 10. Both columns are
    // CAST to BIGINT *outside* the window (DuckDB's windowed
    // sum(BIGINT) is HUGEINT — the round-9 casualty type — so an
    // uncast emit is exactly what this canary must never do).
    "q293_canary_exclframe" -> QuerySpec(
      (s, dir) => {
        Tables.region(s, dir).createOrReplaceTempView("g_q293_region")
        s.sql("""
          WITH v AS (SELECT r_regionkey AS k,
                            CAST((r_regionkey + 1) * 37 AS BIGINT) AS v
                     FROM g_q293_region)
          SELECT k, v,
                 CAST(coalesce(sum(v) OVER (ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS rb_excl,
                 CAST(sum(v) OVER (ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - v
                   AS BIGINT) AS rb_incl
          FROM v ORDER BY k""")
      },
      """WITH v AS (SELECT r_regionkey AS k,
                           CAST((r_regionkey + 1) * 37 AS BIGINT) AS v
                    FROM region)
         SELECT k, v,
                CAST(coalesce(sum(v) OVER (ORDER BY k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS rb_excl,
                CAST(sum(v) OVER (ORDER BY k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - v
                  AS BIGINT) AS rb_incl
         FROM v ORDER BY k"""),

    // Q294: floor division applied to a windowed sum — in DuckDB the
    // running sum is HUGEINT, so `rs // 7` divides in HUGEINT while
    // `CAST(rs AS BIGINT) // 7` divides in BIGINT. Values are
    // nonnegative (floor == trunc) and both columns are emitted as
    // BIGINT; if HUGEINT division ever drifts from BIGINT division,
    // only div_huge goes red and names the construct.
    "q294_canary_windivfloor" -> QuerySpec(
      (s, dir) => {
        Tables.region(s, dir).createOrReplaceTempView("g_q294_region")
        s.sql("""
          WITH v AS (SELECT r_regionkey AS k,
                            CAST((r_regionkey + 1) * 37 AS BIGINT) AS v
                     FROM g_q294_region),
               r AS (SELECT k, sum(v) OVER (ORDER BY k
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS rs FROM v)
          SELECT k, CAST(rs div 7 AS BIGINT) AS div_big,
                 CAST(rs div 7 AS BIGINT) AS div_huge
          FROM r ORDER BY k""")
      },
      """WITH v AS (SELECT r_regionkey AS k,
                           CAST((r_regionkey + 1) * 37 AS BIGINT) AS v
                    FROM region),
              r AS (SELECT k, sum(v) OVER (ORDER BY k
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS rs FROM v)
         SELECT k, CAST(CAST(rs AS BIGINT) // 7 AS BIGINT) AS div_big,
                CAST(rs // 7 AS BIGINT) AS div_huge
         FROM r ORDER BY k"""),

    // Q295: regexp_replace capture-group backreference — the BPE
    // chain's '(.)' -> '[\1]' bracketing (q223/q230/q235 all ride on
    // it). The twin is pure arithmetic: region names are single-byte
    // ASCII, so bracketing every character triples the length. A
    // replacement-syntax drift (\1 vs $1 vs literal) breaks len_re
    // against len_arith in one obviously-named place.
    "q295_canary_regexbackref" -> QuerySpec(
      (s, dir) => {
        Tables.region(s, dir).createOrReplaceTempView("g_q295_region")
        s.sql("""
          SELECT r_regionkey AS k,
                 CAST(length(regexp_replace(r_name, '(.)', '[$1]'))
                   AS BIGINT) AS len_re,
                 CAST(3 * length(r_name) AS BIGINT) AS len_arith
          FROM g_q295_region ORDER BY k""")
      },
      """SELECT r_regionkey AS k,
             CAST(length(regexp_replace(r_name, '(.)', '[\1]', 'g'))
               AS BIGINT) AS len_re,
             CAST(3 * length(r_name) AS BIGINT) AS len_arith
         FROM region ORDER BY k"""))
}
