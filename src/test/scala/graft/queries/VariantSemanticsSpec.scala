package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins the VARIANT semantics the q297/q298 oracles are built on — if
  * a Spark upgrade changes any of these, the gates' generating rules
  * must be revisited, and this spec reds out locally before the
  * driver does.
  */
class VariantSemanticsSpec extends AnyFunSuite with SparkTestSession {

  private def one(sql: String) = spark.sql(sql).head()

  test("schema_of_variant renderings the q298 oracle hardcodes") {
    assert(one("""SELECT schema_of_variant(variant_get(parse_json('{"x": 12345}'), '$.x'))""")
      .getString(0) == "BIGINT")
    assert(one("""SELECT schema_of_variant(variant_get(parse_json('{"x": -7}'), '$.x'))""")
      .getString(0) == "BIGINT")
    assert(one("""SELECT schema_of_variant(variant_get(parse_json('{"x": "ab"}'), '$.x'))""")
      .getString(0) == "STRING")
    assert(one("""SELECT schema_of_variant(variant_get(parse_json('{"x": {"seg": "AB"}}'), '$.x'))""")
      .getString(0) == "OBJECT<seg: STRING>")
  }

  test("JSON null vs absent path: the T2 distinction on the variant plane") {
    val r = one("""SELECT
        is_variant_null(variant_get(parse_json('{"x": null}'), '$.x')),
        variant_get(parse_json('{"x": null}'), '$.x') IS NULL,
        is_variant_null(variant_get(parse_json('{"y": 1}'), '$.x')),
        variant_get(parse_json('{"y": 1}'), '$.x') IS NULL""")
    assert(r.getBoolean(0), "explicit JSON null must be variant-null")
    assert(!r.getBoolean(1), "explicit JSON null is NOT SQL NULL")
    assert(!r.getBoolean(2), "absent path is not variant-null")
    assert(r.getBoolean(3), "absent path IS SQL NULL")
  }

  test("try_variant_get long casts: numerics pass, words/objects/null fail") {
    val r = one("""SELECT
        try_variant_get(parse_json('{"x": 42}'), '$.x', 'long'),
        try_variant_get(parse_json('{"x": "BUILDING"}'), '$.x', 'long'),
        try_variant_get(parse_json('{"x": {"a": 1}}'), '$.x', 'long'),
        try_variant_get(parse_json('{"x": null}'), '$.x', 'long')""")
    assert(r.getLong(0) == 42L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("to_json drops null struct fields (the q297 dropped-field leg)") {
    val s = one("""SELECT to_json(named_struct('a', 1, 'b', CAST(NULL AS BIGINT)))""")
      .getString(0)
    assert(s == """{"a":1}""", s"ignoreNullFields default changed: $s")
  }

  test("typed extraction round-trips doubles and nested strings exactly") {
    val r = one("""WITH v AS (SELECT parse_json(to_json(named_struct(
          'p', 173665.47d, 'meta', named_struct('d', '1994-01-02')))) AS v)
        SELECT variant_get(v, '$.p', 'double'),
               variant_get(v, '$.meta.d', 'string') FROM v""")
    assert(r.getDouble(0) == 173665.47d)
    assert(r.getString(1) == "1994-01-02")
  }
}
