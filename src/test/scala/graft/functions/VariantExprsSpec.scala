package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The two native variant/transform expressions against the composed
  * forms they replaced (round 13): [[VariantTypeTag]] must classify
  * exactly like `schema_of_variant`'s string families, and
  * [[MultiFormatTimestamp]] must match the
  * `coalesce(try_to_timestamp × N)` chain value-for-value AND report
  * the first-match index the old `foldRight` offset logic derived.
  */
class VariantExprsSpec extends AnyFunSuite with SparkTestSession {

  private def tagOf(c: Column): Column =
    GraftExpressionBridge.column(
      VariantTypeTag(GraftExpressionBridge.expression(c)))

  test("VariantTypeTag classifies every parse_json-producible type like schema_of_variant") {
    import spark.implicits._
    val docs = Seq(
      """null""", """true""", """false""", """42""", """-7""",
      """9223372036854775807""", """123456789012345678901234567890""",
      """1.5""", """-0.25""", """1e300""", """0.1""",
      """"s"""", """""""", """"2024-01-02"""",
      """[1,2]""", """[]""", """{"a":1}""", """{}""")
    val df = docs.toDF("j").select(
      col("j"),
      schema_of_variant(parse_json(col("j"))).as("sv"),
      tagOf(parse_json(col("j"))).as("tag"))
    df.collect().foreach { r =>
      val sv = r.getString(1)
      val expected =
        if (sv == "VOID") VariantTypeTag.TagJsonNull
        else if (sv == "BOOLEAN") VariantTypeTag.TagBoolean
        else if (sv == "BIGINT") VariantTypeTag.TagLong
        else if (sv.startsWith("DECIMAL")) VariantTypeTag.TagDecimal
        else if (sv == "DOUBLE") VariantTypeTag.TagDouble
        else if (sv == "STRING") VariantTypeTag.TagString
        else if (sv.startsWith("OBJECT") || sv == "STRUCT<>") VariantTypeTag.TagObject
        else if (sv.startsWith("ARRAY")) VariantTypeTag.TagArray
        else fail(s"unexpected schema_of_variant: $sv for ${r.getString(0)}")
      assert(r.getInt(2) == expected, s"doc=${r.getString(0)} sv=$sv")
    }
    // SQL NULL variant stays NULL, like schema_of_variant(NULL)
    val n = spark.sql(
      "SELECT graft_variant_tag(CAST(NULL AS VARIANT))").head()
    assert(n.isNullAt(0))
    // sub-variant extraction: a missing path is NULL, present paths tag
    val sub = Seq("""{"a": [1], "b": null}""").toDF("j").select(
      tagOf(variant_get(parse_json(col("j")), "$.a", "variant")).as("ta"),
      tagOf(variant_get(parse_json(col("j")), "$.b", "variant")).as("tb"),
      tagOf(variant_get(parse_json(col("j")), "$.c", "variant")).as("tc")).head()
    assert(sub.getInt(0) == VariantTypeTag.TagArray)
    assert(sub.getInt(1) == VariantTypeTag.TagJsonNull)
    assert(sub.isNullAt(2))
  }

  test("MultiFormatTimestamp equals the coalesced try_to_timestamp chain, first match wins") {
    import spark.implicits._
    val patterns = Seq(
      "y-M-d", "M/d/y", "d-M-y", "y/M/d", "y.M.d",
      "y-M-d'T'H:m:s", "y-M-d'T'H:m:sXX", "y-M-d'T'H:m:s.SSSSSS'Z'",
      "y-M-d H:m:s", "y-M-d'T'H:m:s.SSSSSS")
    val strs = Seq(
      "2024-03-05", "03/05/2024", "05-03-2024", "2024/03/05", "2024.03.05",
      "2024-03-05T07:08:09", "2024-03-05T07:08:09+02:00",
      "2024-03-05T07:08:09.123456Z", "2024-03-05 07:08:09",
      "2024-03-05T07:08:09.000001",
      // ambiguous: parses under BOTH y-M-d'T'H:m:s (idx 5) and later —
      // the chain and the native expression must both pick idx 5
      "2024-3-5T7:8:9",
      "junk", "", "2024-13-45", "00:00:00", "2024-03-05T07:08",
      "99999-01-01", " 2024-03-05", "2024-03-05 ")
    val mft: Column = GraftExpressionBridge.column(MultiFormatTimestamp(
      GraftExpressionBridge.expression(col("s")), patterns))
    val chain = coalesce(patterns.map(p => try_to_timestamp(col("s"), lit(p))): _*)
    val firstIdx = patterns.zipWithIndex.foldRight(lit(null).cast("int")) {
      case ((p, i), acc) =>
        when(try_to_timestamp(col("s"), lit(p)).isNotNull, lit(i)).otherwise(acc)
    }
    val rows = strs.toDF("s").select(
      col("s"),
      mft.getField("ts").as("nts"), chain.as("cts"),
      mft.getField("idx").as("nidx"), firstIdx.as("cidx")).collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2), s"ts mismatch for '${r.getString(0)}'")
      assert(r.get(3) == r.get(4), s"idx mismatch for '${r.getString(0)}'")
    }
    // null input → null struct; codegen path over a real scan
    val ndf = Seq[Option[String]](None, Some("2024-03-05")).toDF("s")
      .select(GraftExpressionBridge.column(MultiFormatTimestamp(
        GraftExpressionBridge.expression(col("s")), patterns)).as("r"))
    val got = ndf.collect()
    assert(got.exists(_.isNullAt(0)) && got.exists(!_.isNullAt(0)))
  }

  test("generated matrix: native == chain on Spark-rendered timestamps of every format, plus corruptions") {
    import spark.implicits._
    val patterns = Seq(
      "y-M-d", "M/d/y", "d-M-y", "y/M/d", "y.M.d",
      "y-M-d'T'H:m:s", "y-M-d'T'H:m:sXX", "y-M-d'T'H:m:s.SSSSSS'Z'",
      "y-M-d H:m:s", "y-M-d'T'H:m:s.SSSSSS")
    // 150 deterministic pseudo-random instants (seconds + micros),
    // rendered BY SPARK through each pattern so every string is, by
    // construction, in some format's image — then corrupted copies
    // (suffix junk, head truncation) that mostly parse under none.
    val rnd = new scala.util.Random(13)
    val instants = (0 until 150).map { _ =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        rnd.between(0L, 2000000000L), rnd.between(0, 1000000) * 1000L))
    }
    val base = instants.toDF("t")
    val rendered = patterns
      .map(p => base.select(date_format(col("t"), p).as("s")))
      .reduce(_.unionAll(_))
    val corrupted = rendered.select(concat(col("s"), lit("x")).as("s"))
      .unionAll(rendered.select(substring(col("s"), 2, 100).as("s")))
      .unionAll(rendered.select(concat(lit(" "), col("s")).as("s")))
    val all = rendered.unionAll(corrupted)

    val mft = GraftExpressionBridge.column(MultiFormatTimestamp(
      GraftExpressionBridge.expression(col("s")), patterns))
    val chain = coalesce(patterns.map(p => try_to_timestamp(col("s"), lit(p))): _*)
    val firstIdx = patterns.zipWithIndex.foldRight(lit(null).cast("int")) {
      case ((p, i), acc) =>
        when(try_to_timestamp(col("s"), lit(p)).isNotNull, lit(i)).otherwise(acc)
    }
    val checked = all.select(
      col("s"),
      mft.getField("ts").as("nts"), chain.as("cts"),
      mft.getField("idx").as("nidx"), firstIdx.as("cidx"))
    val mismatches = checked
      .filter(!(col("nts") <=> col("cts")) || !(col("nidx") <=> col("cidx")))
    assert(mismatches.count() == 0, {
      val ex = mismatches.take(5).map(_.toString).mkString("; ")
      s"native parse diverged from the try_to_timestamp chain: $ex"
    })
    // sanity: the rendered half really parses (non-null ts throughout)
    val renderedParsed = rendered.select(mft.getField("ts").as("ts"))
      .filter(col("ts").isNull).count()
    assert(renderedParsed == 0, "a Spark-rendered string failed to re-parse")
  }
}
