package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** I1–I4 vote-table semantics against `ui/run_pipeline.py:261-355`. */
class SchemaInferenceSpec extends AnyFunSuite with SparkTestSession {

  private def infer(docs: Seq[String]): Map[String, (String, Boolean)] = {
    import spark.implicits._
    SchemaInference.inferSchema(docs.toDF("raw"), "raw")
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getBoolean(2)))
      .toMap
  }

  test("single-type votes win; mixes resolve per the reference table") {
    val m = infer(Seq(
      """{"i": 1, "f": 2.5, "b": true, "s": "plain", "mix_in": 1, "mix_it": 2}""",
      """{"i": 2, "f": 3,   "b": false, "s": "text", "mix_in": 3.5, "mix_it": "x"}"""))
    assert(m("i")._1 == "integer")
    assert(m("f")._1 == "numeric") // {numeric,integer} → numeric
    assert(m("b")._1 == "boolean")
    assert(m("s")._1 == "text")
    assert(m("mix_in")._1 == "numeric") // {integer,numeric} → numeric
    assert(m("mix_it")._1 == "text") // {integer,text} → text
  }

  test("string sniffing: datetime before date, then int, float, text") {
    val m = infer(Seq(
      """{"dt": "2025-03-04T10:30:05", "d": "03/04/2025", "n": "42", "x": "4.5", "t": "a1"}"""))
    assert(m("dt")._1 == "datetime")
    assert(m("d")._1 == "date")
    assert(m("n")._1 == "integer")
    assert(m("x")._1 == "numeric")
    assert(m("t")._1 == "text")
  }

  test("all-null and absent-but-present-key attributes vote text; union keeps them") {
    val m = infer(Seq("""{"a": null, "b": 1}""", """{"a": null}"""))
    assert(m("a") == ("text", true)) // no votes → text; also sorted head → object id
    assert(m("b")._1 == "integer")
  }

  test("object-id preference: _id > id > first attribute") {
    assert(infer(Seq("""{"z": 1, "_id": 2, "id": 3}"""))("_id")._2)
    assert(infer(Seq("""{"z": 1, "id": 3}"""))("id")._2)
    val m = infer(Seq("""{"z": 1, "aa": 2}"""))
    assert(m("aa")._2 && !m("z")._2) // sorted head
  }

  test("mapping_editor variant: numeric strings stay text") {
    import spark.implicits._
    val m = SchemaInference.inferSchema(
      Seq("""{"n": "42", "d": "2025-01-02"}""").toDF("raw"), "raw",
      sniffNumericStrings = false)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("n") == "text") // run_pipeline variant says integer; editor variant says text
    assert(m("d") == "date")
  }

  test("lists and objects vote text") {
    val m = infer(Seq("""{"arr": [1,2], "obj": {"x": 1}}"""))
    assert(m("arr")._1 == "text" && m("obj")._1 == "text")
  }

  test("inferMapping builds the placeholder collection config") {
    import spark.implicits._
    val cm = SchemaInference.inferMapping(
      Seq("""{"_id": 1, "name": "a", "joined": "2025-01-02"}""").toDF("raw"),
      "raw", "people")
    assert(cm.targetTable == "public.people")
    assert(cm.objectIdAttribute == "_id")
    assert(cm.mappings("joined") == AttributeMapping("joined", "date"))
    assert(cm.mappings.keys.toSeq == Seq("_id", "joined", "name")) // sorted
  }

  test("sampled inference is deterministic and a restriction of the full scan") {
    import spark.implicits._
    val docs = (0 until 400).map(i =>
      s"""{"id": $i, "v": ${if (i % 2 == 0) i.toString else "\"s\""}}""")
    val df = docs.toDF("raw")
    def run() = SchemaInference.inferSchemaSampled(df, "raw", pct = 25)
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    val a = run()
    assert(a == run()) // content-stable sample ⇒ identical result
    // both attributes still observed; the mixed-type vote still resolves
    assert(a.map(_._1) == List("id", "v"))
    assert(a.toMap.apply("v") == "text")
    assertThrows[IllegalArgumentException](
      SchemaInference.inferSchemaSampled(df, "raw", pct = 0))
  }
}
