package graft.marc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bad-data behavior, mirroring the reference's edge fixtures
  * (SURVEY.md §5): invalid bytes, malformed subfield codes, emptyish
  * records, missing expected fields. */
class RobustnessSpec extends SparkSpec {

  test("bad_utf_byte record reads with replacement chars, still extracts") {
    // fixture is a single 300-field record whose $a carries an invalid byte
    // (reference: marc_reader_test "replaces bad byte")
    val rec = Fixtures.first("bad_utf_byte.utf8")
    val v300 = MarcExtractor("300a").extract(rec)
    assert(v300.nonEmpty)
    assert(v300.head.contains('�'), s"bad byte replaced in: ${v300.head}")
  }

  test("bad_subfield_code record extracts the good subfields") {
    val rec = Fixtures.first("bad_subfield_code")
    assert(MarcExtractor("001").extract(rec).nonEmpty)
    assert(MarcExtractor("245a").extract(rec).nonEmpty)
  }

  test("emptyish record produces empty extractions, not errors") {
    val rec = Fixtures.first("emptyish_record")
    assert(MarcExtractor("245abk").extract(rec).isEmpty ||
      MarcExtractor("245abk").extract(rec).nonEmpty) // no throw is the assertion
    assert(Marc21Semantics.publicationDate(rec).isEmpty ||
      Marc21Semantics.publicationDate(rec).nonEmpty)
  }

  test("corrupt NDJ lines are skipped, good lines survive") {
    import spark.implicits._
    val lines = Seq(
      """{"leader":"x","fields":[{"001":"good"}]}""",
      """{not json at all""",
      """{"leader":"y","fields":[{"001":"also good"}]}""")
    val ds = lines.toDS()
    val parsed = ds.flatMap(l => MarcJson.parseOption(l))(MarcFunctions.marcRecordEncoder)
    assert(parsed.count() == 2)
  }

  test("ISO-2709 decoder resyncs past a corrupt record") {
    val good = graft.sources.Iso2709.encode(
      MarcRecord("00000cam a2200000 a 4500", Vector(MarcField.control("001", "ok"))))
    val garbage = "XXXXXnot a record".getBytes("UTF-8")
    val decoded = graft.sources.Iso2709.decodeAll(garbage ++ good)
    assert(decoded.length == 1)
    assert(decoded.head.fields.head.value == "ok")
  }

  test("byte-slice out of range yields null (compacted at output)") {
    val rec = MarcRecord("", Vector(MarcField.control("008", "short")))
    assert(MarcExtractor("008[35-37]").extract(rec) == Vector(null))
    // and through the column path with output normalization:
    val out = graft.pipeline.Pipeline.builder
      .toField("l", MarcFunctions.marcExtract("008[35-37]"))
      .mapRecord(spark, rec)
    assert(out.get.get("l").isEmpty, "null-only extraction is omitted")
  }
}
