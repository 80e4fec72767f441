package graft.examples

import graft.SparkSpec
import graft.marc.{Fixtures, MarcSource}

/** Integration test over the reference's 30-record corpus — the analog of
  * test/indexer/read_write_test.rb's demo_config run (every record maps,
  * titles present) plus spot-checks derived from the already-golden-tested
  * operators. */
class DemoIndexerSpec extends SparkSpec {

  private lazy val outputs: Map[String, Map[String, Seq[String]]] = {
    val df = MarcSource.fromRecords(spark,
      Fixtures.records("test_data.utf8") :+ Fixtures.first("manufacturing_consent"))
    val out = DemoIndexer.index(df)
    val names = out.schema.fieldNames
    out.collect().map { row =>
      val doc = names.zipWithIndex.flatMap { case (n, i) =>
        if (row.isNullAt(i)) None else Some(n -> row.getSeq[String](i))
      }.toMap
      doc("id").head -> doc
    }.toMap
  }

  test("all corpus records map with ids and titles") {
    assert(outputs.size == 31) // 30-record corpus + manufacturing_consent
    assert(outputs.keys.forall(_.startsWith("bib_")))
    assert(outputs.values.forall(_.get("title_t").exists(_.nonEmpty)),
      "every record has title_t (read_write_test.rb:163)")
  }

  test("known record: manufacturing consent spot checks") {
    val doc = outputs("bib_2710183")
    assert(doc("title_display") == Seq("Manufacturing consent : the political economy of the mass media"))
    assert(doc("title_sort") == Seq("Manufacturing consent : the political economy of the mass media"))
    assert(doc("author_display") == Seq("Herman, Edward S."))
    assert(doc("pub_date") == Seq("2002"))
    assert(doc("format").contains("Book"))
    assert(doc("oclcnum_t") == Seq("47971712"))
    assert(doc("language_facet") == Seq("English"))
    assert(doc("source_field") == Seq("traject_test_last"))
    assert(doc("discipline_facet") == Seq("Language & Literature"))
  }

  test("repeated title3_t rule appends 505$r-gated $t values") {
    // structural: title3_t exists where 505s with $r+$t exist; appended
    // values come after the extract_marc values (declaration order)
    val withT = outputs.values.filter(_.contains("title3_t"))
    assert(withT.nonEmpty)
  }

  test("marc_display round-trips as raw ISO 2709") {
    val doc = outputs("bib_2710183")
    val raw = doc("marc_display").head.getBytes("ISO-8859-1")
    val decoded = graft.sources.Iso2709.decodeAll(raw)
    assert(decoded.length == 1)
    assert(decoded.head.fields.exists(f => f.tag == "245"))
  }

  test("empty-ish record maps without crashing and omits empty fields") {
    val rec = Fixtures.first("emptyish_record")
    val out = DemoIndexer.pipeline.mapRecord(spark, rec)
    assert(out.isDefined)
    assert(out.get.contains("id"))
    assert(!out.get.contains("isbn_t"), "empty accumulator fields are omitted")
  }
}
