package graft.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BatchEntry, MarcExtractBatch, Transforms}
import graft.marc._
import graft.marc.MarcFunctions._
import graft.pipeline.Pipeline

/** The complete demo indexing configuration — a faithful re-expression of
  * the reference's integration config
  * (/root/reference/test/test_support/demo_config.rb) in the Spark-native
  * DSL. Every rule from the original appears here, including the two
  * inline-ruby-block rules (title3_t's 505$r-gated $t harvest and
  * discipline_facet's local-holdings logic), which become `recordFn`
  * escape-hatch functions — the Scala analog of a traject lambda step.
  *
  * This is the "user could switch" proof: read any MARC serialization with
  * MarcIo, run `DemoIndexer.pipeline`, write with Writers/SolrJsonSink.
  */
object DemoIndexer extends graft.pipeline.IndexerConfig {

  /** title3_t second rule: $t of 505 fields that also carry $r
    * (demo_config.rb "mention the same field twice"). */
  private val title3From505r: MarcRecord => Vector[String] = rec =>
    rec.fields.iterator
      .filter(f => f.tag == "505" && f.subfield("r").isDefined)
      .flatMap(_.subfields.collect { case Subfield("t", v) => v })
      .toVector

  /** discipline_facet custom logic: LCC broad category with no default,
    * plus local holdings (991/937) call-number handling, 086 ⇒ Government
    * Publication, uniq, then "Unknown" fill. */
  private val disciplineFacet: MarcRecord => Vector[String] = rec => {
    var acc = Marc21Semantics.lccBroadCategory(rec, default = None)
    val lccMap = TranslationMap.named("lcc_top_level")
    MarcExtractor("991:937").matchingLines(rec).foreach { case (field, _) =>
      val callType = field.subfield("f")
      if (callType.contains("sudoc")) acc :+= "Government Publication"
      else if (callType.isEmpty || callType.contains("lc") ||
        field.subfield("a").exists(a =>
          Marc21Semantics.LccRegex.pattern.matcher(a).matches())) {
        val s = field.subfield("a").map(_.take(1))
        acc :+= s.flatMap(k => lccMap.lookup(k).map(_.mkString(" "))).orNull
      }
    }
    if (MarcExtractor("086a").extract(rec).nonEmpty) acc :+= "Government Publication"
    acc = acc.distinct
    if (acc.filter(_ != null).isEmpty) acc :+= "Unknown"
    acc
  }

  /** Every record-level computation in the config — the 12 semantic macros
    * plus both inline-lambda rules, the ISO-2709 re-serialization and the
    * all-values text harvest — bundled into ONE record materialization per
    * row (MarcRecordBundleExpression). Previously these were 5 separate
    * record-deserializing UDFs. */
  private val recordEntries: Seq[(String, org.apache.spark.sql.types.DataType, MarcRecord => Any)] = {
    import graft.functions.MarcRecordBundleExpression.{Arr, Str}
    MarcFunctions.semanticEntries ++ Seq(
      ("t505r", Arr, title3From505r),
      ("discipline", Arr, disciplineFacet),
      ("marcBin", Str, (rec: MarcRecord) =>
        new String(graft.sources.Iso2709.encode(rec, allowOversized = true), "ISO-8859-1")),
      ("allValues", Arr, (rec: MarcRecord) => MarcFunctions.allMarcValues(rec)))
  }


  /** All pure extract_marc specs fused into ONE fields traversal
    * (MarcExtractBatch); post-options apply per field below. */
  private val extractBatch: Seq[BatchEntry] = Seq(
    BatchEntry("e_id", "001"),
    BatchEntry("e_505art", "505art"),
    BatchEntry("e_publisher", "260abef:261abef:262ab:264ab"),
    BatchEntry("e_isbn", "020a:773z:776z:534z:556z"),
    BatchEntry("e_lccn", "010a"),
    BatchEntry("e_material", "300a", separator = None),
    BatchEntry("e_title_t", "245ak"),
    BatchEntry("e_title1", "245abk"),
    BatchEntry("e_title2", "245nps:130:240abcdefgklmnopqrs:210ab:222ab:242abcehnp:243abcdefgklmnopqrs:246abcdefgnp:247abcdefgnp"),
    BatchEntry("e_title3", "700gklmnoprst:710fgklmnopqrst:711fgklnpst:730abdefgklmnopqrst:740anp:505t:780abcrst:785abcrst:773abrst"),
    BatchEntry("e_series_t", "440a:490a:800abcdt:400abcd:810abcdt:410abcd:811acdeft:411acdef:830adfgklmnoprst:760ast:762ast"),
    BatchEntry("e_author_unstem", "100abcdgqu:110abcdgnu:111acdegjnqu"),
    BatchEntry("e_author2_unstem", "700abcdegqu:710abcdegnu:711acdegjnqu:720a:505r:245c:191abcdegqu"),
    BatchEntry("e_author_display", "100abcdq:110:111"),
    BatchEntry("e_author_facet", "100abcdq:110abcdgnu:111acdenqu:700abcdq:710abcdgnu:711acdenqu"),
    BatchEntry("e_subject_t", "600:610:611:630:650:651avxyz:653aa:654abcvyz:655abcvxyz:690abcdxyz:691abxyz:692abxyz:693abxyz:656akvxyz:657avxyz:652axyz:658abcd"),
    BatchEntry("e_subject_topic", "600abcdtq:610abt:610x:611abt:611x:630aa:630x:648a:648x:650aa:650x:651a:651x:691a:691x:653aa:654ab:656aa:690a:690x"),
    BatchEntry("e_published", "260a"),
    BatchEntry("e_issn", "022a:022l:022y:773x:774x:776x", separator = None),
    BatchEntry("e_issn_related", "490x:440x:800x:400x:410x:411x:810x:811x:830x:700x:710x:711x:730x:780x:785x:777x:543x:760x:762x:765x:767x:770x:772x:775x:786x:787x", separator = None),
    BatchEntry("e_other_number", "024a:028a"))

  private def ext(name: String, opts: ExtractMarc.Options = ExtractMarc.Options()): Column => Column =
    _ => applyExtractOptions(col("_ext").getField(name), opts)

  def pipeline: Pipeline = Pipeline.builder
    // one record materialization for ALL record-level rules (clipboard
    // column); fields below select from the bundle struct
    .eachRecord("_sem", MarcFunctions.recordBundle(recordEntries))
    .eachRecord("_ext", rec => MarcExtractBatch.extract(rec, extractBatch))
    .toField("id", ext("e_id", ExtractMarc.Options(first = true)),
      Transforms.prepend("bib_"))
    .toField("source_field", _ => Transforms.literal("traject_test_last"))
    .toField("marc_display",
      _ => filter(array(col("_sem").getField("marcBin")), v => v.isNotNull))
    .toField("text", _ => col("_sem").getField("allValues"))
    .toField("text_extra_boost_t", ext("e_505art"))
    .toField("publisher_t", ext("e_publisher"))
    .toField("language_facet", _ => col("_sem").getField("languages"))
    .toField("format", _ => col("_sem").getField("formats"))
    .toField("isbn_t", ext("e_isbn"))
    .toField("lccn", ext("e_lccn"))
    .toField("material_type_display",
      ext("e_material", ExtractMarc.Options(separator = None, trimPunctuation = true)))
    .toField("title_t", ext("e_title_t"))
    .toField("title1_t", ext("e_title1"))
    .toField("title2_t", ext("e_title2"))
    .toField("title3_t", ext("e_title3"))
    .toField("title3_t", _ => col("_sem").getField("t505r")) // same field twice: values append
    .toField("title_display",
      ext("e_title1", ExtractMarc.Options(trimPunctuation = true, first = true)))
    .toField("title_sort", _ =>
      filter(array(col("_sem").getField("sortableTitle")), v => v.isNotNull))
    .toField("title_series_t", ext("e_series_t"))
    .toField("series_facet", _ => col("_sem").getField("seriesFacet"))
    .toField("author_unstem", ext("e_author_unstem"))
    .toField("author2_unstem", ext("e_author2_unstem"))
    .toField("author_display", ext("e_author_display"))
    .toField("author_sort", _ => array(col("_sem").getField("sortableAuthor")))
    .toField("author_facet",
      ext("e_author_facet", ExtractMarc.Options(trimPunctuation = true)))
    .toField("subject_t", ext("e_subject_t"))
    .toField("subject_topic_facet",
      ext("e_subject_topic", ExtractMarc.Options(trimPunctuation = true)),
      upcaseFirstLetter)
    .toField("subject_geo_facet", _ => col("_sem").getField("geoFacet"))
    .toField("subject_era_facet", _ => col("_sem").getField("eraFacet"))
    .toField("published_display",
      ext("e_published", ExtractMarc.Options(trimPunctuation = true)))
    .toField("pub_date", publicationDateAsString)
    .toField("discipline_facet", _ => col("_sem").getField("discipline"))
    .toField("instrumentation_facet", _ => col("_sem").getField("instrumentation"))
    .toField("instrumentation_code_unstem", _ => col("_sem").getField("instrumentCodes"))
    .toField("issn", ext("e_issn", ExtractMarc.Options(separator = None)))
    .toField("issn_related", ext("e_issn_related", ExtractMarc.Options(separator = None)))
    .toField("oclcnum_t", _ => col("_sem").getField("oclcnum"))
    .toField("other_number_unstem", ext("e_other_number"))

  /** MeSH fixup from the reference's subject_topic_facet block: upcase a
    * downcased first letter. */
  private def upcaseFirstLetter: Column => Column =
    c => transform(c, v =>
      concat(upper(substring(v, 1, 1)), substring(v, 2, Int.MaxValue)))

  /** pub_date as array<string> for the uniform output-document shape. */
  private def publicationDateAsString: Column => Column =
    _ => filter(array(col("_sem").getField("publicationDate").cast("string")),
      v => v.isNotNull)

  /** End-to-end run: record-struct frame in, output documents out. */
  def index(df: DataFrame): DataFrame = pipeline.run(df)
}
