package graft.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Transforms
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
object DemoIndexer {

  /** title3_t second rule: $t of 505 fields that also carry $r
    * (demo_config.rb "mention the same field twice"). */
  private val title3From505r: Column => Column = recordFn { rec =>
    rec.fields.iterator
      .filter(f => f.tag == "505" && f.subfield("r").isDefined)
      .flatMap(_.subfields.collect { case Subfield("t", v) => v })
      .toVector
  }

  /** discipline_facet custom logic: LCC broad category with no default,
    * plus local holdings (991/937) call-number handling, 086 ⇒ Government
    * Publication, uniq, then "Unknown" fill. */
  private val disciplineFacet: Column => Column = recordFn { rec =>
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

  def pipeline: Pipeline = Pipeline.builder
    // one record pass for ALL semantic macros (clipboard column); fields
    // below select from the bundle struct
    .eachRecord("_sem", semanticBundle)
    .toField("id", marcExtract("001", ExtractMarc.Options(first = true)),
      Transforms.prepend("bib_"))
    .toField("source_field", _ => Transforms.literal("traject_test_last"))
    .toField("marc_display",
      serializedMarcBinary(binaryEscape = false, allowOversized = true))
    .toField("text", extractAllMarcValues())
    .toField("text_extra_boost_t", marcExtract("505art"))
    .toField("publisher_t", marcExtract("260abef:261abef:262ab:264ab"))
    .toField("language_facet", _ => col("_sem").getField("languages"))
    .toField("format", _ => col("_sem").getField("formats"))
    .toField("isbn_t", marcExtract("020a:773z:776z:534z:556z"))
    .toField("lccn", marcExtract("010a"))
    .toField("material_type_display",
      marcExtract("300a", ExtractMarc.Options(separator = None, trimPunctuation = true)))
    .toField("title_t", marcExtract("245ak"))
    .toField("title1_t", marcExtract("245abk"))
    .toField("title2_t", marcExtract("245nps:130:240abcdefgklmnopqrs:210ab:222ab:242abcehnp:243abcdefgklmnopqrs:246abcdefgnp:247abcdefgnp"))
    .toField("title3_t", marcExtract("700gklmnoprst:710fgklmnopqrst:711fgklnpst:730abdefgklmnopqrst:740anp:505t:780abcrst:785abcrst:773abrst"))
    .toField("title3_t", title3From505r) // same field twice: values append
    .toField("title_display",
      marcExtract("245abk", ExtractMarc.Options(trimPunctuation = true, first = true)))
    .toField("title_sort", _ =>
      filter(array(col("_sem").getField("sortableTitle")), v => v.isNotNull))
    .toField("title_series_t", marcExtract("440a:490a:800abcdt:400abcd:810abcdt:410abcd:811acdeft:411acdef:830adfgklmnoprst:760ast:762ast"))
    .toField("series_facet", _ => col("_sem").getField("seriesFacet"))
    .toField("author_unstem", marcExtract("100abcdgqu:110abcdgnu:111acdegjnqu"))
    .toField("author2_unstem", marcExtract("700abcdegqu:710abcdegnu:711acdegjnqu:720a:505r:245c:191abcdegqu"))
    .toField("author_display", marcExtract("100abcdq:110:111"))
    .toField("author_sort", _ => array(col("_sem").getField("sortableAuthor")))
    .toField("author_facet",
      marcExtract("100abcdq:110abcdgnu:111acdenqu:700abcdq:710abcdgnu:711acdenqu",
        ExtractMarc.Options(trimPunctuation = true)))
    .toField("subject_t", marcExtract("600:610:611:630:650:651avxyz:653aa:654abcvyz:655abcvxyz:690abcdxyz:691abxyz:692abxyz:693abxyz:656akvxyz:657avxyz:652axyz:658abcd"))
    .toField("subject_topic_facet",
      marcExtract("600abcdtq:610abt:610x:611abt:611x:630aa:630x:648a:648x:650aa:650x:651a:651x:691a:691x:653aa:654ab:656aa:690a:690x",
        ExtractMarc.Options(trimPunctuation = true)),
      upcaseFirstLetter)
    .toField("subject_geo_facet", _ => col("_sem").getField("geoFacet"))
    .toField("subject_era_facet", _ => col("_sem").getField("eraFacet"))
    .toField("published_display",
      marcExtract("260a", ExtractMarc.Options(trimPunctuation = true)))
    .toField("pub_date", publicationDateAsString)
    .toField("discipline_facet", disciplineFacet)
    .toField("instrumentation_facet", _ => col("_sem").getField("instrumentation"))
    .toField("instrumentation_code_unstem", _ => col("_sem").getField("instrumentCodes"))
    .toField("issn", marcExtract("022a:022l:022y:773x:774x:776x", ExtractMarc.Options(separator = None)))
    .toField("issn_related", marcExtract("490x:440x:800x:400x:410x:411x:810x:811x:830x:700x:710x:711x:730x:780x:785x:777x:543x:760x:762x:765x:767x:770x:772x:775x:786x:787x",
      ExtractMarc.Options(separator = None)))
    .toField("oclcnum_t", _ => col("_sem").getField("oclcnum"))
    .toField("other_number_unstem", marcExtract("024a:028a"))

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
