package graft.functions

import graft.SparkSpec
import graft.marc._
import org.apache.spark.sql.functions.col

/** Differential test: the native MarcExtractExpression must agree with the
  * row-level extractor (itself golden-tested against the reference) on
  * every record and spec shape. */
class MarcExtractExpressionSpec extends SparkSpec {

  private lazy val corpus =
    Fixtures.records("test_data.utf8") ++
      Seq(Fixtures.first("manufacturing_consent"),
        Fixtures.first("hebrew880s"),
        Fixtures.first("880_with_no_6.utf8"),
        Fixtures.first("emptyish_record"),
        Fixtures.first("245_no_ab"))

  private val specs = Seq(
    "001", "008[5]", "008[7-10]", "245ab", "245ba", "020a", "020aa",
    "100:110:111", "600ax", "700abcdef:856|*2|:505|1*|:245ba", "999zz")

  test("expression matches row-level extractor for every (record, spec, mode)") {
    val df = MarcSource.fromRecords(spark, corpus)
    for {
      spec <- specs
      (alt, name) <- Seq(
        (AlternateScript.Include, "include"),
        (AlternateScript.Exclude, "exclude"),
        (AlternateScript.Only, "only"))
      sep <- Seq(Some(" "), None)
    } {
      val got = df.select(
          MarcExtractExpression.extract(col("record"), spec, sep, alt).as("v"))
        .collect().map(r => Option(r.getSeq[String](0)).map(_.toVector).getOrElse(Vector.empty))
      val want = corpus.map(MarcExtractor(MarcSpec.parse(spec), sep, alt).extract)
      assert(got.toVector == want,
        s"mismatch for spec=$spec alt=$name sep=$sep")
    }
  }

  test("post-option composition matches ExtractMarc row semantics") {
    val df = MarcSource.fromRecords(spark, corpus)
    val opts = Seq(
      ExtractMarc.Options(first = true),
      ExtractMarc.Options(trimPunctuation = true),
      ExtractMarc.Options(allowDuplicates = true, separator = None),
      ExtractMarc.Options(default = Some("nope")),
      ExtractMarc.Options(translationMap =
        Some(TranslationMap.fromPairs("2710183" -> "MC", "DLC" -> "LoC"))))
    for (o <- opts; spec <- Seq("001", "040ad", "245ab")) {
      val got = df.select(MarcFunctions.marcExtract(spec, o)(col("record")).as("v"))
        .collect().map(r => Option(r.getSeq[String](0)).map(_.toVector).getOrElse(Vector.empty))
      val want = corpus.map(ExtractMarc.compile(spec, o))
      assert(got.toVector == want.map(_.filter(_ != null)) || got.toVector == want,
        s"mismatch for spec=$spec opts=$o")
    }
  }
}
