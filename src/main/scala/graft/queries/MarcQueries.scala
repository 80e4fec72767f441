package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.marc._
import graft.pipeline.Pipeline
import graft.functions.Transforms

/** MARC operator surface (SURVEY.md §2.3-§2.4) made driver-checkable:
  * deterministic MARC records are synthesized from the `documents` table,
  * run through the real extraction pipeline, and the DuckDB oracle
  * recomputes the expected output *independently* from the raw columns —
  * if the spec parser / extractor / transform chain is wrong, the hashes
  * diverge.
  */
object MarcQueries extends QueryPack {

  /** documents.lang (ISO 639-1) → MARC 3-char code used in synthesized 008. */
  private val lang3 = Map("en" -> "eng", "es" -> "spa", "fr" -> "fre",
                          "de" -> "ger", "zh" -> "chi")

  /** Synthesize one MarcRecord per document row:
    *  - 001  = "doc<id>"
    *  - 008  = 35 filler bytes then the 3-char language code (bytes 35-37)
    *  - 245  |1 0| $a = first 5 words of text, $b = "by <source> /", $c = source
    *  - 650  $a = "Subject <source>"
    *  - 880  (every 5th doc) $6 = "245-01", $a = reversed $a  — exercises the
    *    alternate-script linkage.
    */
  def docsAsMarc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import MarcFunctions.marcRecordEncoder
    implicit val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong, marcRecordEncoder)
    // plain read: MARC synthesis + extraction is a narrow map whose per-row
    // cost is far below the flat price of a repartition shuffle (measured
    // ~+0.65 s per query at sf0.1); at scale the scan provides parallelism
    Tables.documents(s, dir)
      .select($"doc_id", $"text", $"lang", $"source")
      .as[(Long, String, String, String)]
      .map { case (id, text, lang, source) =>
        val words = text.split(" ")
        val a = words.take(5).mkString(" ")
        val year = 1900 + (id % 120).toInt
        // structured 008: date-entered(6) + type 's' + date1 + blank date2 +
        // filler to byte 35 + language code (bytes 35-37)
        val f008 = "000000" + "s" + year.toString + "    " + (" " * 20) +
          lang3.getOrElse(lang, "und") + "  "
        val base = Vector(
          MarcField.control("001", s"doc$id"),
          MarcField.control("008", f008),
          MarcField.data("245", "1", (id % 4).toString,
            "a" -> a, "b" -> s"by $source /", "c" -> source),
          MarcField.data("650", " ", "0",
            "a" -> s"Subject $source", "x" -> "History", "z" -> "Europe")) ++
          (if (id % 2 == 0)
            Vector(MarcField.data("035", " ", " ", "a" -> s"(OCoLC)${100000000L + id}"))
          else
            Vector(MarcField.data("035", " ", " ", "a" -> "notanoclc"))) ++
          (if (id % 7 == 0) Vector(MarcField.data("502", " ", " ", "a" -> "Thesis note"))
          else Vector.empty)
        val fields =
          if (id % 5 == 0)
            base :+ MarcField.data("880", "1", "0", "6" -> "245-01", "a" -> a.reverse)
          else base
        (id, MarcRecord("00000cam a2200000 a 4500", fields))
      }
      .toDF("doc_id", "record")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // spec-driven subfield extraction + join + trim_punctuation
    "m01_marc_title" -> ((s, d) => {
      Pipeline.builder
        .toField("title_arr",
          MarcFunctions.marcExtract("245ab",
            ExtractMarc.Options(trimPunctuation = true, first = true, alternateScript = AlternateScript.Exclude)))
        .run(docsAsMarc(s, d), keep = Seq("doc_id"))
        .select(col("doc_id"), array_join(col("title_arr"), "|").as("title"))
        .orderBy("doc_id")
    }),

    // control-field extraction, first_only
    "m02_marc_id" -> ((s, d) => {
      Pipeline.builder
        .toField("id_arr", MarcFunctions.marcExtract("001", ExtractMarc.Options(first = true)))
        .run(docsAsMarc(s, d), keep = Seq("doc_id"))
        .select(col("doc_id"), array_join(col("id_arr"), "|").as("rec_id"))
        .orderBy("doc_id")
    }),

    // byte-slice extraction (008[35-37]) + bundled translation map
    "m03_marc_language" -> ((s, d) => {
      Pipeline.builder
        .toField("lang_arr",
          MarcFunctions.marcExtract("008[35-37]"),
          Transforms.translationMap(TranslationMap.named("marc_languages")))
        .run(docsAsMarc(s, d), keep = Seq("doc_id"))
        .select(col("doc_id"), array_join(col("lang_arr"), "|").as("language"))
        .orderBy("doc_id")
    }),

    // 880 alternate-script linkage: base + linked values
    "m04_marc_alt_script" -> ((s, d) => {
      Pipeline.builder
        .toField("t_arr", MarcFunctions.marcExtract("245a",
          ExtractMarc.Options(allowDuplicates = true)))
        .run(docsAsMarc(s, d), keep = Seq("doc_id"))
        .select(col("doc_id"), array_join(col("t_arr"), "|").as("titles"))
        .orderBy("doc_id")
    }),

    // whole-record text aggregation (extract_all_marc_values)
    "m05_marc_all_values" -> ((s, d) => {
      Pipeline.builder
        .toField("all_arr", MarcFunctions.extractAllMarcValues())
        .run(docsAsMarc(s, d), keep = Seq("doc_id"))
        .select(col("doc_id"), array_join(col("all_arr"), " ; ").as("all_values"))
        .orderBy("doc_id")
    }),

    // publication-date state machine over synthesized 008 (date_type 's')
    "m07_marc_pub_date" -> ((s, d) => {
      docsAsMarc(s, d)
        .select(col("doc_id"),
          MarcFunctions.marcPublicationDate()(col("record")).cast("long").as("pub_year"))
        .orderBy("doc_id")
    }),

    // non-filing-character stripping driven by indicator 2
    "m08_marc_filing_version" -> ((s, d) => {
      Pipeline.builder
        .toField("fv", MarcFunctions.marcFilingVersion("245ab"))
        .run(docsAsMarc(s, d), keep = Seq("doc_id"))
        .select(col("doc_id"), array_join(col("fv"), "|").as("filing_title"))
        .orderBy("doc_id")
    }),

    // format classifier vocabulary (genre + print + thesis override)
    "m09_marc_formats" -> ((s, d) => {
      Pipeline.builder
        .toField("fmt", MarcFunctions.marcFormats)
        .run(docsAsMarc(s, d), keep = Seq("doc_id"))
        .select(col("doc_id"), array_join(col("fmt"), "|").as("formats"))
        .orderBy("doc_id")
    }),

    // OCLC-number prefix recognition + digit extraction
    "m10_marc_oclcnum" -> ((s, d) => {
      Pipeline.builder
        .toField("o", MarcFunctions.marcOclcnum)
        .run(docsAsMarc(s, d), keep = Seq("doc_id"))
        // empty field → NULL after output normalization; surface as '' here
        .select(col("doc_id"), coalesce(array_join(col("o"), "|"), lit("")).as("oclc"))
        .orderBy("doc_id")
    }),

    // pre-coordinated LCSH heading assembly (subdivision separators)
    "m11_marc_lcsh" -> ((s, d) => {
      Pipeline.builder
        .toField("h", MarcFunctions.marcLcshFormatted)
        .run(docsAsMarc(s, d), keep = Seq("doc_id"))
        .select(col("doc_id"), array_join(col("h"), "|").as("lcsh"))
        .orderBy("doc_id")
    }),

    // full binary round trip through the splittable ISO-2709 DSv2: encode
    // the synthesized records to .mrc part files, read them back with
    // format("marc"), extract ids — proves source + sink + codec end-to-end
    "m12_marc_binary_roundtrip" -> ((s, d) => {
      import MarcFunctions.marcRecordEncoder
      val recs = docsAsMarc(s, d).select("record.*").as[MarcRecord](marcRecordEncoder)
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_marc_rt_${d.replaceAll("[^A-Za-z0-9]", "_")}").getAbsolutePath
      graft.sources.MarcIo.writeBinary(recs.repartition(4), dir)
      Pipeline.builder
        .toField("id_arr", MarcFunctions.marcExtract("001", ExtractMarc.Options(first = true)))
        .run(graft.sources.MarcIo.readBinary(s, dir).toDF()
          .select(struct(col("leader"), col("fields")).as("record")))
        .select(array_join(col("id_arr"), "|").as("rec_id"))
        .orderBy(expr("CAST(substr(rec_id, 4) AS BIGINT)"))
    }),

    // value-pipeline ops end-to-end: split → translate → unique → default,
    // over the packed language subfield pattern (041a-style)
    "m06_marc_value_pipeline" -> ((s, d) => {
      Pipeline.builder
        .toField("langs",
          MarcFunctions.marcExtract("008[35-37]"),
          Transforms.append(",xxx"),
          Transforms.splitValues(","),
          Transforms.translationMap(
            TranslationMap.named("marc_languages"),
            TranslationMap.fromRaw(Map("xxx" -> null))),
          Transforms.unique,
          Transforms.default("Unknown"))
        .run(docsAsMarc(s, d), keep = Seq("doc_id"))
        .select(col("doc_id"), array_join(col("langs"), "|").as("language"))
        .orderBy("doc_id")
    })
  )

  /** Language CASE used by several oracles. */
  private val langCase =
    """CASE lang WHEN 'en' THEN 'English' WHEN 'es' THEN 'Spanish'
                 WHEN 'fr' THEN 'French' WHEN 'de' THEN 'German'
                 WHEN 'zh' THEN 'Chinese' ELSE 'Unknown' END"""

  private val firstFive =
    "array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')"

  def oracleSql: Map[String, String] = Map(
    "m01_marc_title" ->
      s"""SELECT doc_id, trim($firstFive || ' by ' || source) AS title
          FROM documents ORDER BY doc_id""",

    "m02_marc_id" ->
      "SELECT doc_id, 'doc' || CAST(doc_id AS VARCHAR) AS rec_id FROM documents ORDER BY doc_id",

    "m03_marc_language" ->
      s"SELECT doc_id, $langCase AS language FROM documents ORDER BY doc_id",

    "m04_marc_alt_script" ->
      s"""SELECT doc_id,
          CASE WHEN doc_id % 5 = 0 THEN $firstFive || '|' || reverse($firstFive)
               ELSE $firstFive END AS titles
          FROM documents ORDER BY doc_id""",

    // note: the 035 field sits below extract_all's default "100".."899" tag
    // range, so it is rightly absent here
    "m05_marc_all_values" ->
      s"""SELECT doc_id,
          $firstFive || ' by ' || source || ' / ' || source
            || ' ; Subject ' || source || ' History Europe'
            || CASE WHEN doc_id % 7 = 0 THEN ' ; Thesis note' ELSE '' END
            || CASE WHEN doc_id % 5 = 0
                    THEN ' ; 245-01 ' || reverse($firstFive)
                    ELSE '' END AS all_values
          FROM documents ORDER BY doc_id""",

    "m07_marc_pub_date" ->
      "SELECT doc_id, 1900 + doc_id % 120 AS pub_year FROM documents ORDER BY doc_id",

    // alternate-script 880s are included by default, contributing the linked
    // (reversed) title as a second value on every 5th doc
    "m08_marc_filing_version" ->
      s"""SELECT doc_id,
          substr($firstFive || ' by ' || source || ' /',
                 1 + CAST(doc_id % 4 AS INTEGER))
          || CASE WHEN doc_id % 5 = 0 THEN '|' || reverse($firstFive)
                  ELSE '' END AS filing_title
          FROM documents ORDER BY doc_id""",

    "m09_marc_formats" ->
      """SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN 'Print|Dissertation/Thesis'
              ELSE 'Book|Print' END AS formats
         FROM documents ORDER BY doc_id""",

    "m10_marc_oclcnum" ->
      """SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN CAST(100000000 + doc_id AS VARCHAR)
              ELSE '' END AS oclc
         FROM documents ORDER BY doc_id""",

    "m11_marc_lcsh" ->
      "SELECT doc_id, 'Subject ' || source || ' — History — Europe' AS lcsh FROM documents ORDER BY doc_id",

    "m12_marc_binary_roundtrip" ->
      "SELECT 'doc' || CAST(doc_id AS VARCHAR) AS rec_id FROM documents ORDER BY doc_id",

    "m06_marc_value_pipeline" ->
      s"SELECT doc_id, $langCase AS language FROM documents ORDER BY doc_id"
  )
}
