package graft.marc

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-facing MARC extraction surface.
  *
  * The extractor is compiled once at plan-build time (spec parse + tag-set
  * precompute) and captured in the UDF closure — the per-record work is a
  * single pass over the fields array. This is the v1 (UDF) form of the
  * `marc_extract` custom expression from SURVEY.md §4; the closure itself is
  * pure and cheap, and the input is the record struct so nested-schema
  * pruning still applies to the parquet scan underneath.
  */
object MarcFunctions {

  implicit val marcRecordEncoder: Encoder[MarcRecord] = Encoders.product[MarcRecord]

  /** marc_extract(spec, opts) over a MarcRecord struct column —
    * extract_marc macro semantics incl. post-options
    * (/root/reference/lib/traject/macros/marc21.rb:62-140).
    *
    * Extraction is the native `MarcExtractExpression` (single buffer
    * traversal, no record deserialization); the post-options compose as
    * column ops in the reference's order: first → translation_map →
    * trim_punctuation → dedup (ON by default) → default. */
  def marcExtract(spec: String, opts: ExtractMarc.Options = ExtractMarc.Options()): Column => Column = {
    import graft.functions.MarcExtractExpression
    rec => applyExtractOptions(
      MarcExtractExpression.extract(rec, spec, opts.separator, opts.alternateScript), opts)
  }

  /** The extract_marc post-option chain as column ops (reference order:
    * first → translation_map → trim_punctuation → dedup → default) —
    * applied to any already-extracted array column (e.g. a batch field). */
  def applyExtractOptions(extracted: Column, opts: ExtractMarc.Options): Column = {
    import graft.functions.Transforms
    var c = extracted
    if (opts.first) c = graft.functions.ArrayKernels.headNonNull(c) // Array(acc[0]) drops a nil head
    opts.translationMap.foreach(tm => c = Transforms.translationMap(tm)(c))
    if (opts.trimPunctuation) c = Transforms.trimPunctuation(c)
    if (!opts.allowDuplicates) c = array_distinct(c)
    opts.default.foreach(d => c = Transforms.default(d)(c))
    c
  }

  /** The UDF formulation (kept for differential testing of the native
    * expression against the row-level extractor). */
  def marcExtractUdf(spec: String, opts: ExtractMarc.Options = ExtractMarc.Options()): Column => Column = {
    val compiled = ExtractMarc.compile(spec, opts)
    val u = udf((rec: MarcRecord) => if (rec == null) Vector.empty[String] else compiled(rec))
    rec => u(rec)
  }

  /** extract_all_marc_values(from, to, separator) — marc21.rb:213-238:
    * all subfield text of data fields with from <= tag <= to, one joined
    * string per field (or flattened when separator is None). */
  def allMarcValues(rec: MarcRecord, from: String = "100", to: String = "899",
                    separator: Option[String] = Some(" ")): Vector[String] =
    rec.fields.iterator
      .filter(f => !f.isControl && f.tag >= from && f.tag <= to)
      .map(_.subfieldValues)
      .filter(_.nonEmpty)
      .flatMap(vals => separator match {
        case Some(sep) => Seq(vals.mkString(sep))
        case None      => vals
      }).toVector

  def extractAllMarcValues(from: String = "100", to: String = "899",
                           separator: Option[String] = Some(" ")): Column => Column = {
    val u = udf((rec: MarcRecord) =>
      if (rec == null) Vector.empty[String] else allMarcValues(rec, from, to, separator))
    rec => u(rec)
  }

  /** serialized_marc(format=json) — marc21.rb:174-198; the whole record
    * re-serialized as marc-in-json. */
  def serializedMarcJson: Column => Column = {
    val u = udf((rec: MarcRecord) => if (rec == null) null else MarcJson.write(rec))
    rec => array(u(rec))
  }

  /** serialized_marc(format=binary): ISO 2709, Base64-encoded by default for
    * a Solr binary field (marc21.rb:186-190). */
  def serializedMarcBinary(binaryEscape: Boolean = true,
                           allowOversized: Boolean = false): Column => Column = {
    val u = udf((rec: MarcRecord) =>
      if (rec == null) null
      else {
        val bytes = graft.sources.Iso2709.encode(rec, allowOversized)
        if (binaryEscape) java.util.Base64.getMimeEncoder.encodeToString(bytes)
        else new String(bytes, "ISO-8859-1")
      })
    rec => array(u(rec))
  }

  /** serialized_marc(format=xml): MARCXML (marc21.rb:191-192). */
  def serializedMarcXml: Column => Column = {
    val u = udf((rec: MarcRecord) =>
      if (rec == null) null else graft.sources.MarcXmlWriter.encode(rec))
    rec => array(u(rec))
  }

  /** Record-level skip predicate helper: true when extraction is empty —
    * building block for skip! behavior (context.rb:35-43). */
  def extractIsEmpty(spec: String): Column => Column = {
    val ex = marcExtract(spec)
    rec => size(ex(rec)) === 0
  }

  // ---- §2.5 semantic operators as typed UDFs -----------------------------

  /** Lift any pure record function into a Column op (compiled once, codegen
    * around the call; the record pass itself is single-traversal). */
  def recordFn(f: MarcRecord => Vector[String]): Column => Column = {
    val u = udf((rec: MarcRecord) => if (rec == null) Vector.empty[String] else f(rec))
    rec => u(rec)
  }

  def marcPublicationDate(tolerance: Int = 15, minYear: Int = 500,
                          maxYear: Int = java.time.Year.now.getValue + 6): Column => Column = {
    val u = udf((rec: MarcRecord) =>
      if (rec == null) None
      else Marc21Semantics.publicationDate(rec, tolerance, minYear, maxYear))
    rec => u(rec)
  }

  def marcFormats: Column => Column = recordFn(MarcFormatClassifier.formats)
  def marcOclcnum: Column => Column = recordFn(Marc21Semantics.oclcnum(_))
  def marcLanguages: Column => Column = recordFn(Marc21Semantics.languages(_))
  def marcGeoFacet: Column => Column = recordFn(Marc21Semantics.geoFacet(_))
  def marcEraFacet: Column => Column = recordFn(Marc21Semantics.eraFacet(_))
  def marcLcshFormatted: Column => Column = recordFn(Marc21Semantics.lcshFormatted(_))
  def marcSeriesFacet: Column => Column = recordFn(Marc21Semantics.seriesFacet(_))
  def marcInstrumentCodes: Column => Column = recordFn(Marc21Semantics.instrumentCodesNormalized)
  def marcLccBroadCategory: Column => Column = recordFn(Marc21Semantics.lccBroadCategory(_))

  def marcFilingVersion(spec: String, includeOriginal: Boolean = false): Column => Column =
    recordFn(Marc21Semantics.extractFilingVersion(_, spec, includeOriginal))

  def marcSortableAuthor: Column => Column = {
    val u = udf((rec: MarcRecord) =>
      if (rec == null) null else Marc21Semantics.sortableAuthor(rec))
    rec => array(u(rec))
  }

  /** All semantic macros computed in ONE record pass and ONE record
    * materialization — each `marc*` UDF deserializes the record struct
    * independently, so a config using ten of them pays ten
    * deserializations per record; the bundle (a native
    * `MarcRecordBundleExpression`) pays one and writes its results
    * straight into the output row. Select individual outputs with
    * `.getField`. Extend with extra entries (user lambdas, serializations)
    * via `recordBundle(semanticEntries ++ ...)`. */
  val semanticEntries: Seq[(String, org.apache.spark.sql.types.DataType, MarcRecord => Any)] = {
    import graft.functions.MarcRecordBundleExpression.{Arr, Int32, Str}
    Seq(
      ("languages", Arr, Marc21Semantics.languages(_)),
      ("formats", Arr, MarcFormatClassifier.formats(_)),
      ("sortableAuthor", Str, Marc21Semantics.sortableAuthor(_)),
      ("sortableTitle", Str, Marc21Semantics.sortableTitle(_)),
      ("geoFacet", Arr, Marc21Semantics.geoFacet(_)),
      ("eraFacet", Arr, Marc21Semantics.eraFacet(_)),
      ("seriesFacet", Arr, Marc21Semantics.seriesFacet(_)),
      ("oclcnum", Arr, Marc21Semantics.oclcnum(_)),
      ("instrumentation", Arr, Marc21Semantics.instrumentationHumanized(_).filter(_ != null)),
      ("instrumentCodes", Arr, Marc21Semantics.instrumentCodesNormalized(_)),
      ("publicationDate", Int32, Marc21Semantics.publicationDate(_)),
      ("lcsh", Arr, Marc21Semantics.lcshFormatted(_)))
  }

  /** One-materialization bundle of arbitrary record functions. */
  def recordBundle(entries: Seq[(String, org.apache.spark.sql.types.DataType, MarcRecord => Any)]): Column => Column =
    rec => graft.functions.MarcRecordBundleExpression.bundle(rec, entries)

  def semanticBundle: Column => Column = recordBundle(semanticEntries)

  def marcSortableTitle: Column => Column = {
    val u = udf((rec: MarcRecord) =>
      if (rec == null) None else Marc21Semantics.sortableTitle(rec))
    // array-shaped like every to_field value; nil (record bailed) → empty
    rec => filter(array(u(rec)), v => v.isNotNull)
  }
}

/** Readers for MARC serializations into Dataset[MarcRecord]
  * (SURVEY.md §2.1).
  *
  * marc-in-json NDJ is the workhorse: read as text (splittable, .gz
  * transparent) and parse per-line with the Jackson codec — a narrow
  * map, no shuffle, scales linearly with input splits. Bad lines are
  * dropped like the reference's NDJReader (logs+skips, ndj_reader.rb:30-36);
  * count them via the `marc_json_corrupt` accumulator if needed.
  */
object MarcSource {
  import MarcFunctions.marcRecordEncoder

  /** Read newline-delimited marc-in-json (optionally .gz). */
  def readJson(spark: SparkSession, path: String): Dataset[MarcRecord] = {
    import spark.implicits._
    spark.read.textFile(path)
      .flatMap(line => MarcJson.parseOption(line))
  }

  /** A DataFrame with the record as a single struct column `record`,
    * the shape the pipeline DSL consumes. */
  def readJsonAsColumn(spark: SparkSession, path: String): DataFrame =
    readJson(spark, path).toDF().select(struct(col("leader"), col("fields")).as("record"))

  /** Wrap an in-memory collection (tests, map_record-style entry points). */
  def fromRecords(spark: SparkSession, recs: Seq[MarcRecord]): DataFrame = {
    import spark.implicits._
    recs.toDS().toDF().select(struct(col("leader"), col("fields")).as("record"))
  }
}
