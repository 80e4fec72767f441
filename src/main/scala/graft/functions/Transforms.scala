package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.marc.TranslationMap

/** The per-field value pipeline (SURVEY.md §2.4): every operator from the
  * reference's Traject::Macros::Transformation
  * (/root/reference/lib/traject/macros/transformation.rb) re-expressed as an
  * `array<string> → array<string>` Column combinator.
  *
  * Everything here stays inside whole-stage codegen: built-in higher-order
  * functions only (transform/filter/flatten/array_*), no UDFs — at 100 TB the
  * hot path must not fall out of Tungsten. Translation maps become literal
  * map columns (embedded in the plan ≈ broadcast), i.e. the map-side
  * broadcast-join the reference's TranslationMap lookup amounts to.
  */
object Transforms {

  type Tx = Column => Column

  /** Compose in declaration order, like chained to_field steps. */
  def chain(ts: Tx*): Tx = c => ts.foldLeft(c)((acc, t) => t(acc))

  /** translation_map(...) — transformation.rb:34-42. Map each value through
    * merged map(s); nil-mapped and missing keys drop; array values flatten;
    * `__default__`/`__passthrough__` honored.
    *
    * Small maps inline as a literal map column (pure codegen). Large maps
    * (the 8k-entry marc_languages) switch to a hash-map UDF: `element_at`
    * on a literal ArrayBasedMapData is a LINEAR scan per value, which
    * dominates wide pipelines at scale, while the captured Scala HashMap is
    * O(1) and ships to executors once per task like a broadcast. */
  def translationMap(tms: TranslationMap*): Tx = {
    val tm = tms.reduce(_ merge _)
    if (tm.entries.size <= 64) {
      val m = typedlit(tm.toFlatMap)
      val defaultExpr: Column => Column = tm.default match {
        case Some(TranslationMap.Passthrough) => v => array(v)
        case Some(d)                          => _ => array(lit(d))
        case None                             => _ => array().cast("array<string>")
      }
      c => flatten(transform(c, v => coalesce(element_at(m, v), defaultExpr(v))))
    } else {
      val u = udf((vals: Seq[String]) =>
        if (vals == null) null else tm.translateArray(vals))
      c => u(c)
    }
  }

  /** transform(proc) — transformation.rb:60-79; fn over each value. */
  def transformValues(f: Column => Column): Tx =
    c => transform(c, f)

  /** default("x") — transformation.rb:85-91. */
  def default(value: String): Tx =
    c => when(size(c) === 0, array(lit(value))).otherwise(c)

  /** first_only — transformation.rb:97-102. */
  val firstOnly: Tx = c => slice(c, 1, 1)

  /** unique — transformation.rb:109-113. */
  val unique: Tx = c => array_distinct(c)

  /** strip — transformation.rb:121-128; unicode-whitespace aware. */
  val strip: Tx =
    c => transform(c, v => regexp_replace(v, """^[\s\p{Z}]+|[\s\p{Z}]+$""", ""))

  /** split(sep) — transformation.rb:134-138; literal separator, flattened.
    * Ruby String#split with a string arg splits on the literal string and
    * drops trailing empties, which java's split(.., -1)/(0) matches with
    * limit 0. */
  def splitValues(sep: String): Tx =
    c => flatten(transform(c, v =>
      split(v, java.util.regex.Pattern.quote(sep), 0))) // limit 0: drop trailing empties like ruby

  /** append / prepend — transformation.rb:141-152. */
  def append(suffix: String): Tx = c => transform(c, v => concat(v, lit(suffix)))
  def prepend(prefix: String): Tx = c => transform(c, v => concat(lit(prefix), v))

  /** gsub(pattern, replace) — transformation.rb:155-159 (global replace). */
  def gsub(pattern: String, replacement: String): Tx =
    c => transform(c, v => regexp_replace(v, pattern, replacement))

  /** delete_if / select — transformation.rb:166-189, regex or set arg. */
  def deleteIfMatches(pattern: String): Tx =
    c => filter(c, v => !v.rlike(pattern))
  def deleteIfIn(values: Seq[String]): Tx = {
    val arr = typedlit(values)
    c => filter(c, v => !array_contains(arr, v))
  }
  def selectMatches(pattern: String): Tx =
    c => filter(c, v => v.rlike(pattern))
  def selectIn(values: Seq[String]): Tx = {
    val arr = typedlit(values)
    c => filter(c, v => array_contains(arr, v))
  }

  /** trim_punctuation — marc21.rb:252-271: the same char-scan kernel as the
    * row-level graft.marc.TrimPunctuation (whose property test pins it to
    * the original regex formulation), exposed as a codegen-bridged scalar
    * expression — three regexp_replace per value was the hottest part of
    * the post-option chain. */
  val trimPunctuation: Tx = c => ArrayKernels.arrayTrimPunctuation(c)

  /** Literal constant field — macros/basic.rb:3-8. */
  def literal(value: String): Column = array(lit(value))

  // ---- output-hash normalization (context.rb:117-129 + indexer defaults) --

  /** Remove SQL NULL elements (the reference compacts nils at add_output
    * unless allow_nil_values). */
  val compactNulls: Tx = c => filter(c, v => v.isNotNull)

  /** Output field normalization: compact nils, optional output-level dedup
    * (allow_duplicate_values default TRUE at output — dedup happens in
    * extract_marc by default instead), empty array → NULL column unless
    * allow_empty_fields. One kernel evaluation per field — see
    * [[graft.functions.ArrayKernels]] for why the column formulation
    * (filter HOF + when/otherwise repeating the field's whole expression
    * tree) was the hottest part of a wide output projection. */
  def normalizeOutput(allowNilValues: Boolean = false,
                      allowDuplicateValues: Boolean = true,
                      allowEmptyFields: Boolean = false): Tx = c => {
    if (allowNilValues && allowDuplicateValues && allowEmptyFields) c
    else ArrayKernels.normalizeOutput(c,
      keepNils = allowNilValues,
      dedup = !allowDuplicateValues,
      emptyToNull = !allowEmptyFields)
  }
}
