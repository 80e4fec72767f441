package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Writing-system profile — the script-consistency signal multilingual
  * curation needs: text whose LETTERS span multiple Unicode scripts is
  * disproportionately spam, spoofing (Cyrillic lookalikes in Latin
  * text), or extraction garbage, and a document's dominant script is
  * the cheap prior for language routing before any n-gram model runs.
  *
  * PINNED: letters only (`Character.isLetter`) — digits, punctuation,
  * and whitespace belong to every script and never vote;
  * `Character.UnicodeScript.of(codepoint)` classifies (COMMON/
  * INHERITED/UNKNOWN are skipped); output struct:
  *   `script` — name of the script with the most letters (ties break
  *   lexicographically for determinism); null when the text has no
  *   classifiable letter;
  *   `mix` — fraction of classified letters NOT in the dominant
  *   script (0.0 = pure; > ~0.05 is the usual mixed-script flag);
  *   0.0 when letterless.
  * Null in → null out. Single pass over code points, no allocation
  * beyond a small count map; rides whole-stage codegen. */
case class ScriptProfileExpression(child: Expression)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ScriptProfileExpression.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "script_profile"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"script_profile expects string, got ${child.dataType.simpleString}")

  override def evalChild(childValue: AnyRef): AnyRef = {
    val utf = childValue.asInstanceOf[UTF8String]
    if (utf == null) return null
    val (script, mix) = ScriptProfileExpression.profile(utf.toString)
    new GenericInternalRow(Array[Any](
      if (script == null) null else UTF8String.fromString(script), mix))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScriptProfileExpression {

  val Schema: StructType = StructType(Seq(
    StructField("script", StringType, nullable = true),
    StructField("mix", DoubleType, nullable = false)))

  def scriptProfile(text: Column): Column =
    ColumnBridge.column(ScriptProfileExpression(ColumnBridge.expression(text)))

  /** (dominant script name | null, non-dominant letter fraction). */
  def profile(s: String): (String, Double) = {
    val counts = new java.util.HashMap[Character.UnicodeScript, Long]()
    var total = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isLetter(cp)) {
        val sc = Character.UnicodeScript.of(cp)
        if (sc != Character.UnicodeScript.COMMON &&
            sc != Character.UnicodeScript.INHERITED &&
            sc != Character.UnicodeScript.UNKNOWN) {
          counts.merge(sc, 1L, (a, b) => a + b)
          total += 1
        }
      }
      i += Character.charCount(cp)
    }
    if (total == 0L) return (null, 0.0)
    var best: Character.UnicodeScript = null
    var bestN = -1L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > bestN ||
        (e.getValue == bestN && e.getKey.name() < best.name())) {
        best = e.getKey; bestN = e.getValue
      }
    }
    (best.name(), (total - bestN).toDouble / total)
  }
}
