package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Marker-token language ID in one pass: tokenize, count hits per language
  * via a token→language hash map (marker sets are pairwise disjoint),
  * argmax with ties to the earlier language, "und" on zero hits.
  *
  * The column formulation ran one interpreted filter() HOF per language
  * AND repeated every score expression inside the greatest/when chain —
  * fallback evaluation re-ran each count several times per row. */
case class LangIdExpression(child: Expression, markers: Seq[(String, Seq[String])])
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "lang_id"

  @transient private lazy val langs: Array[UTF8String] =
    markers.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val tokenLang: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    markers.zipWithIndex.foreach { case ((_, toks), i) =>
      toks.foreach(t => m.put(t, i))
    }
    m
  }
  @transient private lazy val und = UTF8String.fromString("und")

  override def evalChild(childValue: AnyRef): AnyRef = {
    val utf = childValue.asInstanceOf[UTF8String]
    if (utf == null) return null
    // trim(col) strips ' ' only; \s+ split matches the column formulation
    val text = utf.toString
    var from = 0
    var until = text.length
    while (from < until && text.charAt(from) == ' ') from += 1
    while (until > from && text.charAt(until - 1) == ' ') until -= 1
    // exactly java-regex \s, not the broader Character.isWhitespace
    @inline def isWs(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    val counts = new Array[Int](langs.length)
    var i = from
    while (i < until) {
      // token = maximal run of non-whitespace
      while (i < until && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < until && !isWs(text.charAt(i))) i += 1
      if (i > start) {
        val idx = tokenLang.get(text.substring(start, i))
        if (idx != null) counts(idx.intValue()) += 1
      }
    }
    var best = 0
    var bestIdx = -1
    i = 0
    while (i < counts.length) {
      if (counts(i) > best) { best = counts(i); bestIdx = i }
      i += 1
    }
    if (bestIdx < 0) und else langs(bestIdx)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdExpression {
  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column =
    ColumnBridge.column(LangIdExpression(ColumnBridge.expression(text), markers))
}
