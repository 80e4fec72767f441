package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingling and exact set-Jaccard as kernels.
  *
  * The column formulations (`transform(sequence(...), i => array_join(
  * slice(words, i+1, n)))` and `size(array_intersect)/size(array_union)`)
  * run per-row through interpreted higher-order-function plumbing and
  * build several intermediate arrays per document. Each kernel is one pass;
  * semantics are pinned to the column formulations by a property test
  * (OpsSpec). */
case class ShinglesExpression(child: Expression, n: Int)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "shingles"

  override def evalChild(childValue: AnyRef): AnyRef = {
    val utf = childValue.asInstanceOf[UTF8String]
    if (utf == null) return null
    val text = utf.toString
    // limit -1: Spark's split(str, " ", 0) KEEPS trailing empty tokens
    // (unlike Java's default limit-0 split) — and so does the DuckDB
    // oracle's string_split
    val words = text.split(" ", -1)
    // LinkedHashSet = array_distinct's keep-first-occurrence order
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (words.length < n) out.add(utf)
    else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      val m = words.length - n + 1
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** |A ∩ B| / |A ∪ B| over two string-array columns, set semantics (inputs
  * need not be distinct). Matches `size(array_intersect(a,b)) /
  * size(array_union(a,b))` including both-empty → NaN. */
case class ShingleJaccardExpression(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "shingle_jaccard"

  def compute(aAny: AnyRef, bAny: AnyRef): Double = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[AnyRef]()
    var i = 0
    val na = a.numElements()
    while (i < na) {
      setA.add(if (a.isNullAt(i)) null else a.getUTF8String(i))
      i += 1
    }
    val seenB = new java.util.HashSet[AnyRef]()
    var inter = 0
    var bOnly = 0
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      val v: AnyRef = if (b.isNullAt(i)) null else b.getUTF8String(i)
      if (seenB.add(v)) {
        if (setA.contains(v)) inter += 1 else bOnly += 1
      }
      i += 1
    }
    inter.toDouble / (setA.size + bOnly).toDouble
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[AnyRef], b.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaccardExpr", this,
      classOf[ShingleJaccardExpression].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** md5 hex of every w-token window, BY POSITION (index i = window starting
  * at token i of the single-space token grid) — the per-position twin of
  * [[ShinglesExpression]] (which dedups), feeding cross-document passage
  * dedup where positions matter.
  *
  * One kernel pass per row: the column formulation
  * `transform(sequence(0, n-w), i -> md5(concat_ws(" ", slice(toks, i+1,
  * w))))` runs through INTERPRETED higher-order-function plumbing and
  * allocates a slice array + joined string per position; here the digest
  * consumes token bytes + separator directly (md5 over the concatenated
  * UTF-8 bytes IS md5 of the joined string), one reused MessageDigest per
  * thread, zero per-window strings besides the hex result. Semantics are
  * pinned to the column formulation by an OpsSpec property test.
  *
  * Fewer than w tokens → empty array (the windowless short-doc case);
  * null → null. Input is trimmed and split on single spaces keeping
  * empties, matching `split(trim(text), " ", -1)`. */
case class WindowHashesExpression(child: Expression, w: Int)
  extends UnaryExpression with KernelCodegen {

  require(w >= 1, s"window must be >= 1: $w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "window_hashes"

  @transient private lazy val digest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private val hexChars = "0123456789abcdef".toCharArray

  override def evalChild(childValue: AnyRef): AnyRef = {
    val utf = childValue.asInstanceOf[UTF8String]
    if (utf == null) return null
    val words = utf.trim().toString.split(" ", -1)
    val m = words.length - w + 1
    if (m <= 0) return new GenericArrayData(new Array[AnyRef](0))
    val bytes = new Array[Array[Byte]](words.length)
    var i = 0
    while (i < words.length) {
      bytes(i) = words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    val space = Array[Byte](' ')
    val md = digest.get()
    val out = new Array[AnyRef](m)
    i = 0
    while (i < m) {
      md.reset()
      var j = 0
      while (j < w) {
        if (j > 0) md.update(space)
        md.update(bytes(i + j))
        j += 1
      }
      val d = md.digest()
      val hex = new Array[Char](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = hexChars((d(k) >> 4) & 0xf)
        hex(2 * k + 1) = hexChars(d(k) & 0xf)
        k += 1
      }
      out(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleExpressions {
  def shingles(text: Column, n: Int): Column =
    ColumnBridge.column(ShinglesExpression(ColumnBridge.expression(text), n))

  def windowHashes(text: Column, w: Int): Column =
    ColumnBridge.column(WindowHashesExpression(ColumnBridge.expression(text), w))

  def jaccard(a: Column, b: Column): Column =
    ColumnBridge.column(ShingleJaccardExpression(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
