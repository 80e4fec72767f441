package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.marc.{AlternateScript, MarcSpec, SpecSet}

/** `marc_extract(record, spec)` as a native Catalyst expression.
  *
  * The UDF form deserializes the full record struct into case classes per
  * call — per-field object allocation for every row. This expression walks
  * the InternalRow/ArrayData buffers directly (UTF8String comparisons, no
  * materialization), with the spec compiled once at plan time — the
  * reference's "compile the extractor once, reuse per record" hotspot fix
  * (/root/reference/lib/traject/marc_extractor.rb:85-108,182-202) taken to
  * its Spark conclusion. Codegen via [[KernelCodegen]]: the child struct is
  * produced by whole-stage codegen and handed to the kernel directly.
  *
  * Input schema (child): struct<leader:string, fields:array<struct<
  * tag,ind1,ind2,value,subfields:array<struct<code,value>>>>>.
  */
case class MarcExtractExpression(
    child: Expression,
    specString: String,
    separator: Option[String],
    alternateScript: AlternateScript)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "marc_extract"

  @transient private lazy val specSet: SpecSet = MarcSpec.parse(specString)
  @transient private lazy val fetchAlternate = alternateScript != AlternateScript.Exclude
  @transient private lazy val interesting: Set[UTF8String] = {
    val base =
      if (alternateScript == AlternateScript.Only) Set.empty[String]
      else specSet.tags
    (if (fetchAlternate) base + SpecSet.AlternateScriptTag else base)
      .map(UTF8String.fromString)
  }
  @transient private lazy val tag880 = UTF8String.fromString(SpecSet.AlternateScriptTag)
  @transient private lazy val code6 = UTF8String.fromString(SpecSet.Subfield6)
  @transient private lazy val sepUtf = separator.map(UTF8String.fromString)

  // field struct ordinals (must match graft.marc.MarcField)
  private final val TAG = 0
  private final val IND1 = 1
  private final val IND2 = 2
  private final val VALUE = 3
  private final val SUBFIELDS = 4

  override def evalChild(childValue: AnyRef): AnyRef = {
    val rec = childValue.asInstanceOf[InternalRow]
    if (rec == null) return new GenericArrayData(Array.empty[Any])
    val fields = rec.getArray(1)
    if (fields == null) return new GenericArrayData(Array.empty[Any])

    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = fields.numElements()
    while (i < n) {
      val field = fields.getStruct(i, 5)
      if (field != null) {
        val tag = field.getUTF8String(TAG)
        if (tag != null && interesting.contains(tag)) {
          val effectiveTag =
            if (fetchAlternate && tag.equals(tag880)) effective880Tag(field)
            else tag
          val specs = specSet.specsForTag(effectiveTag.toString)
          var s = 0
          while (s < specs.length) {
            val spec = specs(s)
            if (matchesIndicators(spec, field)) extractField(spec, field, out)
            s += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def effective880Tag(field: InternalRow): UTF8String = {
    val subs = if (field.isNullAt(SUBFIELDS)) null else field.getArray(SUBFIELDS)
    if (subs == null) return tag880
    var i = 0
    val n = subs.numElements()
    while (i < n) {
      val sf = subs.getStruct(i, 2)
      if (sf != null && code6.equals(sf.getUTF8String(0))) {
        val six = sf.getUTF8String(1)
        if (six == null) return tag880
        // first 3 BYTES of $6 (spec_set.effective_tag byteslice semantics)
        val bytes = six.getBytes
        return UTF8String.fromBytes(bytes, 0, math.min(3, bytes.length))
      }
      i += 1
    }
    tag880
  }

  private def matchesIndicators(spec: MarcSpec, field: InternalRow): Boolean =
    MarcExtractEval.matchesIndicators(spec, field)

  private def extractField(spec: MarcSpec, field: InternalRow,
                           out: scala.collection.mutable.ArrayBuffer[Any]): Unit =
    MarcExtractEval.extractField(spec, field, sepUtf, out)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MarcExtractExpression {
  /** Column form over the record-struct column. */
  def extract(record: Column, spec: String,
              separator: Option[String] = Some(" "),
              alternateScript: AlternateScript = AlternateScript.Include): Column =
    ColumnBridge.column(MarcExtractExpression(
      ColumnBridge.expression(record), spec, separator, alternateScript))
}
