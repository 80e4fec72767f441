package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.marc.{AlternateScript, MarcSpec, SpecSet}

/** SpecSet fusion (the reference's SpecSet idea,
  * marc_extractor_spec.rb:13-68, taken to the plan level): evaluate MANY
  * extraction specs in ONE traversal of the record's fields array,
  * returning a struct with one array<string> per entry.
  *
  * A config like the demo indexer has ~22 `marc_extract` fields; as separate
  * expressions each walks the fields array and re-materializes tag/subfield
  * UTF8Strings. Fused, the record is traversed once and every spec consumes
  * the same pass — the per-record cost becomes O(fields × interested-specs)
  * instead of O(fields × all-specs-expressions).
  */
final case class BatchEntry(name: String, spec: String,
                            separator: Option[String] = Some(" "),
                            alternateScript: AlternateScript = AlternateScript.Include)

case class MarcExtractBatch(child: Expression, entries: Seq[BatchEntry])
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType =
    StructType(entries.map(e => StructField(e.name, ArrayType(StringType), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "marc_extract_batch"

  @transient private lazy val compiled: Array[CompiledEntry] =
    entries.map { e =>
      val specSet = MarcSpec.parse(e.spec)
      val fetchAlt = e.alternateScript != AlternateScript.Exclude
      val interesting = {
        val base = if (e.alternateScript == AlternateScript.Only) Set.empty[String]
          else specSet.tags
        (if (fetchAlt) base + SpecSet.AlternateScriptTag else base).map(UTF8String.fromString)
      }
      CompiledEntry(specSet, e.separator.map(UTF8String.fromString), fetchAlt, interesting)
    }.toArray

  @transient private lazy val tag880 = UTF8String.fromString(SpecSet.AlternateScriptTag)
  @transient private lazy val code6 = UTF8String.fromString(SpecSet.Subfield6)

  private final val TAG = 0
  private final val VALUE = 3
  private final val SUBFIELDS = 4

  private case class CompiledEntry(specSet: SpecSet, sep: Option[UTF8String],
                                   fetchAlt: Boolean, interesting: Set[UTF8String])

  override def evalChild(childValue: AnyRef): AnyRef = {
    val n = compiled.length
    val out = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Any])
    val rec = childValue.asInstanceOf[InternalRow]
    if (rec != null) {
      val fields = rec.getArray(1)
      if (fields != null) {
        var i = 0
        val numFields = fields.numElements()
        while (i < numFields) {
          val field = fields.getStruct(i, 5)
          if (field != null) {
            val tag = field.getUTF8String(TAG)
            if (tag != null) {
              val is880 = tag.equals(tag880)
              // resolve the 880 base tag lazily, once per field
              var effTagFor880: UTF8String = null
              var e = 0
              while (e < n) {
                val ce = compiled(e)
                if (ce.interesting.contains(tag)) {
                  val effective =
                    if (ce.fetchAlt && is880) {
                      if (effTagFor880 == null) effTagFor880 = effective880Tag(field)
                      effTagFor880
                    } else tag
                  val specs = ce.specSet.specsForTag(effective.toString)
                  var s = 0
                  while (s < specs.length) {
                    val spec = specs(s)
                    if (MarcExtractEval.matchesIndicators(spec, field))
                      MarcExtractEval.extractField(spec, field, ce.sep, out(e))
                    s += 1
                  }
                }
                e += 1
              }
            }
          }
          i += 1
        }
      }
    }
    new GenericInternalRow(out.map(b => new GenericArrayData(b.toArray): Any))
  }

  private def effective880Tag(field: InternalRow): UTF8String = {
    val subs = if (field.isNullAt(SUBFIELDS)) null else field.getArray(SUBFIELDS)
    if (subs == null) return tag880
    var i = 0
    val m = subs.numElements()
    while (i < m) {
      val sf = subs.getStruct(i, 2)
      if (sf != null && code6.equals(sf.getUTF8String(0))) {
        val six = sf.getUTF8String(1)
        if (six == null) return tag880
        val bytes = six.getBytes
        return UTF8String.fromBytes(bytes, 0, math.min(3, bytes.length))
      }
      i += 1
    }
    tag880
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared low-level field extraction used by both the single and batch
  * expressions. */
private[functions] object MarcExtractEval {
  private final val IND1 = 1
  private final val IND2 = 2
  private final val VALUE = 3
  private final val SUBFIELDS = 4

  def matchesIndicators(spec: MarcSpec, field: InternalRow): Boolean = {
    def ok(want: Option[String], ord: Int): Boolean = want match {
      case None => true
      case Some(w) =>
        val v = if (field.isNullAt(ord)) "" else field.getUTF8String(ord).toString
        w == v
    }
    ok(spec.ind1, IND1) && ok(spec.ind2, IND2)
  }

  def extractField(spec: MarcSpec, field: InternalRow, sep: Option[UTF8String],
                   out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    val isControl = !field.isNullAt(VALUE)
    if (isControl) {
      val value = field.getUTF8String(VALUE)
      if (spec.hasByteSlice)
        out += spec.byteSlice(value.toString).map(UTF8String.fromString).orNull
      else out += value
    } else {
      val subs = if (field.isNullAt(SUBFIELDS)) null else field.getArray(SUBFIELDS)
      if (subs == null) return
      val vals = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      var i = 0
      val n = subs.numElements()
      while (i < n) {
        val sf = subs.getStruct(i, 2)
        if (sf != null) {
          val code = sf.getUTF8String(0)
          if (code != null && spec.includesSubfieldCode(code.toString))
            vals += sf.getUTF8String(1)
        }
        i += 1
      }
      if (vals.nonEmpty) {
        sep match {
          case Some(s) if spec.joinable => out += UTF8String.concatWs(s, vals.toSeq: _*)
          case _ => vals.foreach(out += _)
        }
      }
    }
  }
}

object MarcExtractBatch {
  def extract(record: Column, entries: Seq[BatchEntry]): Column =
    ColumnBridge.column(MarcExtractBatch(ColumnBridge.expression(record), entries))
}
