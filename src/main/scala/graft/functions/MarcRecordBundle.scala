package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.marc.MarcRecord

/** N record-level functions evaluated over ONE record materialization.
  *
  * A `ScalaUDF` over the record struct deserializes the full MarcRecord per
  * call AND re-serializes its case-class result; a config using five
  * record-level rules pays five of each per record — the measured
  * demo-pipeline bottleneck (SURVEY.md §8). This expression materializes
  * the record once, applies every function, and writes the results straight
  * into an InternalRow (no output encoder at all). It is the
  * whole-record analog of `MarcExtractBatch`'s one-traversal spec fusion.
  *
  * The reference's equivalent cost story: each_record/to_field lambdas all
  * share the single parsed MARC::Record
  * (/root/reference/lib/traject/indexer.rb:464-480) — this restores that
  * one-record-materialization property under Spark.
  *
  * Supported fn result shapes: String, Seq[String] (null elements kept),
  * Option[String]/Option[Int], Int, null.
  */
final case class MarcRecordBundleExpression(
    child: Expression,
    names: Seq[String],
    types: Seq[DataType],
    fns: Seq[MarcRecord => Any])
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType =
    StructType(names.zip(types).map { case (n, t) => StructField(n, t, nullable = true) })
  override def nullable: Boolean = true
  override def prettyName: String = "marc_record_bundle"

  override def evalChild(childValue: AnyRef): AnyRef = {
    val row = childValue.asInstanceOf[InternalRow]
    if (row == null) return null
    val rec = MarcRecordBundleExpression.materialize(row)
    val out = new Array[Any](fns.length)
    var i = 0
    while (i < fns.length) {
      out(i) = MarcRecordBundleExpression.toCatalyst(fns(i)(rec))
      i += 1
    }
    new GenericInternalRow(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MarcRecordBundleExpression {

  /** Hand-rolled InternalRow → MarcRecord materializer: tight index loops
    * over the raw buffers, pre-sized wrapped arrays instead of the generic
    * encoder-deserializer's builder/boxing paths. Field ordinals match the
    * graft.marc.MarcField schema (tag, ind1, ind2, value, subfields). */
  def materialize(row: InternalRow): MarcRecord = {
    val leader = { val l = row.getUTF8String(0); if (l == null) null else l.toString }
    val fieldsArr = row.getArray(1)
    if (fieldsArr == null) return MarcRecord(leader, Nil)
    val n = fieldsArr.numElements()
    val fields = new Array[graft.marc.MarcField](n)
    var i = 0
    while (i < n) {
      val f = fieldsArr.getStruct(i, 5)
      if (f == null) fields(i) = null
      else {
        val subsArr = if (f.isNullAt(4)) null else f.getArray(4)
        val subs: Seq[graft.marc.Subfield] =
          if (subsArr == null) Nil
          else {
            val m = subsArr.numElements()
            val out = new Array[graft.marc.Subfield](m)
            var j = 0
            while (j < m) {
              val sf = subsArr.getStruct(j, 2)
              out(j) = graft.marc.Subfield(strAt(sf, 0), strAt(sf, 1))
              j += 1
            }
            scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
          }
        fields(i) = graft.marc.MarcField(
          strAt(f, 0), strAt(f, 1), strAt(f, 2), strAt(f, 3), subs)
      }
      i += 1
    }
    MarcRecord(leader, scala.collection.immutable.ArraySeq.unsafeWrapArray(fields))
  }

  @inline private def strAt(r: InternalRow, i: Int): String = {
    if (r == null || r.isNullAt(i)) null
    else r.getUTF8String(i).toString
  }

  val Str: DataType = StringType
  val Arr: DataType = ArrayType(StringType, containsNull = true)
  val Int32: DataType = IntegerType

  def toCatalyst(v: Any): Any = v match {
    case null | None  => null
    case Some(x)      => toCatalyst(x)
    case s: String    => UTF8String.fromString(s)
    case i: Int       => i
    case xs: Seq[_]   => new GenericArrayData(xs.map(toCatalyst).toArray)
    case other => throw new IllegalArgumentException(
      s"Unsupported bundle result type: ${other.getClass}")
  }

  /** Column form: one struct column holding every entry's result. */
  def bundle(record: Column,
             entries: Seq[(String, DataType, MarcRecord => Any)]): Column =
    ColumnBridge.column(MarcRecordBundleExpression(
      ColumnBridge.expression(record),
      entries.map(_._1), entries.map(_._2), entries.map(_._3)))
}
