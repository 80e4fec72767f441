package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.DataType

/** Codegen bridge for hand-written eval kernels.
  *
  * `CodegenFallback` generates `references[i].eval(INPUT_ROW)`: the
  * surrounding operator must materialize a full row, and the child
  * expression is re-evaluated through the interpreted path per call. This
  * trait instead lets whole-stage codegen compute the child normally
  * (straight out of the columnar scan / previous projection) and passes
  * that single value to [[evalChild]] on the referenced expression — the
  * kernel stays a JVM method (it is a tight buffer traversal that gains
  * nothing from being inlined as Java source), but everything around it
  * remains inside the generated code path.
  */
trait KernelCodegen { self: UnaryExpression =>

  /** The kernel: evaluated child value (null allowed) → Catalyst result
    * value (null only if [[nullable]]). */
  def evalChild(childValue: AnyRef): AnyRef

  override def eval(input: InternalRow): Any =
    evalChild(child.eval(input).asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernelExpr", this, classOf[KernelCodegen].getName)
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    // evalChild returns a BOXED value: cast to the boxed java type and
    // unbox explicitly for primitive results. A direct `(double) Object`
    // cast is a janino compile error — which WholeStageCodegenExec turns
    // into a SILENT interpreted fallback for the whole stage, exactly
    // the failure mode this trait exists to avoid (KernelCodegenSpec
    // pins compilability for every result-type shape).
    val boxed = CodeGenerator.boxedType(dataType)
    val unbox = javaType match {
      case "boolean" => ".booleanValue()"
      case "byte"    => ".byteValue()"
      case "short"   => ".shortValue()"
      case "int"     => ".intValue()"
      case "long"    => ".longValue()"
      case "float"   => ".floatValue()"
      case "double"  => ".doubleValue()"
      case _         => ""
    }
    if (nullable) {
      // the common path delegates to the shared emitter (one unbox
      // table for all arities — see KernelCodegen.emitKernelCall)
      KernelCodegen.emitKernelCall(ctx, ev, dataType, ref, "evalChild",
        Seq(childGen))
    } else {
      val call =
        s"$ref.evalChild(${childGen.isNull} ? null : (Object) ${childGen.value})"
      ev.copy(code =
        code"""
          ${childGen.code}
          $javaType ${ev.value} = (($boxed) $call)$unbox;
        """, isNull = FalseLiteral)
    }
  }
}

private[functions] object KernelCodegen {

  /** The one boxed-call emission shared by the binary/ternary traits:
    * children computed by whole-stage codegen, nulls passed THROUGH to
    * the kernel (the kernel owns null semantics), result unboxed with
    * the explicit cast janino requires (see the unary trait's note —
    * a bad cast there is a SILENT interpreted fallback). */
  def emitKernelCall(ctx: CodegenContext, ev: ExprCode, dataType: DataType,
                     ref: String, method: String,
                     children: Seq[ExprCode]): ExprCode = {
    val javaType = CodeGenerator.javaType(dataType)
    val boxed = CodeGenerator.boxedType(dataType)
    val unbox = javaType match {
      case "boolean" => ".booleanValue()"
      case "byte"    => ".byteValue()"
      case "short"   => ".shortValue()"
      case "int"     => ".intValue()"
      case "long"    => ".longValue()"
      case "float"   => ".floatValue()"
      case "double"  => ".doubleValue()"
      case _         => ""
    }
    val args = children
      .map(c => s"${c.isNull} ? null : (Object) ${c.value}")
      .mkString(", ")
    val childCode = children.map(_.code.toString).mkString("\n")
    val tmp = ctx.freshName("kernelRes")
    ev.copy(code =
      code"""
        $childCode
        Object $tmp = $ref.$method($args);
        boolean ${ev.isNull} = $tmp == null;
        $javaType ${ev.value} = ${ev.isNull}
          ? ${CodeGenerator.defaultValue(dataType)} : (($boxed) $tmp)$unbox;
      """)
  }
}

/** [[KernelCodegen]] for two-child kernels: implement
  * `evalChildren(left, right)`; nulls pass through (the kernel owns
  * null semantics). */
trait BinaryKernelCodegen { self: BinaryExpression =>

  def evalChildren(leftValue: AnyRef, rightValue: AnyRef): AnyRef

  override def eval(input: InternalRow): Any =
    evalChildren(left.eval(input).asInstanceOf[AnyRef],
      right.eval(input).asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernelExpr", this,
      classOf[BinaryKernelCodegen].getName)
    KernelCodegen.emitKernelCall(ctx, ev, dataType, ref, "evalChildren",
      Seq(left.genCode(ctx), right.genCode(ctx)))
  }
}

/** [[KernelCodegen]] for three-child kernels. */
trait TernaryKernelCodegen { self: TernaryExpression =>

  def evalChildren(a: AnyRef, b: AnyRef, c: AnyRef): AnyRef

  override def eval(input: InternalRow): Any =
    evalChildren(first.eval(input).asInstanceOf[AnyRef],
      second.eval(input).asInstanceOf[AnyRef],
      third.eval(input).asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernelExpr", this,
      classOf[TernaryKernelCodegen].getName)
    KernelCodegen.emitKernelCall(ctx, ev, dataType, ref, "evalChildren",
      children.map(_.genCode(ctx)))
  }
}
