package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._

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
    val call =
      s"($javaType) $ref.evalChild(${childGen.isNull} ? null : (Object) ${childGen.value})"
    if (nullable) {
      ev.copy(code =
        code"""
          ${childGen.code}
          $javaType ${ev.value} = $call;
          boolean ${ev.isNull} = ${ev.value} == null;
        """)
    } else {
      ev.copy(code =
        code"""
          ${childGen.code}
          $javaType ${ev.value} = $call;
        """, isNull = FalseLiteral)
    }
  }
}
