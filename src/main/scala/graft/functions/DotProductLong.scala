package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen dot product over two long-array columns — [[DotProduct]]'s
  * integer sibling for the sign-LSH bucket kernel, which dots each quantized
  * vector against `planes` literal ±1 hyperplane arrays per repetition (the
  * HOF fold walked interpreted lambdas planes·reps times per row).
  *
  * Exact 64-bit integer arithmetic in the same sequential fold order as the
  * HOF form (`aggregate(zip_with(a, b, _*_), 0L, _+_)`), so bucket
  * signatures are bit-identical on the quantize-scale domain the kernel
  * sees (SqDistSpec pins parity; a sum overflowing a long would wrap here
  * where the ANSI HOF throws — quantized components are ≤ ~1e6·dim, eight
  * orders of magnitude inside the line). Length mismatches min-truncate,
  * the [[DotProduct]] contract; all callers feed fixed-dim pairs.
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

object DotProductLong {
  /** Column-API surface: dotLong(a, b) as a codegen expression. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
