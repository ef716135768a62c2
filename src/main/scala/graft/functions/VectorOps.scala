package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Σ aᵢ·bᵢ as a native Catalyst expression with whole-stage codegen.
  *
  * The built-in formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * is correct but runs through interpreted higher-order-function
  * evaluation (lambda variables are exchanged via boxed slots and the
  * expression tree is walked per element — HOFs do not participate in
  * whole-stage codegen). This expression compiles to a tight primitive
  * loop over the two `ArrayData`s instead. On equal-length null-free
  * vectors the accumulation is left-to-right, bit-identical to the
  * fold it replaces, so every ANN oracle is unaffected.
  *
  * CONTRACT — inputs must be equal-length, null-free vectors (which
  * every embedding column here is). Outside that contract this
  * expression deliberately diverges from the zip_with form: unequal
  * lengths are truncated to the common prefix (zip_with pads with null
  * and the fold returns null), and a null element is undefined (NPE on
  * the interpreted generic-array path, 0.0 on the unsafe-array codegen
  * path — zip_with would return null). Null INPUT arrays return null
  * on both forms. Kept deliberately minimal: two array<double> inputs
  * (the Column wrapper casts float arrays up) — the semantics the
  * similarity operators need.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, s) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("s"))
      s"""
        |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $s += $a.getDouble($i) * $b.getDouble($i);
        |}
        |${ev.value} = $s;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Codegen'd dot product over two array-of-numeric columns. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
}
