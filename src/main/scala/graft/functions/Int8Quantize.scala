package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Symmetric int8 quantization of an embedding vector — the standard
  * 4× memory compression for large-scale ANN corpora (a 100 TB float32
  * embedding store becomes 25 TB, and int8 dot products are SIMD-cheap
  * on modern executors).
  *
  * q_i = floor(v_i / s + 0.5) with s = max|v| / 127 — round-half-up
  * via floor, chosen over `round` because floor on IEEE doubles is
  * bit-deterministic across engines (`round` differs between
  * decimal-repr and binary rounding at exact .5 boundaries), which
  * keeps the operator DuckDB-oracle-checkable. A zero vector (s = 0)
  * quantizes to all zeros. Dequantization is q_i · s, with per-element
  * error ≤ s/2.
  *
  * Output: struct(scale: double, q: array<tinyint>). Runs as one
  * compiled loop inside whole-stage codegen (same compute-object
  * pattern as [[NearestCells]]).
  */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))

  override def prettyName: String = "graft_int8_quantize"

  def compute(v: ArrayData): InternalRow = {
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val s = maxAbs / 127.0
    val q = new Array[Byte](n)
    if (s != 0.0) {
      var j = 0
      while (j < n) {
        q(j) = math.floor(v.getDouble(j) / s + 0.5).toByte
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](s, new GenericArrayData(q)))
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("int8Quantize", this, classOf[Int8Quantize].getName)
    nullSafeCodeGen(ctx, ev,
      a => s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

object Int8Quantize {
  /** Column wrapper: struct(scale, q) from an array-of-numeric column. */
  def quantize(vec: Column): Column =
    ColumnBridge.column(Int8Quantize(ColumnBridge.expression(vec.cast("array<double>"))))

  /** Dequantize: q_i · scale (error ≤ scale/2 per element). */
  def dequantize(q: Column, scale: Column): Column = {
    import org.apache.spark.sql.functions.transform
    transform(q, x => x.cast("double") * scale)
  }
}
