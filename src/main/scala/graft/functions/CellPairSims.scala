package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All qualifying cosine pairs between two cell-chunks as ONE compiled
  * kernel — the scoring hot loop of the exact cell-pair-blocked
  * τ-closure ([[graft.ml.AnnSearch.cosineNearPairs]]).
  *
  * Inputs: two member arrays `array<struct<id:long, vec:array<double>,
  * nrm:double>>` (a chunk of a cell each) and a boolean `same` flag
  * (true when both sides are the SAME chunk). Output:
  * `array<struct<a:long, b:long, sim:double>>` holding every member
  * pair with cosine ≥ τ, oriented a < b; for `same` chunks only
  * id-ordered pairs are emitted, so each unordered pair appears
  * EXACTLY ONCE across the whole chunk-pair join — no downstream
  * `distinct()` over the candidate set is needed (the old probe-based
  * formulation shuffled every candidate twice just to dedupe its
  * symmetric blocking).
  *
  * Why an expression and not a per-candidate join: the row-per-pair
  * join form pays ~100 ns of join/codegen row machinery per candidate;
  * at n²/2-ish candidate volumes (the isotropic worst case) that
  * machinery dominates the 64-FLOP dot by ~10×. Here the join produces
  * one row per CHUNK PAIR and the |A|×|B| pair loop runs over unpacked
  * primitive arrays — the [[NearestCells]]/[[PqOps]] discipline.
  *
  * Numerics: dots accumulate left-to-right in double (the
  * [[DotProduct]] order); sim = dot / (nrmA · nrmB) with the norms
  * precomputed once per vector upstream (sqrt of the same dot kernel)
  * — bit-identical to the `dot(a,b)/(norm(a)*norm(b))` column form the
  * oracles replicate, in either orientation (IEEE multiply commutes).
  */
case class CellPairSims(first: Expression, second: Expression, third: Expression, tau: Double)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_cell_pair_sims"

  /** Per-row kernel: unpack both sides to primitive arrays once, then
    * a tight |A|×|B| dot loop emitting only sims ≥ τ. */
  def compute(ma: ArrayData, mb: ArrayData, same: Boolean): ArrayData = {
    val na = ma.numElements()
    val nb = mb.numElements()
    val idsA = new Array[Long](na)
    val vecsA = new Array[Array[Double]](na)
    val nrmA = new Array[Double](na)
    var i = 0
    while (i < na) {
      val r = ma.getStruct(i, 3)
      idsA(i) = r.getLong(0)
      vecsA(i) = r.getArray(1).toDoubleArray()
      nrmA(i) = r.getDouble(2)
      i += 1
    }
    val idsB = new Array[Long](nb)
    val vecsB = new Array[Array[Double]](nb)
    val nrmB = new Array[Double](nb)
    var j = 0
    while (j < nb) {
      val r = mb.getStruct(j, 3)
      idsB(j) = r.getLong(0)
      vecsB(j) = r.getArray(1).toDoubleArray()
      nrmB(j) = r.getDouble(2)
      j += 1
    }
    val out = new java.util.ArrayList[InternalRow]()
    i = 0
    while (i < na) {
      val va = vecsA(i)
      val ia = idsA(i)
      j = 0
      while (j < nb) {
        val ib = idsB(j)
        // same-chunk: id-ordered pairs only (each unordered pair once);
        // cross-chunk: all pairs (the driver emits each unordered chunk
        // pair once), excluding the self id
        if (if (same) ia < ib else ia != ib) {
          val vb = vecsB(j)
          val d = math.min(va.length, vb.length)
          var s = 0.0
          var t = 0
          while (t < d) { s += va(t) * vb(t); t += 1 }
          val sim = s / (nrmA(i) * nrmB(j))
          if (sim >= tau) {
            out.add(new GenericInternalRow(Array[Any](
              math.min(ia, ib), math.max(ia, ib), sim)))
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size())))
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], c.asInstanceOf[Boolean])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellPairSims", this, classOf[CellPairSims].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"${ev.value} = $ref.compute($a, $b, $c);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CellPairSims =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CellPairSims {
  /** Column wrapper: qualifying (a, b, sim) structs for one chunk pair.
    * `ma`/`mb`: array<struct<id, vec, nrm>>; `same`: both sides are the
    * identical chunk. */
  def pairSims(ma: Column, mb: Column, same: Column, tau: Double): Column =
    ColumnBridge.column(CellPairSims(
      ColumnBridge.expression(ma),
      ColumnBridge.expression(mb),
      ColumnBridge.expression(same),
      tau))
}
