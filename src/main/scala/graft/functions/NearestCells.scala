package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Top-`k` nearest centroids of a vector, computed MAP-SIDE against a
  * driver-collected centroid array — the zero-shuffle IVF assignment
  * primitive.
  *
  * The naive plan (`crossJoin(broadcast(centroids))` + a top-1
  * `row_number` window over the corpus id) is correct but forces an
  * `Exchange hashpartitioning(n_id)` of the AMPLIFIED set: shuffle
  * volume = nlist × corpus bytes — at 100 TB with nlist=1000 that is a
  * ~100 PB shuffle in the one pass that must touch every corpus row.
  * This expression does the same argmax per row inside the scan's
  * whole-stage-codegen projection: the corpus streams once, nothing
  * shuffles, and the output (cell, id, vec) is produced map-side.
  *
  * Scoring is bit-identical to the windowed form it replaces:
  * csim = dot(v, c) / (‖v‖ · ‖c‖) with left-to-right double
  * accumulation (same order as [[DotProduct]]), selection by
  * (csim desc, c_id asc) — exactly `row_number().over(orderBy(
  * desc(csim), c_id))`, so IVF oracles are unaffected. Centroid norms
  * are precomputed once at construction with the same summation order.
  *
  * Inputs must be null-free vectors; a vector shorter than a centroid
  * is truncated to the common prefix (as [[DotProduct]] does). NaN
  * similarities (zero-norm vectors) are not ordered the way Spark's
  * `desc` orders NaN — callers must not feed zero vectors.
  *
  * The centroid table is dim-table-sized by construction (nlist ×
  * dim doubles, e.g. 1000 × 1024 ≈ 8 MB) — collecting it is the same
  * data movement a broadcast would do, done once and embedded as a
  * codegen reference object, not inline code.
  */
case class NearestCells(
    child: Expression,
    ids: Array[Long],
    vecs: Array[Array[Double]],
    norms: Array[Double],
    k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"

  /** The per-row kernel — plain compiled JVM loops (no expression-tree
    * walking), shared by interpreted eval and whole-stage codegen. */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var nn = 0.0
    var i = 0
    while (i < n) { val v = a.getDouble(i); nn += v * v; i += 1 }
    val qn = math.sqrt(nn)
    val m = ids.length
    val sims = new Array[Double](m)
    var j = 0
    while (j < m) {
      val c = vecs(j)
      val d = math.min(n, c.length)
      var s = 0.0
      var t = 0
      while (t < d) { s += a.getDouble(t) * c(t); t += 1 }
      sims(j) = s / (qn * norms(j))
      j += 1
    }
    // selection sort of the top-k: ids are sorted ascending at
    // construction, and the strict `>` keeps the FIRST maximum, so
    // ties resolve to the smaller c_id — row_number() semantics.
    val kk = math.min(k, m)
    val out = new Array[Long](kk)
    val used = new Array[Boolean](m)
    var r = 0
    while (r < kk) {
      var best = -1
      var j2 = 0
      while (j2 < m) {
        if (!used(j2) && (best < 0 || sims(j2) > sims(best))) best = j2
        j2 += 1
      }
      used(best) = true
      out(r) = ids(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {
  /** Column wrapper: top-`k` centroid ids (by cosine desc, id asc) for
    * each row's vector. `cents` must be sorted by id ascending. */
  def topCells(vec: Column, cents: CentroidSet, k: Int): Column =
    ColumnBridge.column(NearestCells(
      ColumnBridge.expression(vec.cast("array<double>")),
      cents.ids, cents.vecs, cents.norms, k))
}

/** A driver-collected centroid table, norms precomputed with the same
  * left-to-right order as [[DotProduct]], sorted by centroid id. */
case class CentroidSet(ids: Array[Long], vecs: Array[Array[Double]], norms: Array[Double])
