package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization primitives (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): a vector is
  * split into `m` contiguous subvectors of `dsub` dims; each subvector
  * is replaced by the id of its nearest codeword in that subspace's
  * codebook. A d-dim float vector compresses to `m` small ints —
  * 64 floats → 8 codes here (32× smaller than float32, 64× smaller
  * than the double-width compute form) — and approximate dot products
  * against a query are computed from codes alone (ADC), so the big
  * scoring pass never touches the float corpus.
  *
  * Why this is THE 100 TB retrieval shape: at that scale the float
  * embeddings don't fit executor memory or shuffle budgets, but the PQ
  * codes of 10^11 vectors are ~1 TB — scannable per batch of queries.
  * The exact vectors are consulted only for the tiny re-ranked
  * shortlist (an id-equi-join against the parquet corpus).
  *
  * Both expressions run map-side inside whole-stage codegen: the
  * codebook is a driver-built reference object (`addReferenceObj`),
  * not inline code, exactly like [[NearestCells]]. All arithmetic is
  * double with left-to-right accumulation — deterministic, and
  * tie-breaks (`strict <` keeps the first minimum) resolve to the
  * smaller code id, so codes are bit-stable across runs/partitionings.
  */

/** Driver-built PQ codebook: `books(j)(c)` is codeword `c` of subspace
  * `j` (length `dsub`). Codewords must be in a deterministic order —
  * [[graft.ml.AnnSearch.pqBook]] sorts sample vectors by corpus id. */
case class PqBook(m: Int, dsub: Int, books: Array[Array[Array[Double]]]) {
  require(books.length == m, s"expected $m subspace books, got ${books.length}")
  def ksub: Int = books(0).length
}

/** `array<int>` PQ codes of a vector: per subspace, the L2-nearest
  * codeword id (ties → smaller id). Vectors shorter than m·dsub are
  * zero-padded in the distance (missing dims contribute codeword²). */
case class PqCodes(child: Expression, book: PqBook) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Int](book.m)
    var j = 0
    while (j < book.m) {
      val cb = book.books(j)
      val off = j * book.dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val w = cb(c)
        var d = 0.0
        var t = 0
        while (t < book.dsub) {
          val x = if (off + t < n) a.getDouble(off + t) else 0.0
          val diff = x - w(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) approximate dot product: the EXACT query
  * vector against the RECONSTRUCTED candidate,
  * Σ_j dot(q[j·dsub ..], books(j)(codes(j))) — one compiled loop over
  * m·dsub terms, no float corpus access. */
case class PqAdc(left: Expression, right: Expression, book: PqBook)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  def compute(q: ArrayData, codes: ArrayData): Double = {
    val n = q.numElements()
    var s = 0.0
    var j = 0
    while (j < book.m) {
      val w = book.books(j)(codes.getInt(j))
      val off = j * book.dsub
      var t = 0
      while (t < book.dsub) {
        if (off + t < n) s += q.getDouble(off + t) * w(t)
        t += 1
      }
      j += 1
    }
    s
  }

  override def nullSafeEval(q: Any, codes: Any): Any =
    compute(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, (q, c) => s"${ev.value} = $ref.compute($q, $c);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqOps {
  /** PQ codes of `vec` against `book` (array<int>, length m). */
  def codes(vec: Column, book: PqBook): Column =
    ColumnBridge.column(PqCodes(ColumnBridge.expression(vec.cast("array<double>")), book))

  /** ADC approximate dot of exact query `qvec` against PQ `codes`. */
  def adc(qvec: Column, codes: Column, book: PqBook): Column =
    ColumnBridge.column(PqAdc(
      ColumnBridge.expression(qvec.cast("array<double>")),
      ColumnBridge.expression(codes),
      book))
}
