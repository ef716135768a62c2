package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-band bucket hashes of a MinHash signature — the LSH banding
  * hot path as one codegen primitive.
  *
  * The Column formulation (`transform(sequence(...), b ->
  * xxhash64(concat_ws(",", slice(sig, ...))))`) is correct but runs
  * through interpreted higher-order-function evaluation AND builds a
  * comma-joined STRING per band per row before hashing it. This
  * expression mixes the band's longs directly (xxhash64-style avalanche
  * per element), no string materialization, compiled loop.
  *
  * Bucket values are internal to the candidate self-join: two
  * signatures land in the same (band, bucket) iff their band slices
  * are equal — true under ANY deterministic hash of the slice — and
  * hash collisions only ADD candidates, which the exact-Jaccard
  * verification filters. So swapping the hash function cannot change
  * `verifiedPairs` output (oracle-checked), only the constant factor.
  */
case class BandHashes(child: Expression, bands: Int) extends UnaryExpression {
  require(bands > 0, s"graft_band_hashes: bands must be positive, got $bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_band_hashes"

  /** xxhash64 finalization-style mixing; plain compiled loops. */
  def compute(sig: ArrayData): ArrayData = {
    val n = sig.numElements()
    if (n % bands != 0)
      throw new IllegalArgumentException(
        s"graft_band_hashes: bands ($bands) must divide the signature length ($n); " +
          "a non-divisor would silently drop trailing signature elements")
    val rows = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9e3779b185ebca87L ^ b.toLong
      var j = b * rows
      val end = j + rows
      while (j < end) {
        var k = sig.getLong(j)
        k *= 0xc2b2ae3d27d4eb4fL
        k = java.lang.Long.rotateLeft(k, 31)
        k *= 0x9e3779b185ebca87L
        h ^= k
        h = java.lang.Long.rotateLeft(h, 27) * 5 + 0x52dce729L
        j += 1
      }
      h ^= h >>> 33
      h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bandHashes", this, classOf[BandHashes].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}

object BandHashes {
  /** Column wrapper: array of `bands` bucket hashes for a signature. */
  def bandHashes(sig: Column, bands: Int): Column =
    ColumnBridge.column(BandHashes(ColumnBridge.expression(sig), bands))
}
