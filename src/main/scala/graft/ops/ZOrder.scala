package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two dimension
  * keys so that range-partitioning + sorting on the z-value co-locates
  * rows that are close in BOTH dimensions. At cluster scale this is a
  * data-layout operator: written out, every file's min/max stats are
  * tight in both dimensions simultaneously, so a scan filtered on
  * either (or both) keys skips most files — the multi-dimensional
  * analog of the single-key sort, and the layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`.
  *
  * The bit-spread is an UNROLLED chain of fixed-shift/mask terms (no
  * variable-shift expression, no UDF), so the whole z-value stays
  * inside whole-stage codegen.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative
    * integral columns: bit i of `x` lands at position 2i, bit i of
    * `y` at 2i+1. Result fits in a signed long for bits <= 31. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Re-lay-out `df` clustered by the z-value of two dimension
    * columns: range partition on z (balanced output files), sort
    * within partitions (tight per-file min/max on BOTH dims). Write
    * the result with any file sink to get a skip-friendly layout. */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
                 bits: Int, parts: Int): DataFrame =
    df.withColumn("_z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(parts, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
}
