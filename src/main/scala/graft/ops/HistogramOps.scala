package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned aggregations (SURVEY §2.5 A9–A13; reference hist.Hist /
  * yahist.Hist1D fills at dee_geometry.py:616-698, bias_voltage.py:272,
  * example.ipynb).
  *
  * A histogram is just `groupBy(bin)` over a width-bucket expression; a
  * profile is `groupBy(bin).avg`; an efficiency is a join of two binned
  * counts with a binomial-error projection. Flow semantics match
  * hist.Hist regular axes: values outside [lo, hi) are dropped.
  */
object HistogramOps {

  final case class BinSpec(n: Int, lo: Double, hi: Double) {
    val width: Double = (hi - lo) / n
    def center(bin: Column): Column = lit(lo) + (bin + 0.5) * lit(width)
  }

  /** Bin index column; null outside [lo, hi) so out-of-range rows drop
    * out of groupBy keys naturally (flow excluded, as hist.Hist). The
    * index is clamped to n−1 under the v < hi guard: when width rounds
    * down in floating point, values just below hi would otherwise floor
    * to a phantom bin n (hist.Hist puts them in the last bin). */
  def binCol(v: Column, s: BinSpec): Column = {
    val b = least(floor((v - s.lo) / s.width).cast("long"), lit(s.n - 1L))
    when(v >= s.lo && v < s.hi, b)
  }

  /** Raw-range predicate for `v` ∈ [lo, hi) — applied on the source
    * column (not the derived bin) so it reaches the parquet scan as a
    * pushed filter. */
  def inRange(v: Column, s: BinSpec): Column = v >= s.lo && v < s.hi

  /** 1D histogram: (bin, center, count). */
  def hist1d(df: DataFrame, value: Column, s: BinSpec): DataFrame =
    df.where(inRange(value, s))
      .select(binCol(value, s).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .withColumn("center", s.center(col("bin")))

  /** 2D histogram: (binx, biny, count). */
  def hist2d(df: DataFrame, vx: Column, sx: BinSpec, vy: Column, sy: BinSpec): DataFrame =
    df.where(inRange(vx, sx) && inRange(vy, sy))
      .select(binCol(vx, sx).as("binx"), binCol(vy, sy).as("biny"))
      .groupBy("binx", "biny")
      .agg(count(lit(1)).as("n"))

  /** Profile: per-bin mean of `value` (A11, dee_geometry.py:623). */
  def profile1d(df: DataFrame, axis: Column, s: BinSpec, value: Column): DataFrame =
    df.where(inRange(axis, s))
      .select(binCol(axis, s).as("bin"), value.as("v"))
      .groupBy("bin")
      .agg(avg("v").as("mean"), count(lit(1)).as("n"))
      .withColumn("center", s.center(col("bin")))

  /** 2D profile: per-(binx,biny) mean (dee_geometry.py:616-623). */
  def profile2d(df: DataFrame, vx: Column, sx: BinSpec, vy: Column, sy: BinSpec, value: Column): DataFrame =
    df.where(inRange(vx, sx) && inRange(vy, sy))
      .select(binCol(vx, sx).as("binx"), binCol(vy, sy).as("biny"), value.as("v"))
      .groupBy("binx", "biny")
      .agg(avg("v").as("mean"), count(lit(1)).as("n"))

  /** Binned efficiency with binomial errors (A13/J6, example.ipynb
    * num.divide(den, binomial=True)): num ⋈ den on bin →
    * p = k/n, err = sqrt(p(1−p)/n). */
  def efficiency(df: DataFrame, axis: Column, s: BinSpec, selected: Column): DataFrame =
    df.where(inRange(axis, s))
      .select(binCol(axis, s).as("bin"), selected.cast("int").as("sel"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("sel").as("k"))
      .withColumn("p", col("k") / col("n"))
      .withColumn("err", sqrt(col("p") * (lit(1) - col("p")) / col("n")))
      .withColumn("center", s.center(col("bin")))
}
