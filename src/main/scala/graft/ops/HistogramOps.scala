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

  /** Integer axis (hist.axis.Integer at dee_geometry.py:620,673): one
    * bin per integer value, ends INCLUSIVE. The reference's
    * Integer(0,4) overflows n=4 events; we size the axis to cover the
    * full n range instead (documented deviation — dropping the n=4
    * tail would silently bias the profile).
    *
    * Golden provenance for the `acc_nhits_*` oracles that use this
    * axis: the per-event (x, y, θ, φ, η, n_hits) fixture
    * `tiled_acceptance_seed42.parquet` is the UNPATCHED reference's own
    * event loop captured at seed 42 (dee_geometry.py run up through the
    * nHits computation); the profile VALUES were then recomputed from
    * that fixture in NumPy with this inclusive [0,4] axis (and
    * Decimal-repr HALF_UP rounding to match Spark `round`). So the
    * deviation from the reference lives ONLY in the axis convention
    * applied on top of reference-produced events — no reference physics
    * was patched to produce these goldens. */
  final case class IntSpec(lo: Long, hi: Long)

  /** Integer-axis bin column: the value itself, null outside [lo,hi]. */
  def intBinCol(v: Column, s: IntSpec): Column =
    when(v >= s.lo && v <= s.hi, v.cast("long"))

  /** 3D histogram with two regular axes and a regular z axis
    * (dee_geometry.py:638-643, the (η,φ,t) fill): (binx,biny,binz,n). */
  def hist3d(df: DataFrame, vx: Column, sx: BinSpec, vy: Column, sy: BinSpec,
             vz: Column, sz: BinSpec): DataFrame =
    df.where(inRange(vx, sx) && inRange(vy, sy) && inRange(vz, sz))
      .select(binCol(vx, sx).as("binx"), binCol(vy, sy).as("biny"), binCol(vz, sz).as("binz"))
      .groupBy("binx", "biny", "binz")
      .agg(count(lit(1)).as("n"))

  /** 3D histogram with an INTEGER z axis (dee_geometry.py:616-621, the
    * (η,φ,n) fill): binz is the integer value itself. */
  def hist3dInt(df: DataFrame, vx: Column, sx: BinSpec, vy: Column, sy: BinSpec,
                vz: Column, sz: IntSpec): DataFrame =
    df.where(inRange(vx, sx) && inRange(vy, sy) && vz >= sz.lo && vz <= sz.hi)
      .select(binCol(vx, sx).as("binx"), binCol(vy, sy).as("biny"), intBinCol(vz, sz).as("binz"))
      .groupBy("binx", "biny", "binz")
      .agg(count(lit(1)).as("n"))

  /** Axis-sum projection over a histogram TABLE (the reference's
    * `h[{'eta': sum}]` at dee_geometry.py:690-698): drop `axis`, sum
    * counts over the remaining bins. Histogram tables are tiny
    * aggregates, so these reductions are driver-cheap at any input
    * scale — the expensive fill already happened map-side. */
  def projectHist(h: DataFrame, axis: String): DataFrame = {
    val rest = h.columns.filter(c => c != axis && c != "n").map(col(_))
    h.groupBy(rest: _*).agg(sum("n").as("n"))
  }

  /** Profile reduction over a histogram table (hist.Hist.profile at
    * dee_geometry.py:623,646): collapse `axis` to the count-weighted
    * mean of its bin CENTERS (not raw values — matching hist, which
    * profiles the discretized axis). Pass `center` = s.center(col(axis))
    * for a regular axis, or col(axis).cast("double") for an integer
    * axis (where centers are the integers, so the profile is exact). */
  def profileHist(h: DataFrame, axis: String, center: Column): DataFrame = {
    val rest = h.columns.filter(c => c != axis && c != "n").map(col(_))
    h.groupBy(rest: _*)
      .agg((sum(center * col("n")) / sum("n")).as("mean"), sum("n").as("n"))
  }

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
