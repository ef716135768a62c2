package graft

import graft.ops.HistogramOps
import graft.ops.HistogramOps.{BinSpec, IntSpec}
import org.apache.spark.sql.functions._

/** A10 full shape: 3D fills (regular + integer z axis), axis-sum
  * projections, and center-weighted profiles over histogram tables
  * (reference dee_geometry.py:616-698).
  */
class HistogramOpsSpec extends SparkSpec {

  import spark.implicits._

  private val sx = BinSpec(4, 0.0, 4.0)
  private val sy = BinSpec(2, 0.0, 2.0)

  // (x, y, k): x in [0,4), y in [0,2), k integer 0..3 (+ one overflow 5)
  private def df = Seq(
    (0.5, 0.5, 0L), (0.5, 0.5, 2L), (0.5, 1.5, 2L),
    (1.5, 0.5, 1L), (1.5, 0.5, 3L),
    (3.9, 1.5, 0L), (3.9, 1.5, 5L), // k=5 outside IntSpec(0,3) → dropped
    (4.0, 0.5, 1L), (-0.1, 0.5, 1L) // x out of range → dropped
  ).toDF("x", "y", "k")

  test("hist3dInt drops out-of-range rows and bins by integer value") {
    val h = HistogramOps.hist3dInt(df, $"x", sx, $"y", sy, $"k", IntSpec(0, 3))
    val m = h.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(m == Map(
      (0L, 0L, 0L) -> 1L, (0L, 0L, 2L) -> 1L, (0L, 1L, 2L) -> 1L,
      (1L, 0L, 1L) -> 1L, (1L, 0L, 3L) -> 1L, (3L, 1L, 0L) -> 1L))
  }

  test("hist3d bins a regular z axis with edge clamping") {
    val sz = BinSpec(2, 0.0, 10.0)
    val h = HistogramOps.hist3d(
      Seq((0.5, 0.5, 4.9), (0.5, 0.5, 5.0), (0.5, 0.5, 10.0)).toDF("x", "y", "z"),
      $"x", sx, $"y", sy, $"z", sz)
    val m = h.collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(m == Map(0L -> 1L, 1L -> 1L)) // z=10.0 out of [0,10)
  }

  test("projectHist sums counts over the dropped axis") {
    val h = HistogramOps.hist3dInt(df, $"x", sx, $"y", sy, $"k", IntSpec(0, 3))
    val p = HistogramOps.projectHist(h, "biny")
    val m = p.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m == Map((0L, 0L) -> 1L, (0L, 2L) -> 2L, (1L, 1L) -> 1L, (1L, 3L) -> 1L, (3L, 0L) -> 1L))
    assert(p.columns.toSeq == Seq("binx", "binz", "n"))
  }

  test("profileHist is the count-weighted mean of axis centers") {
    val h = HistogramOps.hist3dInt(df, $"x", sx, $"y", sy, $"k", IntSpec(0, 3))
    val prof = HistogramOps.profileHist(
      HistogramOps.projectHist(h, "biny"), "binz", $"binz".cast("double"))
    val m = prof.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // binx 0: k = {0, 2, 2} → mean 4/3; binx 1: {1, 3} → 2.0; binx 3: {0} → 0.0
    assert(m(0L) == (4.0 / 3.0, 3L) && m(1L) == (2.0, 2L) && m(3L) == (0.0, 1L))
  }

  test("profileHist with a regular axis uses bin centers, not raw values") {
    val sz = BinSpec(4, 0.0, 8.0) // centers 1, 3, 5, 7
    val d = Seq((0.5, 0.5, 0.1), (0.5, 0.5, 1.9), (0.5, 0.5, 7.9)).toDF("x", "y", "z")
    val prof = HistogramOps.profileHist(
      HistogramOps.hist3d(d, $"x", sx, $"y", sy, $"z", sz), "binz", sz.center($"binz"))
    val r = prof.head()
    // bins 0, 0, 3 → centers 1, 1, 7 → mean 3 (NOT mean of raw z ≈ 3.3)
    assert(r.getDouble(2) == 3.0 && r.getLong(3) == 3L)
  }
}
