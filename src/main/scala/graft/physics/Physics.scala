package graft.physics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sensor physics models (SURVEY §2.2 P9–P15, P20; reference sensors.py).
  *
  * Every model exists twice: a pure-Scala form (driver-side geometry and
  * bit-exact golden tests) and a Catalyst `Column` form (distributed hot
  * path, codegen'd — no UDFs).
  *
  * Floating-point note: the scalar forms replicate the reference's
  * evaluation order exactly (left-associative), so threshold comparisons
  * downstream (BV feasibility, 20 mA cap) reproduce the reference bit
  * for bit.
  */
object Physics {

  /** Φ(r): equivalent fluence in 1e14 n_eq, r in mm (sensors.py:38-42). */
  def irradiation(r: Double): Double = -9.053e+00 + 7.420e+03 / r + 3.664e-03 * r

  def irradiationCol(r: Column): Column = lit(-9.053e+00) + lit(7.420e+03) / r + lit(3.664e-03) * r

  /** I(Φ) in mA for a full 16x16 sensor (sensors.py:44-50). */
  def sensorCurrent(fluence: Double, gain: Double = 20, alpha: Double = 3.70235e-19, pixels: Int = 256): Double = {
    val volume = pixels * (0.13 * 0.13) * 0.005 // cm^3, replicates pixels * 0.13**2 * 0.005
    gain * fluence * 1e14 * volume * alpha * 1e3
  }

  def sensorCurrentCol(fluence: Column, gain: Double = 20, alpha: Double = 3.70235e-19, pixels: Int = 256): Column = {
    val volume = pixels * (0.13 * 0.13) * 0.005
    lit(gain) * fluence * lit(1e14) * lit(volume) * lit(alpha) * lit(1e3)
  }

  /** Per-sensor current with safety factor and surface current
    * (reference ETL.py:148-152, P11). */
  def getCurrent(r: Double, safetyFactor: Double = 1, addCurrent: Double = 0.75): Double =
    addCurrent + sensorCurrent(irradiation(r)) * safetyFactor

  def getCurrentCol(r: Column, safetyFactor: Double = 1, addCurrent: Double = 0.75): Column =
    lit(addCurrent) + sensorCurrentCol(irradiationCol(r)) * lit(safetyFactor)

  /** occ(r) relative occupancy, r in mm (sensors.py:52-57, P12). */
  def sensorOccupancy(r: Double): Double = 0.11 + 91297.0 / (r * r)

  def sensorOccupancyCol(r: Column): Column = lit(0.11) + lit(91297.0) / (r * r)

  /** σ_t = coef/√n (reference dee_geometry.py:54-55, 608; P15). Null
    * for n ≤ 0 — the reference gets +∞ there, which its t-axis drops
    * into overflow; null drops out of our binned fills the same way
    * (and avoids the ANSI divide-by-zero error). */
  def timeResCol(n: Column, coef: Double = 45): Column =
    when(n > 0, lit(coef) / sqrt(n))

  /** Bias-voltage ladder curves: r_min = a·ln(r_max) − b per vendor/charge
    * (sensors.py:4-36, P14). Keyed by the reference's function names. */
  val bvCurves: Map[String, (Double, Double)] = Map(
    "fbk_w19_5fc"      -> (307.12, 1468.9),
    "fbk_w15_5fc"      -> (497.95, 2630.6),
    "fbk_w13_2p5fc"    -> (499.43, 2618.8),
    "fbk_w13_5fc"      -> (435.93, 2251.2),
    "fbk_w13_10fc"     -> (363.91, 1834.6),
    "fbk_w13_15fc"     -> (333.15, 1664.5),
    "hpk_split4_2p5fc" -> (578.03, 3103.6),
    "hpk_split4_5fc"   -> (526.14, 2792.0),
    "hpk_split4_10fc"  -> (481.91, 2544.6),
    "hpk_split4_15fc"  -> (446.32, 2338.6)
  )

  def bvCurve(name: String)(r: Double): Double = {
    val (a, b) = bvCurves(name)
    a * math.log(r) - b
  }

  def bvCurveCol(name: String, r: Column): Column = {
    val (a, b) = bvCurves(name)
    lit(a) * log(r) - lit(b)
  }

  /** Column form keyed by a curve-name column (broadcast `when` chain). */
  def bvCurveByName(name: Column, r: Column): Column =
    bvCurves.foldLeft(lit(Double.NaN)) { case (acc, (k, (a, b))) =>
      when(name === lit(k), lit(a) * log(r) - lit(b)).otherwise(acc)
    }
}
