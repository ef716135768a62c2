package graft.geom

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Coordinate transforms (SURVEY §2.2 P1–P4).
  *
  * Forward: (x,y,z) → (r, θ, η, φ) with r=√(x²+y²), θ=atan2(r,z),
  * η=−ln tan(θ/2), φ=atan2(y,x)   (reference ETL.py:54-62).
  * Inverse: (η,φ,z) → θ=2·atan(e^−η), r=z·tanθ, x=r·cosφ, y=r·sinφ
  * (reference ETL.py:64-74).
  *
  * All are plain Catalyst column expressions — whole-stage-codegen'd,
  * no UDFs, so they fuse with surrounding filters/projections at scale.
  */
object Transforms {

  // ---- column-level (engine hot path) ----

  def rOf(x: Column, y: Column): Column = sqrt(x * x + y * y)

  def thetaOf(r: Column, z: Column): Column = atan2(r, z)

  def etaOfTheta(theta: Column): Column = -log(tan(theta / 2))

  def phiOf(x: Column, y: Column): Column = atan2(y, x)

  def thetaFromEta(eta: Column): Column = lit(2.0) * atan(exp(-eta))

  def rFromThetaZ(theta: Column, z: Column): Column = z * tan(theta)

  /** deg → rad (reference ETL.py:40-41, P4). */
  def degToRad(deg: Column): Column = radians(deg)

  /** Add r/theta/eta/phi columns derived from x, y, z (P1). */
  def withKinematics(df: DataFrame, x: String = "x", y: String = "y", z: String = "z"): DataFrame = {
    val r = rOf(col(x), col(y))
    df.withColumn("r", r)
      .withColumn("theta", thetaOf(col("r"), col(z)))
      .withColumn("eta", etaOfTheta(col("theta")))
      .withColumn("phi", phiOf(col(x), col(y)))
  }

  /** Add x/y/r/theta columns derived from eta, phi at fixed z (P2). */
  def withCartesian(df: DataFrame, eta: String = "eta", phi: String = "phi", zMm: Double = 3000.0): DataFrame =
    df.withColumn("theta", thetaFromEta(col(eta)))
      .withColumn("r", rFromThetaZ(col("theta"), lit(zMm)))
      .withColumn("x", col("r") * cos(col(phi)))
      .withColumn("y", col("r") * sin(col(phi)))

  /** Layer propagation shift (P3, reference dee_geometry.py:599-601):
    * Δ = 1000·(z_layer − z_ref)·tanθ applied along (cosφ, sinφ).
    * `dzMm` is already 1000·(z_i − z_ref).
    */
  def propagateX(x0: Column, theta: Column, phi: Column, dzMm: Column): Column =
    x0 + dzMm * tan(theta) * cos(phi)

  def propagateY(y0: Column, theta: Column, phi: Column, dzMm: Column): Column =
    y0 + dzMm * tan(theta) * sin(phi)

  // ---- pure-Scala (driver-side small geometry; bit-exact vs reference) ----

  def thetaFromEta(eta: Double): Double = 2.0 * math.atan(math.exp(-eta))
  def rOf(x: Double, y: Double): Double = math.sqrt(x * x + y * y)
  def etaOfTheta(theta: Double): Double = -math.log(math.tan(theta / 2))
}
