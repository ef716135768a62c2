package graft.pipelines

import graft.domain.EtlConfig
import graft.geom.Transforms
import graft.ops.{HistogramOps, SpatialJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MC geometric-acceptance study (SURVEY §3.1 step 7; reference
  * dee_geometry.py:570-710).
  *
  * Generate (or load) particles uniform in η∈[1.659,3.0], φ∈[−π/2,π/2],
  * project to each of the four faces, count sensor active-area hits per
  * particle via the grid-bucketed spatial join, then derive σ_t = 45/√n
  * and binned η/φ profiles.
  *
  * Scale notes: the particle side never shuffles — the sensor table
  * (~7k rects → ~30k gridded copies) broadcasts, the join is map-side,
  * and the only exchange is the final groupBy(event), which AQE sizes.
  * At 100 TB of particles the same plan holds (hash aggregate on a
  * unique key partial-aggregates perfectly).
  */
object Acceptance {
  import EtlConfig._

  /** Deterministic pseudo-uniform particle table (S3). Not bit-identical
    * to numpy's MT19937 — exact-parity tests use the seed-42 fixture
    * parquet instead (SURVEY §7.3 "RNG parity"). */
  def generateParticles(spark: SparkSession, n: Long): DataFrame = {
    // xxhash64-derived uniforms: reproducible across runs/partitionings,
    // unlike rand(), which depends on partition layout.
    val u1 = (abs(xxhash64(col("id"), lit(0x9e3779b9L))) % 1000000007L).cast("double") / 1000000007.0
    val u2 = (abs(xxhash64(col("id"), lit(0x85ebca6bL))) % 1000000007L).cast("double") / 1000000007.0
    spark.range(n)
      .withColumn("eta", lit(etaMin) + u1 * (etaMax - etaMin))
      .withColumn("phi", u2 * math.Pi - math.Pi / 2)
      .withColumnRenamed("id", "event_id")
  }

  /** n_hits per particle (J1/J2). `particles`: (event_id, eta, phi);
    * `faceSensors`: (face, ax1, ax2, ay1, ay2). */
  def nHits(spark: SparkSession, particles: DataFrame, faceSensors: DataFrame, cell: Double = 50.0): DataFrame = {
    import spark.implicits._
    val kin = Transforms.withCartesian(particles, zMm = zGenMm)
    val layers = zLayersM.zipWithIndex
      .map { case (z, i) => (i, 1000.0 * (z - zRefM)) }
      .toDF("face", "dz")
    val probes = kin
      .crossJoin(broadcast(layers))
      .withColumn("px", Transforms.propagateX($"x", $"theta", $"phi", $"dz"))
      .withColumn("py", Transforms.propagateY($"y", $"theta", $"phi", $"dz"))
    // active areas within a face are disjoint, but keep the reference's
    // existence semantics explicit: distinct (event, face) then count.
    val hits = SpatialJoin
      .hitJoin(probes, faceSensors.select("face", "ax1", "ax2", "ay1", "ay2"), Seq("face"), cell)
      .select("event_id", "face")
      .distinct()
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_hits"))
    particles
      .join(hits, Seq("event_id"), "left")
      .withColumn("n_hits", coalesce($"n_hits", lit(0L)))
  }

  /** Acceptance statistics row (BASELINE.md goldens): mean n, frac≥1, frac≥2. */
  def stats(nhits: DataFrame): DataFrame =
    nhits.agg(
      avg("n_hits").as("mean_nhits"),
      avg(when(col("n_hits") >= 1, 1.0).otherwise(0.0)).as("frac_ge1"),
      avg(when(col("n_hits") >= 2, 1.0).otherwise(0.0)).as("frac_ge2"),
      count(lit(1)).as("n_events")
    )

  /** Per-η profile of n_hits and σ_t = 45/√n for n>0 (A11/P15,
    * dee_geometry.py:608-698). */
  def etaProfile(nhits: DataFrame, bins: Int = 30): DataFrame = {
    val spec = HistogramOps.BinSpec(bins, etaMin, etaMax)
    HistogramOps.profile1d(nhits, col("eta"), spec, col("n_hits").cast("double"))
  }

  /** Full pipeline from the seed-42 fixture (exact goldens) or generated
    * particles. */
  def run(spark: SparkSession, particles: DataFrame): DataFrame = {
    val sensors = Layouts.faceSensors(spark)
    nHits(spark, particles, sensors)
  }
}
