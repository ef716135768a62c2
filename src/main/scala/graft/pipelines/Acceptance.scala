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

  /** SPARSE hit counts (the 100-TB-shaped core): one row per event
    * WITH hits — (event_id, eta, n_hits≥1). The particle side streams
    * through the broadcast grid join exactly once and never shuffles;
    * the only exchange carries hit rows (≈1.4 per event here). Events
    * with zero hits are absent — derive dense outputs with the binned
    * denominators below instead of re-joining the raw particle table
    * (which would exchange the full table on event_id). */
  def hitCounts(spark: SparkSession, particles: DataFrame, faceSensors: DataFrame, cell: Double = 50.0): DataFrame =
    hitCountsKin(spark, Transforms.withCartesian(particles, zMm = zGenMm), faceSensors, cell)

  /** Same, from pre-computed kinematics (event_id, x, y, theta, phi,
    * eta) — used when the particle sample carries exact reference
    * coordinates (bit-parity goldens). */
  def hitCountsKin(spark: SparkSession, kin: DataFrame, faceSensors: DataFrame, cell: Double = 50.0): DataFrame = {
    import spark.implicits._
    // the 4-layer fan-out is an inline Generate over a literal
    // (face, dz) array — not a broadcast join: it stays inside the
    // scan's whole-stage codegen span with zero row materialization
    // (a BroadcastNestedLoopJoin would copy every probe row).
    val layerStructs = zLayersM.zipWithIndex.map { case (z, i) =>
      struct(lit(i).as("face"), lit(1000.0 * (z - zRefM)).as("dz"))
    }
    // trig once per EVENT, not per probe row: tan/cos/sin land in the
    // projection below the 4-face fan-out (4 trig calls/event instead of
    // 16). px/py keep the reference's exact association ((dz·t)·c), so
    // every strict comparison stays bit-identical to propagateX/Y.
    val probes = kin
      .withColumn("tan_t", tan($"theta"))
      .withColumn("cos_p", cos($"phi"))
      .withColumn("sin_p", sin($"phi"))
      .select(col("*"), inline(array(layerStructs: _*)))
      .withColumn("px", $"x" + $"dz" * $"tan_t" * $"cos_p")
      .withColumn("py", $"y" + $"dz" * $"tan_t" * $"sin_p")
    // existence semantics per face (the reference's `.any()`): distinct
    // faces hit per event, carried with η for downstream binning.
    // n_hits = popcount of the per-event face bitmask: bit_or partial-
    // aggregates map-side, so ONE exchange carries one row per hit
    // (event, face-set) — countDistinct would plan two exchanges
    // (expand on (event_id, face), then regroup on event_id), doubling
    // the shuffle of the one stage that touches every hit row.
    SpatialJoin
      .hitJoin(probes, faceSensors.select("face", "ax1", "ax2", "ay1", "ay2"), Seq("face"), cell)
      .select("event_id", "eta", "face")
      .groupBy("event_id")
      .agg(
        expr("CAST(bit_count(bit_or(shiftleft(1, face))) AS BIGINT)").as("n_hits"),
        first("eta").as("eta"))
  }

  /** Dense n_hits per particle (test/analysis convenience — rejoins the
    * particle table to resurrect zero-hit rows; fine at fixture scale,
    * use the sparse path + binned denominators for large inputs). */
  def nHits(spark: SparkSession, particles: DataFrame, faceSensors: DataFrame, cell: Double = 50.0): DataFrame = {
    import spark.implicits._
    particles
      .join(hitCounts(spark, particles, faceSensors, cell).select("event_id", "n_hits"), Seq("event_id"), "left")
      .withColumn("n_hits", coalesce($"n_hits", lit(0L)))
  }

  /** Acceptance statistics row (BASELINE.md goldens): mean n, frac≥1,
    * frac≥2 — computed from the SPARSE hit counts plus the total event
    * count (no dense table materialized). */
  def statsSparse(spark: SparkSession, sparse: DataFrame, nTotal: Long): DataFrame = {
    import spark.implicits._
    sparse.agg(
      (coalesce(sum("n_hits"), lit(0L)).cast("double") / nTotal).as("mean_nhits"),
      (count(lit(1)).cast("double") / nTotal).as("frac_ge1"),
      (coalesce(sum(when($"n_hits" >= 2, 1L).otherwise(0L)), lit(0L)).cast("double") / nTotal).as("frac_ge2"),
      lit(nTotal).as("n_events")
    )
  }

  /** Dense-input stats (kept for tests over nHits output). */
  def stats(nhits: DataFrame): DataFrame =
    nhits.agg(
      avg("n_hits").as("mean_nhits"),
      avg(when(col("n_hits") >= 1, 1.0).otherwise(0.0)).as("frac_ge1"),
      avg(when(col("n_hits") >= 2, 1.0).otherwise(0.0)).as("frac_ge2"),
      count(lit(1)).as("n_events")
    )

  /** n_hits histogram from the sparse counts: bin 0 = total − hit
    * events. One aggregation pass — bin 0 derives from the nonzero-bin
    * sums rather than a second scan of the sparse pipeline. */
  def histSparse(spark: SparkSession, sparse: DataFrame, nTotal: Long): DataFrame = {
    import spark.implicits._
    val nonzero = sparse.groupBy("n_hits").agg(count(lit(1)).as("n")).cache()
    try {
      val hitEvents = nonzero.agg(coalesce(sum("n"), lit(0L))).head().getLong(0)
      nonzero
        .unionByName(Seq((0L, nTotal - hitEvents)).toDF("n_hits", "n"))
        .localCheckpoint(eager = true)
    } finally nonzero.unpersist()
  }

  /** Per-η profile of n_hits including zero-hit events, via binned
    * denominators: Σ n_hits per bin from the sparse side ÷ particle
    * count per bin (a 30-row map-side-combined aggregate — the raw
    * particle table is scanned once and never exchanged row-wise). */
  def etaProfile(nhits: DataFrame, bins: Int = 30): DataFrame = {
    val spec = HistogramOps.BinSpec(bins, etaMin, etaMax)
    HistogramOps.profile1d(nhits, col("eta"), spec, col("n_hits").cast("double"))
  }

  def etaProfileSparse(particles: DataFrame, sparse: DataFrame, bins: Int = 30): DataFrame = {
    val spec = HistogramOps.BinSpec(bins, etaMin, etaMax)
    val denom = particles
      .select(HistogramOps.binCol(col("eta"), spec).as("bin"))
      .where(col("bin").isNotNull)
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val numer = sparse
      .select(HistogramOps.binCol(col("eta"), spec).as("bin"), col("n_hits"))
      .where(col("bin").isNotNull)
      .groupBy("bin").agg(sum("n_hits").as("sum_hits"))
    denom.join(numer, Seq("bin"), "left")
      .withColumn("sum_hits", coalesce(col("sum_hits"), lit(0L)))
      .withColumn("mean", col("sum_hits").cast("double") / col("n"))
      .withColumn("center", spec.center(col("bin")))
      .select("bin", "mean", "n", "center")
  }

  /** Sparse hit counts for the default layout. */
  def runSparse(spark: SparkSession, particles: DataFrame): DataFrame = {
    val sensors = Layouts.faceSensors(spark)
    hitCounts(spark, particles, sensors)
  }

  /** Dense full pipeline (fixture-scale convenience). */
  def run(spark: SparkSession, particles: DataFrame): DataFrame = {
    val sensors = Layouts.faceSensors(spark)
    nHits(spark, particles, sensors)
  }
}
