package graft

import graft.domain.EtlConfig
import graft.ops.{Bandwidth, BvSearch, SmReconstruct}
import graft.pipelines.{Acceptance, Layouts}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Detector-domain conformance queries. These run the real pipelines
  * over the vendored fixtures (seed-42 particle parquet + layout YAML)
  * and are checked against literal-VALUES oracles holding goldens
  * measured from the reference (BASELINE.md and the fixture JSONs) — the
  * driver's DuckDB executes the literal SELECT, so the comparison is
  * exact and independent of this engine.
  */
object QueriesDomain {

  private def particles(spark: SparkSession): DataFrame =
    spark.read.parquet(Layouts.resolveFixture("particles_seed42.parquet"))

  private def d2Sms(spark: SparkSession): DataFrame = {
    val half = Layouts.faceCenters(spark, "disk1", "back").filter(col("x") > 0)
    SmReconstruct.supermodules(spark, half, EtlConfig.modPartitions.map(_._3))
  }

  /** Memoized per session: the D2 reconstruction chain (windows over a
    * ≤2k-row dim table) feeds six conformance queries — build once. */
  private def d2Sensors(spark: SparkSession): DataFrame =
    d2Cache.getOrElseUpdate(spark, ()) {
      val centers = Layouts.faceCenters(spark, "disk1", "back")
      SmReconstruct.reconstruct(spark, centers).localCheckpoint(eager = true)
    }

  private val d2Cache =
    new graft.util.SessionCache[Unit, DataFrame]

  /** Acceptance stats over the exact seed-42 reference particle sample
    * (sparse path: the particle table is scanned, never exchanged). */
  private def accStats(spark: SparkSession, dir: String): DataFrame = {
    val p = particles(spark)
    val sparse = Acceptance.runSparse(spark, p)
    Acceptance.statsSparse(spark, sparse, p.count()).select(
      round(col("mean_nhits"), 6).as("mean_nhits"),
      round(col("frac_ge1"), 6).as("frac_ge1"),
      round(col("frac_ge2"), 6).as("frac_ge2"),
      col("n_events")
    )
  }

  /** Full n_hits histogram for the same sample (sparse + derived bin 0). */
  private def accHist(spark: SparkSession, dir: String): DataFrame = {
    val p = particles(spark)
    Acceptance.histSparse(spark, Acceptance.runSparse(spark, p), p.count())
  }

  /** S3 oracle parity (dee_geometry.py:577-586): the deterministic
    * particle generator itself, aggregated into exact integer 20-bin
    * η/φ histogram counts plus per-bin min/max. The generator's
    * xxhash64-derived uniforms are a pure per-row function of the id,
    * so every cell is reproducible across runs AND partitionings — the
    * aggregates here are partition-order independent (counts are exact
    * integers; min/max are order-free), unlike a double sum/avg. The
    * golden VALUES were captured from one run and pin the generator's
    * exact output distribution: range coverage (v_min/v_max of the edge
    * bins pin the [η_min,η_max]×[−π/2,π/2] support) and uniformity. */
  private def s3Particles(spark: SparkSession, dir: String): DataFrame = {
    import EtlConfig.{etaMax, etaMin}
    val p = Acceptance.generateParticles(spark, 100000)
    val etaB = least(floor((col("v") - lit(etaMin)) / lit(etaMax - etaMin) * 20), lit(19.0)).cast("long")
    val phiB = least(floor((col("v") + lit(math.Pi / 2)) / lit(math.Pi) * 20), lit(19.0)).cast("long")
    val e = p.select(lit("eta").as("axis"), col("eta").as("v")).withColumn("bin", etaB)
    val f = p.select(lit("phi").as("axis"), col("phi").as("v")).withColumn("bin", phiB)
    e.unionByName(f)
      .groupBy("axis", "bin")
      .agg(
        count(lit(1)).as("n"),
        round(min("v"), 9).as("v_min"),
        round(max("v"), 9).as("v_max"))
  }

  // ---- A10 full shape + σ_t (dee_geometry.py:608-698) over the tiled
  // reference run: per-event (eta, phi, n_hits) with n from the
  // REFERENCE's own tiled-dee intersect (bit-parity fixture). Axes
  // follow the reference: Regular(40, η_min, η_max) × Regular(40,
  // −π/2, π/2) × Integer n (sized 0..4 to cover the n=4 tail the
  // reference's Integer(0,4) overflows) / Regular(40, 0, 100) for t.
  import graft.ops.HistogramOps
  import graft.ops.HistogramOps.{BinSpec, IntSpec}

  private val etaSpec = BinSpec(40, EtlConfig.etaMin, EtlConfig.etaMax)
  private val phiSpec = BinSpec(40, -math.Pi / 2, math.Pi / 2)
  private val tSpec = BinSpec(40, 0.0, 100.0)

  private def tiledEvents(spark: SparkSession): DataFrame =
    spark.read.parquet(Layouts.resolveFixture("tiled_acceptance_seed42.parquet"))
      .select("eta", "phi", "n_hits")

  /** (η,φ,n) 3D fill (dee_geometry.py:616-621). */
  private def accHist3d(spark: SparkSession): DataFrame =
    HistogramOps.hist3dInt(
      tiledEvents(spark),
      col("eta"), etaSpec, col("phi"), phiSpec,
      col("n_hits"), IntSpec(0, 4))

  /** `h_eta_phi_n[{'phi': sum}].profile('n')` (dee_geometry.py:697). */
  private def accNhitsProfileEta(spark: SparkSession, dir: String): DataFrame =
    HistogramOps.profileHist(
      HistogramOps.projectHist(accHist3d(spark), "biny"),
      "binz", col("binz").cast("double"))
      .select(
        col("binx").as("bin"),
        round(etaSpec.center(col("binx")), 6).as("center"),
        round(col("mean"), 6).as("mean_n"),
        col("n").as("n_events"))

  /** `h_eta_phi_n[{'eta': sum}].profile('n')` (dee_geometry.py:692). */
  private def accNhitsProfilePhi(spark: SparkSession, dir: String): DataFrame =
    HistogramOps.profileHist(
      HistogramOps.projectHist(accHist3d(spark), "binx"),
      "binz", col("binz").cast("double"))
      .select(
        col("biny").as("bin"),
        round(phiSpec.center(col("biny")), 6).as("center"),
        round(col("mean"), 6).as("mean_n"),
        col("n").as("n_events"))

  /** The (r,φ,n) fill (dee_geometry.py:669-683, Regular(40, 300, 1185)
    * r axis) profiled after the φ axis-sum. r = √(x²+y²) at the
    * generation plane; ~0.1% of events fall below r=300 (η near 3.0)
    * and drop into underflow exactly as in the reference. */
  private def accNhitsProfileR(spark: SparkSession, dir: String): DataFrame = {
    val rSpec = BinSpec(40, 300.0, 1185.0)
    val withR = spark.read.parquet(Layouts.resolveFixture("tiled_acceptance_seed42.parquet"))
      .select(sqrt(col("x") * col("x") + col("y") * col("y")).as("r"), col("phi"), col("n_hits"))
    HistogramOps.profileHist(
      HistogramOps.projectHist(
        HistogramOps.hist3dInt(withR, col("r"), rSpec, col("phi"), phiSpec, col("n_hits"), IntSpec(0, 4)),
        "biny"),
      "binz", col("binz").cast("double"))
      .select(
        col("binx").as("bin"),
        round(rSpec.center(col("binx")), 6).as("center"),
        round(col("mean"), 6).as("mean_n"),
        col("n").as("n_events"))
  }

  /** σ_t = 45/√n (P15, dee_geometry.py:608) filled into the (η,φ,t)
    * hist (:637-643) and profiled along t after the φ axis-sum
    * (:703-706). Zero-hit events give t = +∞ → dropped by the t-axis
    * range, exactly the reference's overflow behavior. The profile is
    * the count-weighted mean of t-bin CENTERS (hist.Hist semantics),
    * not of raw t. */
  private def accTimeProfileEta(spark: SparkSession, dir: String): DataFrame = {
    val withT = tiledEvents(spark)
      .withColumn("t", graft.physics.Physics.timeResCol(col("n_hits")))
    HistogramOps.profileHist(
      HistogramOps.projectHist(
        HistogramOps.hist3d(withT, col("eta"), etaSpec, col("phi"), phiSpec, col("t"), tSpec),
        "biny"),
      "binz", tSpec.center(col("binz")))
      .select(
        col("binx").as("bin"),
        round(etaSpec.center(col("binx")), 6).as("center"),
        round(col("mean"), 6).as("mean_t"),
        col("n").as("n_events"))
  }

  /** The n≥3 sanity investigation (dee_geometry.py:712-810): the
    * reference's zoomed per-event scan of multi-hit events over the
    * tiled dees — kinematics, per-face projected coordinates, and
    * per-face intersect flags. Here: the first 20 n≥3 fixture events,
    * per-face (px, py) with the reference's exact propagation
    * association, and the HIT flag recomputed by the ENGINE's full
    * tiled chain (updated-layout tiling → sensors → grid-bucketed
    * point-in-rect join). The oracle flags come from the reference's
    * own `dees[layer].intersect` run over the same events (shim run,
    * n3_golden.json; the shim asserts the four flags re-sum to the
    * fixture's n_hits for every event), so this pins per-face — not
    * just per-count — parity of the tiled geometry. */
  private def n3Sanity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sensors = graft.ops.DeeTiling.layoutFaceSensors(spark, "updated")
    val ev = spark.read.parquet(Layouts.resolveFixture("tiled_acceptance_seed42.parquet"))
      .filter(col("n_hits") >= 3)
      .orderBy("event_id")
      .limit(20)
      .localCheckpoint(eager = true) // 20 rows; feeds two join branches
    val layers = EtlConfig.zLayersM.zipWithIndex
      .map { case (z, i) => (i, 1000.0 * (z - EtlConfig.zRefM)) }
      .toDF("face", "dz")
    val probes = ev
      .withColumn("tan_t", tan($"theta"))
      .withColumn("cos_p", cos($"phi"))
      .withColumn("sin_p", sin($"phi"))
      .crossJoin(broadcast(layers))
      .withColumn("px", $"x" + $"dz" * $"tan_t" * $"cos_p")
      .withColumn("py", $"y" + $"dz" * $"tan_t" * $"sin_p")
    val hits = graft.ops.SpatialJoin
      .hitJoin(probes, sensors.select("face", "ax1", "ax2", "ay1", "ay2"), Seq("face"), 50.0)
      .select($"event_id", $"face").distinct()
      .withColumn("hit", lit(1L))
    probes
      .join(hits, Seq("event_id", "face"), "left")
      .select(
        $"event_id",
        concat(lit("face"), ($"face" + 1).cast("string")).as("face"),
        round($"px", 6).as("px"),
        round($"py", 6).as("py"),
        coalesce($"hit", lit(0L)).as("hit"))
  }

  /** 2D (η,φ) n profile (dee_geometry.py:623 `h_eta_phi_n.profile("n")`)
    * compacted for the oracle: per η row, the number of populated φ
    * cells and the sum of the per-cell means. */
  private def accProfile2dRowsum(spark: SparkSession, dir: String): DataFrame =
    HistogramOps.profileHist(accHist3d(spark), "binz", col("binz").cast("double"))
      .groupBy(col("binx").as("bin"))
      .agg(count(lit(1)).as("n_cells"), round(sum("mean"), 6).as("sum_mean"))

  /** Cross-run comparison (dee_geometry.py:813-867, the --comparison
    * overlay; S7 consumer): cache two acceptance runs' 40-bin η
    * profiles via the parquet run-cache upsert, read them back
    * partition-pruned, and join into the overlay table. Run 'updated'
    * is the reference's own tiled run (fixture n); run 'plain' is the
    * ENGINE's full pipeline — plain-layout tiling → sensors → spatial
    * join → sparse profile — so the golden also pins per-event parity
    * of the plain tiling chain. */
  private def runCompare(spark: SparkSession, dir: String): DataFrame = {
    val cache = java.nio.file.Files.createTempDirectory("graft_run_cache").toString
    val kin = spark.read.parquet(Layouts.resolveFixture("tiled_acceptance_seed42.parquet")).cache()
    try {
      val profUpdated = HistogramOps.profile1d(
        kin, col("eta"), etaSpec, col("n_hits").cast("double"))
      val plainSensors = graft.ops.DeeTiling.layoutFaceSensors(spark, "plain")
      val sparse = Acceptance.hitCountsKin(spark, kin.select("event_id", "x", "y", "theta", "phi", "eta"), plainSensors)
      val profPlain = Acceptance.etaProfileSparse(kin, sparse, bins = 40)
      graft.io.Sinks.upsertRun(spark, profUpdated, cache, "updated")
      graft.io.Sinks.upsertRun(spark, profPlain, cache, "plain")
      val a = graft.io.Sinks.readRun(spark, cache, Some("updated"))
        .select(col("bin"), col("center"), col("mean").as("mean_updated"))
      val b = graft.io.Sinks.readRun(spark, cache, Some("plain"))
        .select(col("bin"), col("mean").as("mean_plain"))
      a.join(b, Seq("bin"))
        .select(
          col("bin"),
          round(col("center"), 6).as("center"),
          round(col("mean_updated"), 6).as("mean_updated"),
          round(col("mean_plain"), 6).as("mean_plain"),
          round(col("mean_updated") - col("mean_plain"), 6).as("delta"))
        .localCheckpoint(eager = true)
    } finally kin.unpersist()
  }

  /** Supermodule reconstruction entity counts (X8). */
  private def smCounts(spark: SparkSession, dir: String): DataFrame = {
    val s = d2Sensors(spark)
    s.agg(
      countDistinct("sm_id").as("n_sm"),
      countDistinct("sm_id", "mod_i").as("n_modules"),
      count(lit(1)).as("n_sensors")
    )
  }

  /** X8 over the TDR center database (disk1/back, x>0 half) — proves
    * the reconstruction chain isn't shape-fitted to `database_new`.
    * The reference never hand-tunes a partition table for TDR, so the
    * per-row flavors come from the generic partition solver (X1 —
    * the reference's own `partition.getPartition`, the one ETL.py:648
    * uses for tiling; engine solver pinned 1:1 against it for n=1..60
    * by `x1_partition`). Golden: shim run of the same chain —
    * occupancy.py:49-131's fromCenters + y-pairing + SuperModule
    * placement with getPartition — over database_TDR.yaml
    * (tdr_golden.py → 84 SMs / 506 modules / 1012 sensors). */
  private def smCountsTdr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val half = Layouts
      .faceCenters(spark, "disk1", "back", Layouts.resolveFixture("database_TDR.yaml"), "TDR")
      .filter(col("x") > 0)
    // per-module-row lengths: count of sensors on each pair's upper y,
    // same rank pairing as SmReconstruct.supermodules; a ≤30-row dim
    // collect that feeds the solver (like the reference's driver-side
    // partition list)
    val ys = half.select("y").distinct()
      .withColumn("k", row_number().over(Window.orderBy(desc("y"))) - 1)
    val lengths = half.join(ys.filter(($"k" % 2) === 0), "y")
      .groupBy(($"k" / 2).cast("int").as("pair"))
      .agg(count(lit(1)).as("len"))
      .orderBy("pair")
      .collect().map(_.getLong(1).toInt).toSeq
    val flavorRows = lengths.map(l => graft.ops.PartitionSolver.getPartition(l))
    val sens = SmReconstruct.sensors(SmReconstruct.modules(
      SmReconstruct.supermodules(spark, half, flavorRows)))
    sens.agg(
      countDistinct("sm_id").as("n_sm"),
      countDistinct("sm_id", "mod_i").as("n_modules"),
      count(lit(1)).as("n_sensors"),
      countDistinct(when($"n_mod" === 3, $"sm_id")).as("n_sm3"),
      countDistinct(when($"n_mod" === 6, $"sm_id")).as("n_sm6"),
      countDistinct(when($"n_mod" === 7, $"sm_id")).as("n_sm7"),
      round(sum("x"), 3).as("sum_x"),
      round(sum("y"), 3).as("sum_y"))
  }

  /** A5/P7 active-area rollup (ETL.py:285-286 Module.getActiveArea,
    * 405-409 SuperModule.getActiveArea, 810 covered_area): one
    * `rollup(sm_id, mod_i, sensor_iy)` pass gives sensor → module →
    * supermodule → dee totals; entity counts and area sums per level
    * vs the reference occupancy-run golden. */
  private def areaRollup(spark: SparkSession, dir: String): DataFrame = {
    // SQL ROLLUP via a view: the reconstruction chain contains a
    // self-join, and DetectAmbiguousSelfJoin rejects its attributes as
    // Dataset-API rollup keys (false positive — the keys are unambiguous)
    graft.ops.SensorTable.withActiveArea(d2Sensors(spark))
      .select(col("sm_id"), col("mod_i"), col("sensor_iy"), col("active_area"))
      .createOrReplaceTempView("area_sensors")
    spark.sql(
      """SELECT CASE gid WHEN 7 THEN 'dee' WHEN 3 THEN 'sm'
        |  WHEN 1 THEN 'module' ELSE 'sensor' END AS level,
        |  count(1) AS n_entities, round(sum(area), 6) AS total_area
        |FROM (SELECT grouping_id(sm_id, mod_i, sensor_iy) AS gid,
        |        sum(active_area) AS area
        |      FROM area_sensors GROUP BY ROLLUP(sm_id, mod_i, sensor_iy))
        |GROUP BY 1""".stripMargin)
  }

  /** Supermodule flavor counts (A7). */
  private def smFlavors(spark: SparkSession, dir: String): DataFrame =
    d2Sensors(spark)
      .select("sm_id", "n_mod").distinct()
      .groupBy(col("n_mod").cast("long").as("n_mod"))
      .agg(count(lit(1)).as("n_sm"))

  /** Total module current (A2 rollup, 723.92038… mA golden). */
  private def totalCurrent(spark: SparkSession, dir: String): DataFrame =
    d2Sensors(spark).agg(round(sum("current"), 6).as("total_ma"))

  /** Per-ETROC occupancy histogram (P13 + A9, 20 bins over [0,1)). */
  private def etrocHist(spark: SparkSession, dir: String): DataFrame = {
    val occ = Bandwidth.perEtrocOccupancy(d2Sensors(spark))
    graft.ops.HistogramOps.hist1d(occ, col("occ"), graft.ops.HistogramOps.BinSpec(20, 0.0, 1.0))
      .select(col("bin"), col("n"))
  }

  /** Bandwidth rollup (P20/A12, four Tbps variants). */
  private def bandwidthTbps(spark: SparkSession, dir: String): DataFrame = {
    val occ = Bandwidth.perEtrocOccupancy(d2Sensors(spark))
    Bandwidth.rollup(spark, occ).select(
      round(col("bw_tdr"), 6).as("bw_tdr"),
      round(col("bw_mini_hdr"), 6).as("bw_mini_hdr"),
      round(col("bw_mini_hdr_nocal"), 6).as("bw_mini_hdr_nocal"),
      round(col("bw_no_hdr_nocal"), 6).as("bw_no_hdr_nocal")
    )
  }

  /** BV study: leads/channels for the 8 sensor configs (X2/A8). */
  private def bvStudy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mods = SmReconstruct.moduleStats(d2Sensors(spark))
      .withColumn("mod_i", col("mod_i").cast("int"))
    mods.cache()
    val rows = EtlConfig.bvConfigs.map { case (label, curve) =>
      val (leads, channels) = BvSearch.study(spark, mods, curve)
      (label, leads, channels)
    }
    mods.unpersist()
    rows.toDF("config", "leads", "channels")
  }

  /** Greedy radial BV grouping (F5/O1/O4/F7) group rollup. */
  private def greedyGroups(spark: SparkSession, dir: String): DataFrame = {
    val mods = SmReconstruct.moduleStats(d2Sensors(spark))
    val grouped = graft.ops.GreedyGrouping.fromModuleStats(spark, mods)
    graft.ops.GreedyGrouping.groupSummary(grouped)
      .select(
        col("vendor"),
        col("group").cast("long").as("grp"),
        col("n_mods"),
        round(col("group_current"), 6).as("group_current")
      )
  }

  /** O5/A16: ring split of the supermodule table. */
  private def ringSplit(spark: SparkSession, dir: String): DataFrame = {
    val sms = d2Sms(spark)
    val ringed = graft.ops.RingSplit.classify(sms)
    graft.ops.RingSplit.checkInvariance(sms, ringed)
    ringed.groupBy("ring").agg(
      count(lit(1)).as("n_sm"),
      sum("n_mod").cast("long").as("n_modules")
    )
  }

  /** Per-SM ring membership (debug granularity). */
  private def ringMembers(spark: SparkSession, dir: String): DataFrame =
    graft.ops.RingSplit.classify(d2Sms(spark))
      .select(col("row_idx").cast("long").as("row_idx"), col("sm_seq").cast("long").as("sm_seq"),
        col("n_mod").cast("long").as("n_mod"), round(col("y_row"), 3).as("y_row"), col("ring"))

  /** Mixed-vendor min_split BV studies over the ring split. */
  private def minsplitStudies(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ringed = graft.ops.RingSplit.classify(d2Sms(spark))
    val mods = SmReconstruct.moduleStats(d2Sensors(spark)).cache()
    val rows = graft.ops.RingSplit.referenceStudies(spark, mods, ringed)
    mods.unpersist()
    rows.toDF("study", "leads", "channels", "n_fbk", "n_hpk")
  }

  /** A9 over the min_split studies: the per-BV-channel current
    * histogram the reference draws after each study block
    * (bias_voltage.py:273/341/410, `Hist1D(currents, bins=...)`).
    * The reference's literal bins string is "10,0,1" — every channel
    * current is ≥ 1 mA, so its plotted histogram is EMPTY (all three
    * studies overflow entirely; shim-verified: 226/248/143 values, all
    * ≥ 1.0). Pinning zero rows proves nothing, so this query bins the
    * same values over [0, 25) mA — 10 bins wide enough to expose the
    * distribution — against counts recomputed by the shim run with
    * numpy on the reference's own `currents` lists. */
  private def minsplitHist(spark: SparkSession, dir: String): DataFrame = {
    val ringed = graft.ops.RingSplit.classify(d2Sms(spark))
    val mods = SmReconstruct.moduleStats(d2Sensors(spark)).cache()
    val spec = graft.ops.HistogramOps.BinSpec(10, 0.0, 25.0)
    val out = graft.ops.RingSplit.studyDefs
      .map { case (label, assign, ms) =>
        val segs = graft.ops.RingSplit.minSplitSegments(spark, mods, ringed, assign, ms)
        graft.ops.HistogramOps.hist1d(segs, col("current"), spec)
          .withColumn("study", lit(label))
      }
      .reduce(_ unionByName _)
      .select(col("study"), col("bin"), round(col("center"), 3).as("center"), col("n"))
      .localCheckpoint(eager = true)
    mods.unpersist()
    out
  }

  /** X3 dee tiling of the 'updated' layout: per-face entity counts. */
  private def tilingCounts(spark: SparkSession, dir: String): DataFrame =
    graft.ops.DeeTiling.tileUpdatedLayout(spark)
      .filter(col("kind") === "sm")
      .groupBy("face")
      .agg(count(lit(1)).as("n_sm"), sum("n_mod").cast("long").as("n_modules"))

  /** X3 across dee-layout VARIANTS (dee_geometry.py:225-297): tile
    * baseline / plain / updated+seal / updated+no_feedthrough and roll
    * up per-face SM counts, module counts, and SM-center coordinate
    * sums — all vs shim-run reference goldens. The baseline golden was
    * captured with the reference's `start = length` run carry-over
    * corrected to `start = 0` (the mis-centering bug this engine fixes,
    * see DeeTiling scaladoc); baseline is the only variant with rows
    * split into 2+ runs, so the others are identical either way. */
  private def tilingVariants(spark: SparkSession, dir: String): DataFrame = {
    val variants = Seq(
      ("baseline", "baseline", false, false),
      ("plain", "plain", false, false),
      ("updated_seal", "updated", true, false),
      ("updated_noft", "updated", false, true)
    )
    variants
      .map { case (name, layout, seal, noft) =>
        graft.ops.DeeTiling.tileLayout(spark, layout, seal, noft)
          .filter(col("kind") === "sm")
          .groupBy("face")
          .agg(
            count(lit(1)).as("n_sm"),
            sum("n_mod").cast("long").as("n_modules"),
            round(sum("x"), 3).as("sum_x"),
            round(sum("y"), 3).as("sum_y"))
          .withColumn("variant", lit(name))
      }
      .reduce(_ unionByName _)
      .select("variant", "face", "n_sm", "n_modules", "sum_x", "sum_y")
  }

  /** X3 across module SIZES (dee_geometry.py:316-341): tile the
    * 'updated' layout with the M (44.10×57.50, gap 0.5, RB 57.5 /
    * PB 28.5) and L (same dims, gap 0.6) modules and roll up per-face
    * SM counts, module counts, flavor counts, and SM-center coordinate
    * sums — vs shim-run reference goldens (`--modules M` / `--modules
    * L`, start-reset fix applied as for `tiling_variants`). Covers the
    * reference's module-size study path that the S-pinned conformance
    * queries left unchecked. */
  private def tilingSizes(spark: SparkSession, dir: String): DataFrame =
    Seq("M", "L")
      .map { size =>
        graft.ops.DeeTiling.tileLayout(spark, "updated", size = size)
          .filter(col("kind") === "sm")
          .groupBy("face")
          .agg(
            count(lit(1)).as("n_sm"),
            sum("n_mod").cast("long").as("n_modules"),
            sum(when(col("n_mod") === 3, 1L).otherwise(0L)).as("n3"),
            sum(when(col("n_mod") === 6, 1L).otherwise(0L)).as("n6"),
            sum(when(col("n_mod") === 7, 1L).otherwise(0L)).as("n7"),
            round(sum("x"), 3).as("sum_x"),
            round(sum("y"), 3).as("sum_y"))
          .withColumn("size", lit(size))
      }
      .reduce(_ unionByName _)
      .select("size", "face", "n_sm", "n_modules", "n3", "n6", "n7", "sum_x", "sum_y")

  /** X3 tiling flavor counts per face (A7 over the tiled layout). */
  private def tilingFlavors(spark: SparkSession, dir: String): DataFrame =
    graft.ops.DeeTiling.tileUpdatedLayout(spark)
      .filter(col("kind") === "sm")
      .groupBy(col("face"), col("n_mod").cast("long").as("n_mod"))
      .agg(count(lit(1)).as("n_sm"))

  /** P17/P18: service-board + VTRX placement over the tiled faces
    * (per-face aggregates vs the reference shim run's boards). */
  private def serviceBoards(spark: SparkSession, dir: String): DataFrame =
    graft.ops.DeeTiling.referenceFaces()
      .map { case (face, cfg, first) =>
        val tiled = graft.ops.DeeTiling.tile(spark, cfg, graft.geom.Exclusion.updatedLayout(first))
        val sms = graft.ops.Services.withServiceBoards(graft.ops.DeeTiling.supermodules(tiled), cfg)
        val smAgg = sms.agg(
          count(lit(1)).as("n_sm"),
          round(sum("rb_y"), 3).as("sum_rb_y"),
          round(sum("pb_y"), 3).as("sum_pb_y"),
          round(sum("vtrx_x"), 3).as("sum_vtrx_x"),
          round(sum("vtrx_y"), 3).as("sum_vtrx_y")
        )
        val pbAgg = graft.ops.Services.splitPB(sms, cfg)
          .agg(count(lit(1)).as("n_pb_rows"), round(sum("pb_split_x"), 3).as("sum_pb_split_x"))
        smAgg.crossJoin(pbAgg).withColumn("face", lit(face))
      }
      .reduce(_ unionByName _)

  /** A4: supermodule occupancy over the reconstructed D2 half. */
  private def a4SmOccupancy(spark: SparkSession, dir: String): DataFrame = {
    val mods = SmReconstruct.moduleStats(d2Sensors(spark))
    val occ = graft.ops.Services.smOccupancy(mods).select("sm_id", "sm_occupancy")
    occ.join(d2Sms(spark), Seq("sm_id"))
      .select(
        round(col("y_row") + EtlConfig.pbWidth / 2.0, 6).as("y_sm"),
        round(col("x_sm"), 6).as("x_sm"),
        col("n_mod").cast("long").as("n_mod"),
        round(col("sm_occupancy"), 6).as("occ")
      )
  }

  /** O7: BV-ladder ring iteration (fbk_w19_5fc). */
  private def o7LadderRings(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Services.ladderRings(spark, "fbk_w19_5fc")
      .select(col("ring").cast("long").as("ring"),
        round(col("r_outer"), 6).as("r_outer"), round(col("r_inner"), 6).as("r_inner"))

  /** S1+S5 pipeline: Face TSV modules → sensor centers; sums must match
    * the independently-shipped YAML database exactly. */
  private def exportCenters(spark: SparkSession, dir: String): DataFrame = {
    val fixDir = new java.io.File(Layouts.resolveFixture("Face 1.txt")).getParent
    val faceMap = Seq((1, "disk1", "front"), (2, "disk1", "back"), (3, "disk2", "front"), (4, "disk2", "back"))
    import spark.implicits._
    val fm = faceMap.toDF("face", "disk", "face_name")
    val centers = graft.ops.Services.sensorCentersFromModules(graft.io.FaceTsv.readAll(spark, fixDir))
    centers.join(broadcast(fm), Seq("face"))
      .groupBy("disk", "face_name")
      .agg(
        count(lit(1)).as("n_centers"),
        round(sum("center_x"), 3).as("sum_x"),
        round(sum("center_y"), 3).as("sum_y")
      )
  }

  /** Tiled-layout sensor table (X3 → X5 chain): per-face aggregates. */
  private def tilingSensors(spark: SparkSession, dir: String): DataFrame =
    graft.ops.DeeTiling.referenceFaces()
      .map { case (face, cfg, first) =>
        val tiled = graft.ops.DeeTiling.tile(spark, cfg, graft.geom.Exclusion.updatedLayout(first))
        graft.ops.DeeTiling.sensors(graft.ops.DeeTiling.supermodules(tiled), cfg)
          .withColumn("face", lit(face))
      }
      .reduce(_ unionByName _)
      .groupBy("face")
      .agg(
        count(lit(1)).as("n_sensors"),
        round(sum("x"), 3).as("sum_x"),
        round(sum("y"), 3).as("sum_y"),
        round(sum("ax1"), 3).as("sum_ax1"),
        round(sum("ay1"), 3).as("sum_ay1"),
        round(sum("ax2"), 3).as("sum_ax2"),
        round(sum("ay2"), 3).as("sum_ay2")
      )

  /** Full §3.1 pipeline: MC acceptance over the TILED 'updated' layout
    * — tiling → sensors → spatial join — vs an n_hits histogram from a
    * fresh seeded reference run over its own tiled dees
    * (fixtures/tiled_acceptance_seed42.parquet). */
  private def tiledAccHist(spark: SparkSession, dir: String): DataFrame = {
    val sensors = graft.ops.DeeTiling.layoutFaceSensors(spark, "updated")
    // no cache: the fixture feeds the count and the join scan, and two
    // 46 MB columnar scans are cheaper than one in-memory cache fill
    // (measured ~0.3 s vs ~1.4 s); histSparse's aggregate cache already
    // keeps the expensive join pass single-shot.
    // r7 re-adjudication of the r4(cached 2.89 s) vs r6(uncached
    // 3.97 s) bench discrepancy: dev.CacheProbe A/Bs both shapes under
    // bench conditions (local[32], min-of-3 steady) — uncached 1.74 s
    // vs cached 1.96 s on this host; the r6 cell's 3.97 s was session
    // debt in the bench tail, not this code path. Decision stands.
    val p = spark.read.parquet(Layouts.resolveFixture("tiled_acceptance_seed42.parquet"))
      .select("event_id", "x", "y", "theta", "phi", "eta")
    Acceptance.histSparse(spark, Acceptance.hitCountsKin(spark, p, sensors), p.count())
  }

  /** X3 over the example.ipynb detector (notebook cells 2+6): per-face
    * SM/module counts of the small-sensor baseline tiling — 44.2 × 56.5
    * modules, both disks at r_inner = 315, edge_x = 6, no exclusions —
    * vs a fresh shim run of the notebook's exact construction. */
  private def nbTiling(spark: SparkSession, dir: String): DataFrame =
    graft.ops.DeeTiling.tileNotebook(spark)
      .filter(col("kind") === "sm")
      .groupBy("face")
      .agg(count(lit(1)).as("n_sm"), sum("n_mod").cast("long").as("n_modules"))

  /** The notebook's acceptance scan (example.ipynb cells 13-16) at its
    * EXACT parameters: 1e5 events, η ∈ [1.659, 2.950), φ ∈ [−π/2, π/2),
    * propagated to the four notebook faces (non-square 21.75 × 22
    * sensors) — the numerator η histogram (`Hist1D([v.eta for v in
    * hits], bins="40,1.659,2.950")`) vs the seeded shim run's counts.
    * The fixture (fixtures/nb_acceptance_seed42.parquet) is the
    * reference's own event sample and per-event hit counts captured
    * under np.random.seed(42); the engine recomputes hits from its own
    * tiling through the grid spatial join, so equal bin counts pin the
    * whole chain (tile → sensors → propagate → intersect → bin). */
  private def nbAccHist(spark: SparkSession, dir: String): DataFrame = {
    val faces = graft.ops.DeeTiling.notebookFaces()
    val tiled = graft.ops.DeeTiling.tileNotebook(spark)
    val sensors = faces.zipWithIndex
      .map { case ((face, cfg, _), idx) =>
        graft.ops.DeeTiling.sensors(
            graft.ops.DeeTiling.supermodules(tiled.filter(col("face") === face)), cfg)
          .select(lit(idx).as("face"), col("ax1"), col("ax2"), col("ay1"), col("ay2"))
      }
      .reduce(_ unionByName _)
    val p = spark.read.parquet(Layouts.resolveFixture("nb_acceptance_seed42.parquet"))
      .select("event_id", "x", "y", "theta", "phi", "eta")
    val sparse = Acceptance.hitCountsKin(spark, p, sensors)
    val spec = graft.ops.HistogramOps.BinSpec(40, 1.659, 2.950)
    graft.ops.HistogramOps.hist1d(sparse, col("eta"), spec)
      .select(col("bin"), round(col("center"), 6).as("center"), col("n"))
  }

  /** geometric_acceptance.ipynb tiling pin (cells 4-31): per-dee
    * filled (module_matrix sum, ETL.py:702-707) and available
    * (yes-state slots — the notebook's `slot_matrix`, which no longer
    * exists on Dee; ETL.py:811 is the reference's own AttributeError
    * path) for the three tiled variants at their exact notebook
    * parameters. Goldens from a fresh shim run (dev/gen_ga_golden.py);
    * the notebook's recorded `available` totals and the v2 `filled`
    * total match it exactly, while the large/small `filled` outputs
    * (3936/3852) are stale — an older ETL.py covered a few fewer
    * slots, the same evolution nb_tiling already pinned. */
  private def gaVariants(spark: SparkSession, dir: String): DataFrame =
    Seq("large_sensor", "small_sensor", "small_sensor_v2")
      .map { v =>
        graft.ops.DeeTiling.tileFaces(spark, graft.ops.DeeTiling.gaFaces(v))
          .filter(col("kind") === "slot")
          .groupBy(col("face").as("dee"))
          .agg(
            sum(col("covered").cast("long")).as("filled"),
            sum((col("available") === "yes").cast("long")).as("available"))
          .withColumn("variant", lit(v))
      }
      .reduce(_ unionByName _)
      .select("variant", "dee", "filled", "available")

  /** The geometric_acceptance.ipynb MC detector set, as (variant,
    * face-indexed corner table): two fromCenters layouts (TDR,
    * new_layout — Sensor(42.5, 22) over the two YAML databases) and
    * two tiled variants (large_sensor, small_sensor). */
  private def gaDetectors(spark: SparkSession): Seq[(String, DataFrame)] = {
    val tiled = Seq("large_sensor", "small_sensor").map { v =>
      val faces = graft.ops.DeeTiling.gaFaces(v)
      val all = graft.ops.DeeTiling.tileFaces(spark, faces)
      v -> faces.zipWithIndex
        .map { case ((dee, cfg, _), idx) =>
          graft.ops.DeeTiling.sensors(
              graft.ops.DeeTiling.supermodules(all.filter(col("face") === dee)), cfg)
            .select(lit(idx).as("face"), col("ax1"), col("ax2"), col("ay1"), col("ay2"))
        }
        .reduce(_ unionByName _)
    }
    val layouts = Seq(
      "TDR" -> ("database_TDR.yaml", "TDR"),
      "new_layout" -> ("database_new.yaml", "new")
    ).map { case (v, (yamlName, layout)) =>
      v -> Layouts.faceSensors(spark, Layouts.resolveFixture(yamlName), layout)
        .select(col("face"), col("ax1"), col("ax2"), col("ay1"), col("ay2"))
    }
    layouts.take(1) ++ tiled ++ layouts.drop(1)
  }

  /** geometric_acceptance.ipynb MC pin (cells 57-66): per-variant
    * hit-count histogram (`Hist1D(nHits[det], bins="5,-0.5,4.5")`)
    * over the seed-42 fixture events — the engine recomputes every
    * variant's hits from its own tiling / fromCenters chain through
    * the grid spatial join; the zero bin is total − accepted (events
    * with no hits never materialize in the sparse join). */
  private def gaNhits(spark: SparkSession, dir: String): DataFrame = {
    val p = spark.read.parquet(Layouts.resolveFixture("ga_acceptance_seed42.parquet"))
      .select("event_id", "x", "y", "theta", "phi", "eta")
    val total = p.count()
    gaDetectors(spark)
      .map { case (v, sensors) =>
        val sparse = Acceptance.hitCountsKin(spark, p, sensors)
          .groupBy(col("n_hits").cast("long").as("nhits"))
          .agg(count(lit(1)).as("n"))
        val zero = sparse.agg((lit(total) - sum("n")).as("n"))
          .select(lit(0L).as("nhits"), col("n"))
        sparse.unionByName(zero).withColumn("variant", lit(v))
      }
      .reduce(_ unionByName _)
      .select("variant", "nhits", "n")
  }

  /** geometric_acceptance.ipynb efficiency-numerator pin (cell 63):
    * per-variant η histogram of accepted events
    * (`Hist1D([v.eta for v in hits[det]], bins="40,1.659,2.950")`). */
  private def gaAccHist(spark: SparkSession, dir: String): DataFrame = {
    val p = spark.read.parquet(Layouts.resolveFixture("ga_acceptance_seed42.parquet"))
      .select("event_id", "x", "y", "theta", "phi", "eta")
    val spec = graft.ops.HistogramOps.BinSpec(40, 1.659, 2.950)
    gaDetectors(spark)
      .map { case (v, sensors) =>
        val sparse = Acceptance.hitCountsKin(spark, p, sensors)
        graft.ops.HistogramOps.hist1d(sparse, col("eta"), spec)
          .select(lit(v).as("variant"), col("bin"),
            round(col("center"), 6).as("center"), col("n"))
      }
      .reduce(_ unionByName _)
  }

  /** SingleObjects.ipynb module pin (cells 3-6): the three module
    * prototypes at their exact notebook parameters, normalized to the
    * lower-left origin (`move_by(-x1, -y1)`), expanded to sensors
    * through the engine's real grid path (DeeTiling.sensors semantics
    * via explode + withCorners) and rolled up to outline extent,
    * sensor count, active area (cell 6's recorded 871.5 = half the
    * 2×2 module's 1743.0), and active-corner coordinate sums. Goldens
    * from a fresh shim run (dev/gen_so_golden.py). */
  private def soModules(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val specs = Seq(
      // name, module h (x-extent), module w, sensor sx/sy, grid nx/ny, distances
      ("module_large", 43.10, 56.50, 42.5, 22.0, 1, 2, 42.6, 22.5),
      ("module_new", 44.20, 56.50, 21.75, 22.0, 2, 2, 21.85, 22.5),
      ("module_small", 42.5 / 2 + 0.5 + 0.6, 56.50, 21.75, 22.0, 1, 2, 21.85, 22.5)
    ).toDF("name", "mh", "mw", "sx", "sy", "nx", "ny", "dx", "dy")
    val sens = specs
      // module center after origin normalization; 1-wide axes force
      // their distance to 0 (Module.__init__, ETL.py:220-221)
      .withColumn("x_mod", col("mh") / 2)
      .withColumn("y_mod", col("mw") / 2)
      .withColumn("ddx", when(col("nx") === 1, 0.0).otherwise(col("dx")))
      .withColumn("ddy", when(col("ny") === 1, 0.0).otherwise(col("dy")))
      .withColumn("ix", explode(sequence(lit(0), col("nx") - 1)))
      .withColumn("iy", explode(sequence(lit(0), col("ny") - 1)))
      .withColumn("x", (col("ix") * 2 - 1) * (col("ddx") / 2.0) + col("x_mod"))
      .withColumn("y", (col("iy") * 2 - 1) * (col("ddy") / 2.0) + col("y_mod"))
      // Sensor active corners, deadspace 0.5 (ETL.py:109-120 order)
      .withColumn("ax1", (col("x") - col("sx") / 2) + 0.5)
      .withColumn("ax2", (col("x") + col("sx") / 2) - 0.5)
      .withColumn("ay1", (col("y") - col("sy") / 2) + 0.5)
      .withColumn("ay2", (col("y") + col("sy") / 2) - 0.5)
    sens.groupBy("name")
      .agg(
        first(col("mh")).as("x2"),
        first(col("mw")).as("y2"),
        count(lit(1)).as("n_sensors"),
        round(sum((col("ax2") - col("ax1")) * (col("ay2") - col("ay1"))), 6).as("active_area"),
        round(sum(col("ax1") + col("ax2")), 6).as("sax_sum"),
        round(sum(col("ay1") + col("ay2")), 6).as("say_sum"))
  }

  /** SingleObjects.ipynb supermodule pin (cells 7-11): the 3-module
    * centered SuperModule (the notebook's recorded SM.x2 = 130.3) and
    * the 17-module `fromSuperModule` variant at the lower-left origin —
    * outline, component (RB/PB) y-extents, VTRX placement
    * (x = RB.x2 − 32.5, y = RB.y + 6, ETL.py:198-199), and total
    * active area, all as column arithmetic over the spec rows
    * replicating SuperModule.__init__ + centerModule/move_by
    * (ETL.py:312-423). Goldens from dev/gen_so_golden.py. */
  private def soSupermodules(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val specs = Seq(
      ("sm_large_3_centered", 3, "above", "centerModule"),
      ("sm_17_below_origin", 17, "below", "origin")
    ).toDF("name", "n", "orientation", "centering")
    val (mh, gap, mw, pbW, rbW) = (lit(43.10), lit(0.5), lit(56.5), lit(29.5), lit(56.5))
    val smH = mh * col("n") + gap * (col("n") - 1)
    val smW = mw + pbW
    // component centers with the SM at the origin (ETL.py:355-357)
    val rbY0 = when(col("orientation") === "above", -pbW / 2).otherwise(pbW / 2)
    val pbY0 = when(col("orientation") === "above", rbW / 2).otherwise(-rbW / 2)
    // centerModule (ETL.py:415-419) vs move_by(-x1, -y1)
    val shiftX = smH / 2
    val shiftY = when(col("centering") === "centerModule",
        when(col("orientation") === "above", smW / 2 - rbW / 2)
          .otherwise(smW / 2 - pbW - rbW / 2))
      .otherwise(smW / 2)
    val rbY = rbY0 + shiftY
    // per-module active area: n_sensor_y=2 sensors of 42.5 × 22 at deadspace 0.5
    val moduleActive = lit(2.0) * (lit(42.5) - 1.0) * (lit(22.0) - 1.0)
    specs.select(
      col("name"),
      col("n").cast("long").as("n_modules"),
      round(shiftX - smH / 2, 6).as("x1"),
      round(shiftX + smH / 2, 6).as("x2"),
      round(shiftY - smW / 2, 6).as("y1"),
      round(shiftY + smW / 2, 6).as("y2"),
      round(rbY - rbW / 2, 6).as("rb_y1"),
      round(rbY + rbW / 2, 6).as("rb_y2"),
      round(pbY0 + shiftY - pbW / 2, 6).as("pb_y1"),
      round(pbY0 + shiftY + pbW / 2, 6).as("pb_y2"),
      round(shiftX + smH / 2 - 32.5, 6).as("vtrx_x"),
      round(rbY + 6.0, 6).as("vtrx_y"),
      round(moduleActive * col("n"), 6).as("active_area"))
  }

  /** X6 module matrix: per-row covered-slot counts over the tiled
    * 'updated' layout (rows keyed by their y coordinate). */
  private def tilingMatrix(spark: SparkSession, dir: String): DataFrame =
    graft.ops.DeeTiling.tileUpdatedLayout(spark)
      .filter(col("kind") === "slot" && col("covered"))
      .groupBy(col("face"), round(col("y"), 3).as("y_row"))
      .agg(count(lit(1)).as("covered"))

  /** X6 module-matrix bitmap as a driver query: the groupBy-pivot
    * helper's row × col 0/1 grid for the first-layer face, flattened
    * to one bit-string per row (the reference's module_matrix print,
    * ETL.py:702-708, 805-806). */
  private def tilingBitmap(spark: SparkSession, dir: String): DataFrame = {
    val (_, cfg, first) = graft.ops.DeeTiling.referenceFaces().head
    val tiled = graft.ops.DeeTiling.tile(spark, cfg, graft.geom.Exclusion.updatedLayout(first))
    val m = graft.ops.DeeTiling.moduleMatrix(tiled)
    val bitCols = m.columns.filter(_ != "row").sortBy(_.toInt)
    m.select(
      col("row").cast("long").as("row"),
      concat(bitCols.map(c => col(s"`$c`").cast("string")): _*).as("bits"))
  }

  /** S5 round-trip as a driver query: export the 'new' database
    * through the nested-YAML sink, re-parse it with the S2 source, and
    * aggregate — the sums must equal the ones computed straight off
    * the original file (and match the literal golden), proving the
    * sink emits the exact database_new.yaml grammar. */
  private def yamlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_yaml").resolve("export.yaml").toString
    val centers = graft.io.LayoutYaml.read(spark, Layouts.resolveFixture("database_new.yaml"))
    graft.io.Sinks.writeLayoutYaml(centers, out)
    graft.io.LayoutYaml.read(spark, out)
      .groupBy("layout", "disk", "face")
      .agg(
        count(lit(1)).as("n_centers"),
        round(sum(abs(col("x"))), 3).as("sum_abs_x"),
        round(sum(abs(col("y"))), 3).as("sum_abs_y"))
  }

  /** S6 round-trip as a driver query: export the half-dee centers
    * through the mirrored-text sink, read the lines back, and
    * aggregate — x sums to exactly 0 (every center paired with its −x
    * mirror), the abs/y sums match the python-parsed database golden.
    * Double→string→double round-trips exactly (shortest repr). */
  private def mirrorRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_mirror").resolve("centers.txt").toString
    val half = Layouts.faceCenters(spark, "disk1", "back").filter(col("x") > 0)
    graft.io.Sinks.writeMirroredCenters(half, out)
    spark.read.text(out)
      .select(split(col("value"), ", ").as("p"))
      .select(
        element_at(col("p"), 1).cast("double").as("x"),
        element_at(col("p"), 2).cast("double").as("y"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum("x"), 6).as("sum_x"),
        round(sum(abs(col("x"))), 3).as("sum_abs_x"),
        round(sum("y"), 3).as("sum_y"))
  }

  /** S2 on the second layout database: TDR YAML parse cross-check. */
  private def tdrLayout(spark: SparkSession, dir: String): DataFrame =
    graft.io.LayoutYaml.read(spark, Layouts.resolveFixture("database_TDR.yaml"))
      .filter(col("layout") === "TDR")
      .groupBy("disk", "face")
      .agg(
        count(lit(1)).as("n_centers"),
        round(sum(abs(col("x"))), 3).as("sum_abs_x"),
        round(sum(abs(col("y"))), 3).as("sum_abs_y")
      )

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tdr_layout" -> (tdrLayout _),
    "yaml_roundtrip" -> (yamlRoundtrip _),
    "mirror_roundtrip" -> (mirrorRoundtrip _),
    "tiling_matrix" -> (tilingMatrix _),
    "tiling_bitmap" -> (tilingBitmap _),
    "tiled_acc_hist" -> (tiledAccHist _),
    "nb_tiling" -> (nbTiling _),
    "ga_variants" -> (gaVariants _),
    "ga_nhits" -> (gaNhits _),
    "ga_acc_hist" -> (gaAccHist _),
    "so_modules" -> (soModules _),
    "so_supermodules" -> (soSupermodules _),
    "nb_acc_hist" -> (nbAccHist _),
    "tiling_sensors" -> (tilingSensors _),
    "service_boards" -> (serviceBoards _),
    "a4_sm_occupancy" -> (a4SmOccupancy _),
    "o7_ladder_rings" -> (o7LadderRings _),
    "export_centers" -> (exportCenters _),
    "tiling_counts" -> (tilingCounts _),
    "tiling_variants" -> (tilingVariants _),
    "tiling_sizes" -> (tilingSizes _),
    "tiling_flavors" -> (tilingFlavors _),
    "ring_split" -> (ringSplit _),
    "ring_members" -> (ringMembers _),
    "minsplit_studies" -> (minsplitStudies _),
    "minsplit_hist" -> (minsplitHist _),
    "greedy_groups" -> (greedyGroups _),
    "acc_stats" -> (accStats _),
    "acc_hist" -> (accHist _),
    "s3_particles" -> (s3Particles _),
    "n3_sanity" -> (n3Sanity _),
    "run_compare" -> (runCompare _),
    "area_rollup" -> (areaRollup _),
    "acc_nhits_profile_eta" -> (accNhitsProfileEta _),
    "acc_nhits_profile_r" -> (accNhitsProfileR _),
    "acc_nhits_profile_phi" -> (accNhitsProfilePhi _),
    "acc_time_profile_eta" -> (accTimeProfileEta _),
    "acc_profile2d_rowsum" -> (accProfile2dRowsum _),
    "sm_counts" -> (smCounts _),
    "sm_counts_tdr" -> (smCountsTdr _),
    "sm_flavors" -> (smFlavors _),
    "total_current" -> (totalCurrent _),
    "etroc_hist" -> (etrocHist _),
    "bandwidth_tbps" -> (bandwidthTbps _),
    "bv_study" -> (bvStudy _)
  )

  val oracles: Map[String, String] = Map(
    // captured via GoldenDump from one run; reproducible across runs
    // and partitionings (pure per-row hash uniforms, order-free aggs)
    "s3_particles" ->
      """SELECT axis, bin::BIGINT AS bin, n::BIGINT AS n,
        |  v_min::DOUBLE AS v_min, v_max::DOUBLE AS v_max FROM (VALUES
        |  ('eta', 0, 4950, 1.659024044, 1.726044552),
        |  ('eta', 1, 5006, 1.726062136, 1.793098615),
        |  ('eta', 2, 4867, 1.793105328, 1.860148891),
        |  ('eta', 3, 4967, 1.86016198, 1.927197387),
        |  ('eta', 4, 5096, 1.92720586, 1.994241919),
        |  ('eta', 5, 4968, 1.994281224, 2.061275173),
        |  ('eta', 6, 4939, 2.061310934, 2.128340422),
        |  ('eta', 7, 4994, 2.128367537, 2.195339244),
        |  ('eta', 8, 5068, 2.195404727, 2.262449642),
        |  ('eta', 9, 5099, 2.26245093, 2.329457704),
        |  ('eta', 10, 4937, 2.329501481, 2.396538401),
        |  ('eta', 11, 5116, 2.396553402, 2.463576173),
        |  ('eta', 12, 4933, 2.463641383, 2.530649529),
        |  ('eta', 13, 4955, 2.53065113, 2.597697675),
        |  ('eta', 14, 5023, 2.597708977, 2.664749286),
        |  ('eta', 15, 4997, 2.664774898, 2.731779043),
        |  ('eta', 16, 5060, 2.731806802, 2.798842323),
        |  ('eta', 17, 5037, 2.798853539, 2.865887339),
        |  ('eta', 18, 4933, 2.865912337, 2.932946236),
        |  ('eta', 19, 5055, 2.932959535, 2.999997645),
        |  ('phi', 0, 5036, -1.570785853, -1.413730798),
        |  ('phi', 1, 5140, -1.413655459, -1.256654528),
        |  ('phi', 2, 5045, -1.256528396, -1.099599137),
        |  ('phi', 3, 4945, -1.099522284, -0.942480625),
        |  ('phi', 4, 4991, -0.942430592, -0.785447024),
        |  ('phi', 5, 4953, -0.785352402, -0.628336356),
        |  ('phi', 6, 5048, -0.6282321, -0.471271025),
        |  ('phi', 7, 4977, -0.471235104, -0.314163371),
        |  ('phi', 8, 4964, -0.314142897, -0.157110323),
        |  ('phi', 9, 5078, -0.157075423, -1.4054E-5),
        |  ('phi', 10, 4880, 7.164E-6, 0.15704452),
        |  ('phi', 11, 5092, 0.157147441, 0.314137035),
        |  ('phi', 12, 5004, 0.31417562, 0.471214203),
        |  ('phi', 13, 4866, 0.471252971, 0.62828878),
        |  ('phi', 14, 4918, 0.628323916, 0.785379794),
        |  ('phi', 15, 4876, 0.785421725, 0.942430039),
        |  ('phi', 16, 4994, 0.942481853, 1.099502567),
        |  ('phi', 17, 5049, 1.099624976, 1.256620445),
        |  ('phi', 18, 5049, 1.25665072, 1.413706193),
        |  ('phi', 19, 5095, 1.413761356, 1.570778266)
        |) t(axis, bin, n, v_min, v_max)""".stripMargin,
    // shim-run reference golden (tdr_golden.py): occupancy.py's
    // fromCenters + y-pairing + SuperModule placement over
    // database_TDR.yaml disk1/back with partition.getPartition
    "sm_counts_tdr" ->
      """SELECT n_sm::BIGINT AS n_sm, n_modules::BIGINT AS n_modules,
        |  n_sensors::BIGINT AS n_sensors, n_sm3::BIGINT AS n_sm3,
        |  n_sm6::BIGINT AS n_sm6, n_sm7::BIGINT AS n_sm7,
        |  sum_x::DOUBLE AS sum_x, sum_y::DOUBLE AS sum_y FROM (VALUES
        |  (84, 506, 1012, 12, 34, 38, 533204.6, -28625.41)
        |) t(n_sm, n_modules, n_sensors, n_sm3, n_sm6, n_sm7, sum_x, sum_y)""".stripMargin,
    // shim-run reference golden (n3_golden.py): dees[layer].intersect
    // over the first 20 n>=3 fixture events; flags re-sum to n_hits
    "n3_sanity" ->
      """SELECT event_id::BIGINT AS event_id, face, px::DOUBLE AS px,
        |  py::DOUBLE AS py, hit::BIGINT AS hit FROM (VALUES
        |  (221, 'face1', 66.968766, -532.989579, 1),
        |  (221, 'face2', 67.130607, -534.277637, 0),
        |  (221, 'face3', 67.471032, -536.987001, 1),
        |  (221, 'face4', 67.644034, -538.36389, 1),
        |  (379, 'face1', 57.51072, -794.003502, 1),
        |  (379, 'face2', 57.649704, -795.922343, 1),
        |  (379, 'face3', 57.94205, -799.958528, 0),
        |  (379, 'face4', 58.09062, -802.009704, 1),
        |  (397, 'face1', 185.015933, 622.971006, 1),
        |  (397, 'face2', 185.463055, 624.476519, 1),
        |  (397, 'face3', 186.403553, 627.643288, 0),
        |  (397, 'face4', 186.881511, 629.25263, 1),
        |  (620, 'face1', 238.730259, -879.976866, 1),
        |  (620, 'face2', 239.30719, -882.103477, 1),
        |  (620, 'face3', 240.520736, -886.576693, 0),
        |  (620, 'face4', 241.137455, -888.849966, 1),
        |  (625, 'face1', 56.43806, -703.560665, 1),
        |  (625, 'face2', 56.574452, -705.260937, 0),
        |  (625, 'face3', 56.861346, -708.83737, 1),
        |  (625, 'face4', 57.007144, -710.654902, 1),
        |  (696, 'face1', 345.903537, 708.730705, 1),
        |  (696, 'face2', 346.73947, 710.443471, 1),
        |  (696, 'face3', 348.497813, 714.046185, 0),
        |  (696, 'face4', 349.391398, 715.877073, 1),
        |  (776, 'face1', 320.634679, -794.235316, 1),
        |  (776, 'face2', 321.409547, -796.154718, 1),
        |  (776, 'face3', 323.03944, -800.192081, 0),
        |  (776, 'face4', 323.867746, -802.243855, 1),
        |  (1156, 'face1', 343.82734, 880.839595, 1),
        |  (1156, 'face2', 344.658256, 882.96829, 1),
        |  (1156, 'face3', 346.406045, 887.445892, 0),
        |  (1156, 'face4', 347.294266, 889.721394, 1),
        |  (1219, 'face1', 129.886474, -795.098393, 1),
        |  (1219, 'face2', 130.200366, -797.019881, 1),
        |  (1219, 'face3', 130.860622, -801.061631, 0),
        |  (1219, 'face4', 131.196162, -803.115635, 1),
        |  (1252, 'face1', 267.865498, 965.796148, 1),
        |  (1252, 'face2', 268.51284, 968.130155, 1),
        |  (1252, 'face3', 269.87449, 973.039619, 0),
        |  (1252, 'face4', 270.566475, 975.534592, 1),
        |  (1275, 'face1', 733.260567, -708.983407, 1),
        |  (1275, 'face2', 735.032613, -710.696783, 1),
        |  (1275, 'face3', 738.760021, -714.300782, 0),
        |  (1275, 'face4', 740.654277, -716.132323, 1),
        |  (1303, 'face1', 148.888908, 537.072849, 1),
        |  (1303, 'face2', 149.248723, 538.370775, 1),
        |  (1303, 'face3', 150.005575, 541.100896, 0),
        |  (1303, 'face4', 150.390204, 542.488334, 1),
        |  (1445, 'face1', 293.237199, 873.342787, 1),
        |  (1445, 'face2', 293.945856, 875.453366, 0),
        |  (1445, 'face3', 295.436478, 879.892858, 1),
        |  (1445, 'face4', 296.194007, 882.148994, 1),
        |  (1733, 'face1', 208.725826, -618.178277, 1),
        |  (1733, 'face2', 209.230247, -619.672207, 0),
        |  (1733, 'face3', 210.29127, -622.814614, 1),
        |  (1733, 'face4', 210.830478, -624.411574, 1),
        |  (2178, 'face1', 69.053806, -447.436572, 1),
        |  (2178, 'face2', 69.220686, -448.517877, 0),
        |  (2178, 'face3', 69.571709, -450.792346, 1),
        |  (2178, 'face4', 69.750098, -451.948224, 1),
        |  (2315, 'face1', 172.931282, 967.038587, 1),
        |  (2315, 'face2', 173.349199, 969.375597, 1),
        |  (2315, 'face3', 174.228266, 974.291377, 0),
        |  (2315, 'face4', 174.675006, 976.78956, 1),
        |  (3289, 'face1', 637.773662, 617.762157, 1),
        |  (3289, 'face2', 639.314948, 619.255082, 0),
        |  (3289, 'face3', 642.556964, 622.395373, 1),
        |  (3289, 'face4', 644.204546, 623.991258, 1),
        |  (3461, 'face1', 355.061032, 879.817675, 1),
        |  (3461, 'face2', 355.919096, 881.943901, 1),
        |  (3461, 'face3', 357.723989, 886.416308, 0),
        |  (3461, 'face4', 358.64123, 888.68917, 1),
        |  (3462, 'face1', 191.340461, 451.052638, 1),
        |  (3462, 'face2', 191.802867, 452.142682, 1),
        |  (3462, 'face3', 192.775514, 454.435533, 0),
        |  (3462, 'face4', 193.269811, 455.600752, 1),
        |  (3498, 'face1', 165.619263, 880.989708, 1),
        |  (3498, 'face2', 166.019509, 883.118767, 1),
        |  (3498, 'face3', 166.861407, 887.597131, 0),
        |  (3498, 'face4', 167.289257, 889.873021, 1)
        |) t(event_id, face, px, py, hit)""".stripMargin,
    "tdr_layout" ->
      """SELECT disk, face, n_centers::BIGINT AS n_centers,
        |  sum_abs_x::DOUBLE AS sum_abs_x, sum_abs_y::DOUBLE AS sum_abs_y FROM (VALUES
        |  ('disk1', 'back', 2024, 1066409.2, 1053692.82),
        |  ('disk1', 'front', 2020, 1061764.6, 1050864.0),
        |  ('disk2', 'back', 2024, 1066409.2, 1053692.82),
        |  ('disk2', 'front', 2020, 1061764.6, 1050864.0)
        |) t(disk, face, n_centers, sum_abs_x, sum_abs_y)""".stripMargin,
    "tiling_matrix" ->
      """SELECT face, y_row::DOUBLE AS y_row, covered::BIGINT AS covered FROM (VALUES
        |  ('face1', -1103.25, 3),
        |  ('face1', -1017.25, 9),
        |  ('face1', -931.25, 15),
        |  ('face1', -845.25, 17),
        |  ('face1', -759.25, 19),
        |  ('face1', -673.25, 21),
        |  ('face1', -587.25, 22),
        |  ('face1', -501.25, 23),
        |  ('face1', -415.25, 20),
        |  ('face1', -329.25, 19),
        |  ('face1', -243.25, 20),
        |  ('face1', -157.25, 18),
        |  ('face1', -71.25, 17),
        |  ('face1', 14.75, 16),
        |  ('face1', 100.75, 17),
        |  ('face1', 186.75, 18),
        |  ('face1', 272.75, 20),
        |  ('face1', 358.75, 19),
        |  ('face1', 444.75, 21),
        |  ('face1', 530.75, 23),
        |  ('face1', 616.75, 22),
        |  ('face1', 702.75, 20),
        |  ('face1', 788.75, 19),
        |  ('face1', 874.75, 17),
        |  ('face1', 960.75, 14),
        |  ('face1', 1046.75, 7),
        |  ('face2', -1060.25, 7),
        |  ('face2', -974.25, 13),
        |  ('face2', -888.25, 16),
        |  ('face2', -802.25, 18),
        |  ('face2', -716.25, 20),
        |  ('face2', -630.25, 22),
        |  ('face2', -544.25, 23),
        |  ('face2', -458.25, 22),
        |  ('face2', -372.25, 19),
        |  ('face2', -286.25, 22),
        |  ('face2', -200.25, 19),
        |  ('face2', -114.25, 18),
        |  ('face2', -28.25, 16),
        |  ('face2', 57.75, 16),
        |  ('face2', 143.75, 18),
        |  ('face2', 229.75, 19),
        |  ('face2', 315.75, 22),
        |  ('face2', 401.75, 19),
        |  ('face2', 487.75, 22),
        |  ('face2', 573.75, 23),
        |  ('face2', 659.75, 21),
        |  ('face2', 745.75, 20),
        |  ('face2', 831.75, 18),
        |  ('face2', 917.75, 15),
        |  ('face2', 1003.75, 10),
        |  ('face2', 1089.75, 3),
        |  ('face3', -1046.75, 7),
        |  ('face3', -960.75, 14),
        |  ('face3', -874.75, 17),
        |  ('face3', -788.75, 19),
        |  ('face3', -702.75, 20),
        |  ('face3', -616.75, 22),
        |  ('face3', -530.75, 23),
        |  ('face3', -444.75, 21),
        |  ('face3', -358.75, 19),
        |  ('face3', -272.75, 20),
        |  ('face3', -186.75, 19),
        |  ('face3', -100.75, 18),
        |  ('face3', -14.75, 16),
        |  ('face3', 71.25, 17),
        |  ('face3', 157.25, 19),
        |  ('face3', 243.25, 20),
        |  ('face3', 329.25, 20),
        |  ('face3', 415.25, 20),
        |  ('face3', 501.25, 23),
        |  ('face3', 587.25, 22),
        |  ('face3', 673.25, 21),
        |  ('face3', 759.25, 19),
        |  ('face3', 845.25, 17),
        |  ('face3', 931.25, 15),
        |  ('face3', 1017.25, 9),
        |  ('face3', 1103.25, 3),
        |  ('face4', -1089.75, 3),
        |  ('face4', -1003.75, 10),
        |  ('face4', -917.75, 15),
        |  ('face4', -831.75, 18),
        |  ('face4', -745.75, 20),
        |  ('face4', -659.75, 21),
        |  ('face4', -573.75, 23),
        |  ('face4', -487.75, 22),
        |  ('face4', -401.75, 19),
        |  ('face4', -315.75, 22),
        |  ('face4', -229.75, 19),
        |  ('face4', -143.75, 18),
        |  ('face4', -57.75, 16),
        |  ('face4', 28.25, 16),
        |  ('face4', 114.25, 18),
        |  ('face4', 200.25, 19),
        |  ('face4', 286.25, 22),
        |  ('face4', 372.25, 19),
        |  ('face4', 458.25, 22),
        |  ('face4', 544.25, 23),
        |  ('face4', 630.25, 22),
        |  ('face4', 716.25, 20),
        |  ('face4', 802.25, 18),
        |  ('face4', 888.25, 16),
        |  ('face4', 974.25, 13),
        |  ('face4', 1060.25, 7)) t(face, y_row, covered)""".stripMargin,
    "tiled_acc_hist" ->
      """SELECT n_hits::BIGINT AS n_hits, n::BIGINT AS n FROM (VALUES
        |  (0, 204120), (1, 236990), (2, 553319), (3, 5571)) t(n_hits, n)""".stripMargin,
    "tiling_sensors" ->
      """SELECT face, n_sensors::BIGINT AS n_sensors, sum_x::DOUBLE AS sum_x, sum_y::DOUBLE AS sum_y,
        |  sum_ax1::DOUBLE AS sum_ax1, sum_ay1::DOUBLE AS sum_ay1,
        |  sum_ax2::DOUBLE AS sum_ax2, sum_ay2::DOUBLE AS sum_ay2 FROM (VALUES
        |  ('face1', 1824, 939676.8, -26488.0, 921619.2, -44545.6, 957734.4, -8430.4),
        |  ('face2', 1844, 955266.2, -35260.0, 937010.6, -53515.6, 973521.8, -17004.4),
        |  ('face3', 1840, 943812.0, 27520.0, 925596.0, 9304.0, 962028.0, 45736.0),
        |  ('face4', 1844, 955266.2, 35260.0, 937010.6, 17004.4, 973521.8, 53515.6)) t(face, n_sensors, sum_x, sum_y, sum_ax1, sum_ay1, sum_ax2, sum_ay2)""".stripMargin,
    "service_boards" ->
      """SELECT face, n_sm::BIGINT AS n_sm, sum_rb_y::DOUBLE AS sum_rb_y, sum_pb_y::DOUBLE AS sum_pb_y,
        |  sum_vtrx_x::DOUBLE AS sum_vtrx_x, sum_vtrx_y::DOUBLE AS sum_vtrx_y,
        |  n_pb_rows::BIGINT AS n_pb_rows, sum_pb_split_x::DOUBLE AS sum_pb_split_x FROM (VALUES
        |  ('face1', 76, -3096.0, 172.0, 48937.6, -2640.0, 140, 75223.0),
        |  ('face2', 79, -645.0, 2752.0, 51173.4, -171.0, 145, 78025.35),
        |  ('face3', 76, 3096.0, -172.0, 48676.0, 3552.0, 141, 75601.85),
        |  ('face4', 79, 645.0, -2752.0, 51173.4, 1119.0, 145, 78025.35)) t(face, n_sm, sum_rb_y, sum_pb_y, sum_vtrx_x, sum_vtrx_y, n_pb_rows, sum_pb_split_x)""".stripMargin,
    "a4_sm_occupancy" ->
      """SELECT y_sm::DOUBLE AS y_sm, x_sm::DOUBLE AS x_sm, n_mod::BIGINT AS n_mod, occ::DOUBLE AS occ FROM (VALUES
        |  (1043.15, 245.55, 7, 0.191261),
        |  (957.45, 158.35, 7, 0.209221),
        |  (957.45, 441.75, 6, 0.194135),
        |  (871.75, 158.35, 7, 0.229228),
        |  (871.75, 441.75, 6, 0.208142),
        |  (871.75, 637.95, 3, 0.190037),
        |  (786.05, 136.55, 6, 0.25772),
        |  (786.05, 398.15, 6, 0.23107),
        |  (786.05, 659.75, 6, 0.198962),
        |  (700.35, 158.35, 7, 0.292296),
        |  (700.35, 463.55, 7, 0.243684),
        |  (700.35, 746.95, 6, 0.199379),
        |  (614.65, 158.35, 7, 0.343954),
        |  (614.65, 441.75, 6, 0.275189),
        |  (614.65, 703.35, 6, 0.217752),
        |  (614.65, 899.55, 3, 0.188246),
        |  (528.95, 158.35, 7, 0.420369),
        |  (528.95, 463.55, 7, 0.302858),
        |  (528.95, 746.95, 6, 0.222312),
        |  (528.95, 943.15, 3, 0.189299),
        |  (443.25, 158.35, 7, 0.539709),
        |  (443.25, 441.75, 6, 0.354794),
        |  (443.25, 703.35, 6, 0.246719),
        |  (443.25, 899.55, 3, 0.202222),
        |  (357.55, 419.95, 7, 0.431869),
        |  (357.55, 703.35, 6, 0.262172),
        |  (357.55, 899.55, 3, 0.208848),
        |  (271.85, 419.95, 7, 0.509605),
        |  (271.85, 703.35, 6, 0.276928),
        |  (271.85, 964.95, 6, 0.202953),
        |  (186.15, 441.75, 6, 0.542572),
        |  (186.15, 703.35, 6, 0.289421),
        |  (186.15, 964.95, 6, 0.206643),
        |  (100.45, 507.15, 7, 0.485975),
        |  (100.45, 812.35, 7, 0.251559),
        |  (100.45, 1030.35, 3, 0.195699),
        |  (14.75, 572.55, 6, 0.40323),
        |  (14.75, 834.15, 6, 0.244395),
        |  (14.75, 1030.35, 3, 0.196296),
        |  (-70.95, 572.55, 6, 0.396031),
        |  (-70.95, 834.15, 6, 0.242913),
        |  (-70.95, 1030.35, 3, 0.195699),
        |  (-156.65, 441.75, 6, 0.542572),
        |  (-156.65, 703.35, 6, 0.289421),
        |  (-156.65, 964.95, 6, 0.206643),
        |  (-242.35, 419.95, 7, 0.509605),
        |  (-242.35, 703.35, 6, 0.276928),
        |  (-242.35, 964.95, 6, 0.202953),
        |  (-328.05, 419.95, 7, 0.431869),
        |  (-328.05, 703.35, 6, 0.262172),
        |  (-328.05, 964.95, 6, 0.198244),
        |  (-413.75, 71.15, 3, 0.591931),
        |  (-413.75, 376.35, 7, 0.395413),
        |  (-413.75, 681.55, 7, 0.253976),
        |  (-413.75, 899.55, 3, 0.202222),
        |  (-499.45, 158.35, 7, 0.420369),
        |  (-499.45, 463.55, 7, 0.302858),
        |  (-499.45, 746.95, 6, 0.222312),
        |  (-499.45, 943.15, 3, 0.189299),
        |  (-585.15, 158.35, 7, 0.343954),
        |  (-585.15, 441.75, 6, 0.275189),
        |  (-585.15, 703.35, 6, 0.217752),
        |  (-585.15, 899.55, 3, 0.188246),
        |  (-670.85, 158.35, 7, 0.292296),
        |  (-670.85, 463.55, 7, 0.243684),
        |  (-670.85, 768.75, 7, 0.196807),
        |  (-756.55, 158.35, 7, 0.255848),
        |  (-756.55, 441.75, 6, 0.225578),
        |  (-756.55, 703.35, 6, 0.194145),
        |  (-842.25, 158.35, 7, 0.229228),
        |  (-842.25, 463.55, 7, 0.206115),
        |  (-842.25, 681.55, 3, 0.186203),
        |  (-927.95, 136.55, 6, 0.210103),
        |  (-927.95, 398.15, 6, 0.197023),
        |  (-927.95, 594.35, 3, 0.183536),
        |  (-1013.65, 245.55, 7, 0.191261),
        |  (-1013.65, 463.55, 3, 0.18174),
        |  (-1099.35, 201.95, 3, 0.181173)) t(y_sm, x_sm, n_mod, occ)""".stripMargin,
    "o7_ladder_rings" ->
      """SELECT ring::BIGINT AS ring, r_outer::DOUBLE AS r_outer, r_inner::DOUBLE AS r_inner FROM (VALUES
        |  (0, 1185.0, 704.741202),
        |  (1, 704.741202, 545.140948),
        |  (2, 545.140948, 466.27675),
        |  (3, 466.27675, 418.284632),
        |  (4, 418.284632, 384.926116),
        |  (5, 384.926116, 359.401149),
        |  (6, 359.401149, 338.328958),
        |  (7, 338.328958, 319.772614),
        |  (8, 319.772614, 315.0)) t(ring, r_outer, r_inner)""".stripMargin,
    "export_centers" ->
      """SELECT disk, face_name, n_centers::BIGINT AS n_centers, sum_x::DOUBLE AS sum_x, sum_y::DOUBLE AS sum_y FROM (VALUES
        |  ('disk1', 'front', 1804, 0.0, 15053.4),
        |  ('disk1', 'back', 1786, 752.7, 2056.8),
        |  ('disk2', 'front', 1804, 0.0, 15053.4),
        |  ('disk2', 'back', 1786, 752.7, 2056.8)
        |) t(disk, face_name, n_centers, sum_x, sum_y)""".stripMargin,
    "mirror_roundtrip" ->
      """SELECT 1788::BIGINT AS n_rows, 0.0::DOUBLE AS sum_x,
        |  940269.0::DOUBLE AS sum_abs_x, -42507.2::DOUBLE AS sum_y""".stripMargin,
    "yaml_roundtrip" ->
      """SELECT layout, disk, face, n_centers::BIGINT AS n_centers,
        |  sum_abs_x::DOUBLE AS sum_abs_x, sum_abs_y::DOUBLE AS sum_abs_y FROM (VALUES
        |  ('new', 'disk1', 'back', 1786, 939516.3, 922121.4),
        |  ('new', 'disk1', 'front', 1804, 951348.2, 943415.4),
        |  ('new', 'disk2', 'back', 1786, 939516.3, 922121.4),
        |  ('new', 'disk2', 'front', 1804, 951348.2, 943415.4)) t(layout, disk, face, n_centers, sum_abs_x, sum_abs_y)""".stripMargin,
    "tiling_bitmap" ->
      """SELECT row::BIGINT AS row, bits FROM (VALUES
        |  (0, '00000000000000000000000000000'),
        |  (1, '00000000000000000000000000000'),
        |  (2, '00111111100000000000000000000'),
        |  (3, '11111111111111000000000000000'),
        |  (4, '11111111111111111000000000000'),
        |  (5, '11111111111111111110000000000'),
        |  (6, '11111111111111111111000000000'),
        |  (7, '11111111111111111111110000000'),
        |  (8, '11111111111111111111111000000'),
        |  (9, '11111111111111111111100000000'),
        |  (10, '00111111111111111111100000000'),
        |  (11, '00000111111111111111111110000'),
        |  (12, '00000001111111111111111110000'),
        |  (13, '00000000111111111111111110000'),
        |  (14, '00000000011111111111111110000'),
        |  (15, '00000000111111111111111110000'),
        |  (16, '00000001111111111111111110000'),
        |  (17, '00000111111111111111111110000'),
        |  (18, '00011111111111111111110000000'),
        |  (19, '01111111111111111111100000000'),
        |  (20, '11111111111111111111111000000'),
        |  (21, '11111111111111111111110000000'),
        |  (22, '11111111111111111111100000000'),
        |  (23, '11111111111111111110000000000'),
        |  (24, '11111111111111111000000000000'),
        |  (25, '11111111111111100000000000000'),
        |  (26, '00111111111000000000000000000'),
        |  (27, '00111000000000000000000000000'),
        |  (28, '00000000000000000000000000000')) t(row, bits)""".stripMargin,
    "tiling_variants" ->
      """SELECT variant, face, n_sm::BIGINT AS n_sm, n_modules::BIGINT AS n_modules,
        |  sum_x::DOUBLE AS sum_x, sum_y::DOUBLE AS sum_y FROM (VALUES
        |  ('baseline', 'face1', 77, 444, 43019.55, -2390.25),
        |  ('baseline', 'face2', 78, 445, 43746.7, 892.5),
        |  ('baseline', 'face3', 77, 444, 43019.55, 2390.25),
        |  ('baseline', 'face4', 78, 445, 43746.7, -892.5),
        |  ('plain', 'face1', 82, 477, 46088.5, 263.5),
        |  ('plain', 'face2', 80, 478, 44874.0, -540.0),
        |  ('plain', 'face3', 82, 477, 46088.5, -263.5),
        |  ('plain', 'face4', 80, 478, 44874.0, 540.0),
        |  ('updated_seal', 'face1', 75, 454, 41750.25, -1043.75),
        |  ('updated_seal', 'face2', 77, 460, 43151.35, 1608.75),
        |  ('updated_seal', 'face3', 75, 458, 41488.65, 1043.75),
        |  ('updated_seal', 'face4', 77, 460, 43151.35, -1608.75),
        |  ('updated_noft', 'face1', 76, 462, 41834.6, -1975.0),
        |  ('updated_noft', 'face2', 79, 467, 44190.45, 520.25),
        |  ('updated_noft', 'face3', 76, 466, 41616.6, 1975.0),
        |  ('updated_noft', 'face4', 79, 467, 44190.45, -520.25)) t(variant, face, n_sm, n_modules, sum_x, sum_y)""".stripMargin,
    "so_modules" ->
      """SELECT name, x2::DOUBLE AS x2, y2::DOUBLE AS y2, n_sensors::BIGINT AS n_sensors,
        |  active_area::DOUBLE AS active_area, sax_sum::DOUBLE AS sax_sum, say_sum::DOUBLE AS say_sum
        |FROM (VALUES
        |  ('module_large', 43.1, 56.5, 2, 1743.0, 86.2, 113.0),
        |  ('module_new', 44.2, 56.5, 4, 1743.0, 176.8, 226.0),
        |  ('module_small', 22.35, 56.5, 2, 871.5, 44.7, 113.0)
        |) t(name, x2, y2, n_sensors, active_area, sax_sum, say_sum)""".stripMargin,
    "so_supermodules" ->
      """SELECT name, n_modules::BIGINT AS n_modules, x1::DOUBLE AS x1, x2::DOUBLE AS x2,
        |  y1::DOUBLE AS y1, y2::DOUBLE AS y2, rb_y1::DOUBLE AS rb_y1, rb_y2::DOUBLE AS rb_y2,
        |  pb_y1::DOUBLE AS pb_y1, pb_y2::DOUBLE AS pb_y2, vtrx_x::DOUBLE AS vtrx_x,
        |  vtrx_y::DOUBLE AS vtrx_y, active_area::DOUBLE AS active_area
        |FROM (VALUES
        |  ('sm_large_3_centered', 3, 0.0, 130.3, -28.25, 57.75, -28.25, 28.25, 28.25, 57.75, 97.8, 6.0, 5229.0),
        |  ('sm_17_below_origin', 17, 0.0, 740.7, 0.0, 86.0, 29.5, 86.0, 0.0, 29.5, 708.2, 63.75, 29631.0)
        |) t(name, n_modules, x1, x2, y1, y2, rb_y1, rb_y2, pb_y1, pb_y2, vtrx_x, vtrx_y, active_area)""".stripMargin,
    "ga_variants" ->
      """SELECT variant, dee, filled::BIGINT AS filled, available::BIGINT AS available FROM (VALUES
        |  ('large_sensor', 'D1', 497, 494),
        |  ('large_sensor', 'D2', 492, 490),
        |  ('large_sensor', 'D3', 497, 494),
        |  ('large_sensor', 'D4', 492, 490),
        |  ('small_sensor', 'D1', 484, 483),
        |  ('small_sensor', 'D2', 482, 481),
        |  ('small_sensor', 'D3', 484, 483),
        |  ('small_sensor', 'D4', 482, 481),
        |  ('small_sensor_v2', 'D1', 957, 958),
        |  ('small_sensor_v2', 'D2', 955, 955),
        |  ('small_sensor_v2', 'D3', 957, 958),
        |  ('small_sensor_v2', 'D4', 955, 955)
        |) t(variant, dee, filled, available)""".stripMargin,
    "ga_nhits" ->
      """SELECT variant, nhits::BIGINT AS nhits, n::BIGINT AS n FROM (VALUES
        |  ('TDR', 0, 10333),
        |  ('TDR', 1, 13622),
        |  ('TDR', 2, 72763),
        |  ('TDR', 3, 3212),
        |  ('TDR', 4, 70),
        |  ('large_sensor', 0, 10110),
        |  ('large_sensor', 1, 15613),
        |  ('large_sensor', 2, 71452),
        |  ('large_sensor', 3, 2790),
        |  ('large_sensor', 4, 35),
        |  ('small_sensor', 0, 10097),
        |  ('small_sensor', 1, 18858),
        |  ('small_sensor', 2, 68382),
        |  ('small_sensor', 3, 2627),
        |  ('small_sensor', 4, 36),
        |  ('new_layout', 0, 24689),
        |  ('new_layout', 1, 12083),
        |  ('new_layout', 2, 60120),
        |  ('new_layout', 3, 3068),
        |  ('new_layout', 4, 40)
        |) t(variant, nhits, n)""".stripMargin,
    "ga_acc_hist" ->
      """SELECT variant, bin::BIGINT AS bin, center::DOUBLE AS center, n::BIGINT AS n FROM (VALUES
        |  ('TDR', 0, 1.675138, 664),
        |  ('TDR', 1, 1.707413, 2181),
        |  ('TDR', 2, 1.739688, 2547),
        |  ('TDR', 3, 1.771963, 2454),
        |  ('TDR', 4, 1.804238, 2460),
        |  ('TDR', 5, 1.836513, 2453),
        |  ('TDR', 6, 1.868788, 2506),
        |  ('TDR', 7, 1.901063, 2419),
        |  ('TDR', 8, 1.933338, 2501),
        |  ('TDR', 9, 1.965613, 2460),
        |  ('TDR', 10, 1.997888, 2452),
        |  ('TDR', 11, 2.030163, 2479),
        |  ('TDR', 12, 2.062438, 2466),
        |  ('TDR', 13, 2.094713, 2546),
        |  ('TDR', 14, 2.126988, 2390),
        |  ('TDR', 15, 2.159263, 2333),
        |  ('TDR', 16, 2.191538, 2480),
        |  ('TDR', 17, 2.223813, 2439),
        |  ('TDR', 18, 2.256088, 2452),
        |  ('TDR', 19, 2.288363, 2410),
        |  ('TDR', 20, 2.320638, 2506),
        |  ('TDR', 21, 2.352913, 2468),
        |  ('TDR', 22, 2.385188, 2456),
        |  ('TDR', 23, 2.417463, 2399),
        |  ('TDR', 24, 2.449738, 2484),
        |  ('TDR', 25, 2.482013, 2440),
        |  ('TDR', 26, 2.514288, 2485),
        |  ('TDR', 27, 2.546563, 2451),
        |  ('TDR', 28, 2.578838, 2426),
        |  ('TDR', 29, 2.611113, 2404),
        |  ('TDR', 30, 2.643388, 2438),
        |  ('TDR', 31, 2.675663, 2458),
        |  ('TDR', 32, 2.707938, 2468),
        |  ('TDR', 33, 2.740213, 2423),
        |  ('TDR', 34, 2.772488, 2495),
        |  ('TDR', 35, 2.804763, 2271),
        |  ('TDR', 36, 2.837038, 1636),
        |  ('TDR', 37, 2.869313, 1000),
        |  ('TDR', 38, 2.901588, 633),
        |  ('TDR', 39, 2.933863, 234),
        |  ('large_sensor', 0, 1.675138, 356),
        |  ('large_sensor', 1, 1.707413, 2148),
        |  ('large_sensor', 2, 1.739688, 2540),
        |  ('large_sensor', 3, 1.771963, 2448),
        |  ('large_sensor', 4, 1.804238, 2472),
        |  ('large_sensor', 5, 1.836513, 2455),
        |  ('large_sensor', 6, 1.868788, 2500),
        |  ('large_sensor', 7, 1.901063, 2424),
        |  ('large_sensor', 8, 1.933338, 2498),
        |  ('large_sensor', 9, 1.965613, 2463),
        |  ('large_sensor', 10, 1.997888, 2454),
        |  ('large_sensor', 11, 2.030163, 2492),
        |  ('large_sensor', 12, 2.062438, 2460),
        |  ('large_sensor', 13, 2.094713, 2555),
        |  ('large_sensor', 14, 2.126988, 2401),
        |  ('large_sensor', 15, 2.159263, 2333),
        |  ('large_sensor', 16, 2.191538, 2478),
        |  ('large_sensor', 17, 2.223813, 2443),
        |  ('large_sensor', 18, 2.256088, 2453),
        |  ('large_sensor', 19, 2.288363, 2412),
        |  ('large_sensor', 20, 2.320638, 2508),
        |  ('large_sensor', 21, 2.352913, 2478),
        |  ('large_sensor', 22, 2.385188, 2447),
        |  ('large_sensor', 23, 2.417463, 2400),
        |  ('large_sensor', 24, 2.449738, 2489),
        |  ('large_sensor', 25, 2.482013, 2438),
        |  ('large_sensor', 26, 2.514288, 2491),
        |  ('large_sensor', 27, 2.546563, 2454),
        |  ('large_sensor', 28, 2.578838, 2427),
        |  ('large_sensor', 29, 2.611113, 2392),
        |  ('large_sensor', 30, 2.643388, 2438),
        |  ('large_sensor', 31, 2.675663, 2453),
        |  ('large_sensor', 32, 2.707938, 2467),
        |  ('large_sensor', 33, 2.740213, 2420),
        |  ('large_sensor', 34, 2.772488, 2492),
        |  ('large_sensor', 35, 2.804763, 2355),
        |  ('large_sensor', 36, 2.837038, 1839),
        |  ('large_sensor', 37, 2.869313, 1301),
        |  ('large_sensor', 38, 2.901588, 703),
        |  ('large_sensor', 39, 2.933863, 113),
        |  ('small_sensor', 0, 1.675138, 417),
        |  ('small_sensor', 1, 1.707413, 2075),
        |  ('small_sensor', 2, 1.739688, 2544),
        |  ('small_sensor', 3, 1.771963, 2440),
        |  ('small_sensor', 4, 1.804238, 2464),
        |  ('small_sensor', 5, 1.836513, 2447),
        |  ('small_sensor', 6, 1.868788, 2493),
        |  ('small_sensor', 7, 1.901063, 2405),
        |  ('small_sensor', 8, 1.933338, 2489),
        |  ('small_sensor', 9, 1.965613, 2449),
        |  ('small_sensor', 10, 1.997888, 2441),
        |  ('small_sensor', 11, 2.030163, 2494),
        |  ('small_sensor', 12, 2.062438, 2462),
        |  ('small_sensor', 13, 2.094713, 2541),
        |  ('small_sensor', 14, 2.126988, 2385),
        |  ('small_sensor', 15, 2.159263, 2327),
        |  ('small_sensor', 16, 2.191538, 2475),
        |  ('small_sensor', 17, 2.223813, 2431),
        |  ('small_sensor', 18, 2.256088, 2437),
        |  ('small_sensor', 19, 2.288363, 2409),
        |  ('small_sensor', 20, 2.320638, 2493),
        |  ('small_sensor', 21, 2.352913, 2474),
        |  ('small_sensor', 22, 2.385188, 2441),
        |  ('small_sensor', 23, 2.417463, 2401),
        |  ('small_sensor', 24, 2.449738, 2471),
        |  ('small_sensor', 25, 2.482013, 2429),
        |  ('small_sensor', 26, 2.514288, 2483),
        |  ('small_sensor', 27, 2.546563, 2453),
        |  ('small_sensor', 28, 2.578838, 2424),
        |  ('small_sensor', 29, 2.611113, 2383),
        |  ('small_sensor', 30, 2.643388, 2454),
        |  ('small_sensor', 31, 2.675663, 2444),
        |  ('small_sensor', 32, 2.707938, 2444),
        |  ('small_sensor', 33, 2.740213, 2405),
        |  ('small_sensor', 34, 2.772488, 2483),
        |  ('small_sensor', 35, 2.804763, 2269),
        |  ('small_sensor', 36, 2.837038, 1892),
        |  ('small_sensor', 37, 2.869313, 1395),
        |  ('small_sensor', 38, 2.901588, 801),
        |  ('small_sensor', 39, 2.933863, 239),
        |  ('new_layout', 0, 1.675138, 94),
        |  ('new_layout', 1, 1.707413, 1027),
        |  ('new_layout', 2, 1.739688, 2097),
        |  ('new_layout', 3, 1.771963, 2203),
        |  ('new_layout', 4, 1.804238, 2342),
        |  ('new_layout', 5, 1.836513, 2453),
        |  ('new_layout', 6, 1.868788, 2506),
        |  ('new_layout', 7, 1.901063, 2419),
        |  ('new_layout', 8, 1.933338, 2501),
        |  ('new_layout', 9, 1.965613, 2462),
        |  ('new_layout', 10, 1.997888, 2451),
        |  ('new_layout', 11, 2.030163, 2479),
        |  ('new_layout', 12, 2.062438, 2466),
        |  ('new_layout', 13, 2.094713, 2544),
        |  ('new_layout', 14, 2.126988, 2392),
        |  ('new_layout', 15, 2.159263, 2330),
        |  ('new_layout', 16, 2.191538, 2478),
        |  ('new_layout', 17, 2.223813, 2440),
        |  ('new_layout', 18, 2.256088, 2452),
        |  ('new_layout', 19, 2.288363, 2409),
        |  ('new_layout', 20, 2.320638, 2506),
        |  ('new_layout', 21, 2.352913, 2466),
        |  ('new_layout', 22, 2.385188, 2455),
        |  ('new_layout', 23, 2.417463, 2400),
        |  ('new_layout', 24, 2.449738, 2483),
        |  ('new_layout', 25, 2.482013, 2438),
        |  ('new_layout', 26, 2.514288, 2431),
        |  ('new_layout', 27, 2.546563, 2294),
        |  ('new_layout', 28, 2.578838, 2165),
        |  ('new_layout', 29, 2.611113, 1953),
        |  ('new_layout', 30, 2.643388, 1624),
        |  ('new_layout', 31, 2.675663, 1514),
        |  ('new_layout', 32, 2.707938, 1320),
        |  ('new_layout', 33, 2.740213, 1201),
        |  ('new_layout', 34, 2.772488, 955),
        |  ('new_layout', 35, 2.804763, 449),
        |  ('new_layout', 36, 2.837038, 105),
        |  ('new_layout', 37, 2.869313, 7)
        |) t(variant, bin, center, n)""".stripMargin,
    "nb_tiling" ->
      """SELECT face, n_sm::BIGINT AS n_sm, n_modules::BIGINT AS n_modules FROM (VALUES
        |  ('disk1_front', 80, 484),
        |  ('disk1_back', 79, 482),
        |  ('disk2_front', 80, 484),
        |  ('disk2_back', 79, 482)) t(face, n_sm, n_modules)""".stripMargin,
    "nb_acc_hist" ->
      """SELECT bin::BIGINT AS bin, center::DOUBLE AS center, n::BIGINT AS n FROM (VALUES
        |  (0, 1.675138, 434),
        |  (1, 1.707413, 2105),
        |  (2, 1.739688, 2544),
        |  (3, 1.771963, 2438),
        |  (4, 1.804238, 2460),
        |  (5, 1.836513, 2442),
        |  (6, 1.868788, 2501),
        |  (7, 1.901063, 2407),
        |  (8, 1.933338, 2490),
        |  (9, 1.965613, 2450),
        |  (10, 1.997888, 2445),
        |  (11, 2.030163, 2492),
        |  (12, 2.062438, 2460),
        |  (13, 2.094713, 2541),
        |  (14, 2.126988, 2388),
        |  (15, 2.159263, 2333),
        |  (16, 2.191538, 2473),
        |  (17, 2.223813, 2433),
        |  (18, 2.256088, 2435),
        |  (19, 2.288363, 2403),
        |  (20, 2.320638, 2494),
        |  (21, 2.352913, 2477),
        |  (22, 2.385188, 2441),
        |  (23, 2.417463, 2398),
        |  (24, 2.449738, 2472),
        |  (25, 2.482013, 2433),
        |  (26, 2.514288, 2479),
        |  (27, 2.546563, 2454),
        |  (28, 2.578838, 2423),
        |  (29, 2.611113, 2385),
        |  (30, 2.643388, 2452),
        |  (31, 2.675663, 2445),
        |  (32, 2.707938, 2445),
        |  (33, 2.740213, 2406),
        |  (34, 2.772488, 2482),
        |  (35, 2.804763, 2266),
        |  (36, 2.837038, 1884),
        |  (37, 2.869313, 1390),
        |  (38, 2.901588, 791),
        |  (39, 2.933863, 227)
        |) t(bin, center, n)""".stripMargin,
    "tiling_sizes" ->
      """SELECT size, face, n_sm::BIGINT AS n_sm, n_modules::BIGINT AS n_modules,
        |  n3::BIGINT AS n3, n6::BIGINT AS n6, n7::BIGINT AS n7,
        |  sum_x::DOUBLE AS sum_x, sum_y::DOUBLE AS sum_y FROM (VALUES
        |  ('M', 'face1', 74, 442, 13, 24, 37, 40758.1, -1697.5),
        |  ('M', 'face2', 75, 447, 12, 30, 33, 40698.95, 1541.75),
        |  ('M', 'face3', 74, 445, 11, 29, 34, 40245.2, 1697.5),
        |  ('M', 'face4', 75, 447, 12, 30, 33, 40698.95, -1541.75),
        |  ('L', 'face1', 74, 442, 13, 24, 37, 40844.5, -1697.5),
        |  ('L', 'face2', 75, 447, 12, 30, 33, 40785.15, 1541.75),
        |  ('L', 'face3', 74, 445, 11, 29, 34, 40330.45, 1697.5),
        |  ('L', 'face4', 75, 447, 12, 30, 33, 40785.15, -1541.75)
        |) t(size, face, n_sm, n_modules, n3, n6, n7, sum_x, sum_y)""".stripMargin,
    "tiling_counts" ->
      """SELECT face, n_sm::BIGINT AS n_sm, n_modules::BIGINT AS n_modules FROM (VALUES
        |  ('face1', 76, 456),
        |  ('face2', 79, 461),
        |  ('face3', 76, 460),
        |  ('face4', 79, 461)) t(face, n_sm, n_modules)""".stripMargin,
    "tiling_flavors" ->
      """SELECT face, n_mod::BIGINT AS n_mod, n_sm::BIGINT AS n_sm FROM (VALUES
        |  ('face1', 3, 12),
        |  ('face1', 6, 28),
        |  ('face1', 7, 36),
        |  ('face2', 3, 13),
        |  ('face2', 6, 40),
        |  ('face2', 7, 26),
        |  ('face3', 3, 11),
        |  ('face3', 6, 28),
        |  ('face3', 7, 37),
        |  ('face4', 3, 13),
        |  ('face4', 6, 40),
        |  ('face4', 7, 26)) t(face, n_mod, n_sm)""".stripMargin,
    "ring_members" ->
      """SELECT row_idx::BIGINT AS row_idx, sm_seq::BIGINT AS sm_seq, n_mod::BIGINT AS n_mod,
        |  y_row::DOUBLE AS y_row, ring FROM (VALUES
        |  (0, 0, 7, 1028.4, 'outer'),
        |  (1, 0, 7, 942.7, 'middle'),
        |  (1, 1, 6, 942.7, 'outer'),
        |  (2, 0, 7, 857.0, 'middle'),
        |  (2, 1, 6, 857.0, 'middle'),
        |  (2, 2, 3, 857.0, 'outer'),
        |  (3, 0, 6, 771.3, 'middle'),
        |  (3, 1, 6, 771.3, 'middle'),
        |  (3, 2, 6, 771.3, 'outer'),
        |  (4, 0, 7, 685.6, 'middle'),
        |  (4, 1, 7, 685.6, 'middle'),
        |  (4, 2, 6, 685.6, 'outer'),
        |  (5, 0, 7, 599.9, 'inner'),
        |  (5, 1, 6, 599.9, 'middle'),
        |  (5, 2, 6, 599.9, 'middle'),
        |  (5, 3, 3, 599.9, 'outer'),
        |  (6, 0, 7, 514.2, 'inner'),
        |  (6, 1, 7, 514.2, 'inner'),
        |  (6, 2, 6, 514.2, 'middle'),
        |  (6, 3, 3, 514.2, 'outer'),
        |  (7, 0, 7, 428.5, 'inner'),
        |  (7, 1, 6, 428.5, 'inner'),
        |  (7, 2, 6, 428.5, 'middle'),
        |  (7, 3, 3, 428.5, 'outer'),
        |  (8, 0, 7, 342.8, 'inner'),
        |  (8, 1, 6, 342.8, 'middle'),
        |  (8, 2, 3, 342.8, 'outer'),
        |  (9, 0, 7, 257.1, 'inner'),
        |  (9, 1, 6, 257.1, 'middle'),
        |  (9, 2, 6, 257.1, 'outer'),
        |  (10, 0, 6, 171.4, 'inner'),
        |  (10, 1, 6, 171.4, 'middle'),
        |  (10, 2, 6, 171.4, 'outer'),
        |  (11, 0, 7, 85.7, 'inner'),
        |  (11, 1, 7, 85.7, 'middle'),
        |  (11, 2, 3, 85.7, 'outer'),
        |  (12, 0, 6, 0.0, 'inner'),
        |  (12, 1, 6, 0.0, 'middle'),
        |  (12, 2, 3, 0.0, 'outer'),
        |  (13, 0, 6, -85.7, 'inner'),
        |  (13, 1, 6, -85.7, 'middle'),
        |  (13, 2, 3, -85.7, 'outer'),
        |  (14, 0, 6, -171.4, 'inner'),
        |  (14, 1, 6, -171.4, 'middle'),
        |  (14, 2, 6, -171.4, 'outer'),
        |  (15, 0, 7, -257.1, 'inner'),
        |  (15, 1, 6, -257.1, 'middle'),
        |  (15, 2, 6, -257.1, 'outer'),
        |  (16, 0, 7, -342.8, 'inner'),
        |  (16, 1, 6, -342.8, 'middle'),
        |  (16, 2, 6, -342.8, 'outer'),
        |  (17, 0, 3, -428.5, 'inner'),
        |  (17, 1, 7, -428.5, 'inner'),
        |  (17, 2, 7, -428.5, 'middle'),
        |  (17, 3, 3, -428.5, 'outer'),
        |  (18, 0, 7, -514.2, 'inner'),
        |  (18, 1, 7, -514.2, 'inner'),
        |  (18, 2, 6, -514.2, 'middle'),
        |  (18, 3, 3, -514.2, 'outer'),
        |  (19, 0, 7, -599.9, 'inner'),
        |  (19, 1, 6, -599.9, 'inner'),
        |  (19, 2, 6, -599.9, 'middle'),
        |  (19, 3, 3, -599.9, 'outer'),
        |  (20, 0, 7, -685.6, 'middle'),
        |  (20, 1, 7, -685.6, 'middle'),
        |  (20, 2, 7, -685.6, 'outer'),
        |  (21, 0, 7, -771.3, 'middle'),
        |  (21, 1, 6, -771.3, 'middle'),
        |  (21, 2, 6, -771.3, 'outer'),
        |  (22, 0, 7, -857.0, 'middle'),
        |  (22, 1, 7, -857.0, 'middle'),
        |  (22, 2, 3, -857.0, 'outer'),
        |  (23, 0, 6, -942.7, 'middle'),
        |  (23, 1, 6, -942.7, 'middle'),
        |  (23, 2, 3, -942.7, 'outer'),
        |  (24, 0, 7, -1028.4, 'middle'),
        |  (24, 1, 3, -1028.4, 'outer'),
        |  (25, 0, 3, -1114.1, 'outer')) t(row_idx, sm_seq, n_mod, y_row, ring)""".stripMargin,
    "ring_split" ->
      """SELECT ring, n_sm::BIGINT AS n_sm, n_modules::BIGINT AS n_modules FROM (VALUES
        |  ('inner', 20, 130), ('middle', 32, 204), ('outer', 26, 113)) t(ring, n_sm, n_modules)""".stripMargin,
    "minsplit_studies" ->
      """SELECT study, leads::BIGINT AS leads, channels::BIGINT AS channels,
        |  n_fbk::BIGINT AS n_fbk, n_hpk::BIGINT AS n_hpk FROM (VALUES
        |  ('realistic_5fC_minsplit2', 304, 226, 334, 113),
        |  ('realistic_10fC_minsplit3', 326, 248, 130, 317),
        |  ('realistic_10fC_minsplit1', 221, 143, 130, 317)) t(study, leads, channels, n_fbk, n_hpk)""".stripMargin,
    "minsplit_hist" ->
      """SELECT study, bin::BIGINT AS bin, center::DOUBLE AS center, n::BIGINT AS n FROM (VALUES
        |  ('realistic_5fC_minsplit2', 0, 1.25, 107),
        |  ('realistic_5fC_minsplit2', 1, 3.75, 101),
        |  ('realistic_5fC_minsplit2', 2, 6.25, 18),
        |  ('realistic_10fC_minsplit3', 0, 1.25, 79),
        |  ('realistic_10fC_minsplit3', 1, 3.75, 164),
        |  ('realistic_10fC_minsplit3', 2, 6.25, 5),
        |  ('realistic_10fC_minsplit1', 0, 1.25, 31),
        |  ('realistic_10fC_minsplit1', 1, 3.75, 69),
        |  ('realistic_10fC_minsplit1', 2, 6.25, 13),
        |  ('realistic_10fC_minsplit1', 3, 8.75, 18),
        |  ('realistic_10fC_minsplit1', 4, 11.25, 12)
        |) t(study, bin, center, n)""".stripMargin,
    "greedy_groups" ->
      """SELECT vendor, grp::BIGINT AS grp, n_mods::BIGINT AS n_mods,
        |  group_current::DOUBLE AS group_current FROM (VALUES
        |  ('hpk', 0, 12, 18.636836),
        |  ('hpk', 1, 12, 18.659974),
        |  ('hpk', 2, 12, 18.67682),
        |  ('hpk', 3, 12, 18.692924),
        |  ('hpk', 4, 12, 18.71139),
        |  ('hpk', 5, 12, 18.727599),
        |  ('hpk', 6, 12, 18.740624),
        |  ('hpk', 7, 12, 18.769268),
        |  ('hpk', 8, 12, 18.786027),
        |  ('hpk', 9, 12, 18.814342),
        |  ('hpk', 10, 12, 18.838136),
        |  ('hpk', 11, 12, 18.859022),
        |  ('hpk', 12, 12, 18.87961),
        |  ('hpk', 13, 12, 18.91511),
        |  ('hpk', 14, 12, 18.950091),
        |  ('hpk', 15, 12, 18.989994),
        |  ('hpk', 16, 12, 19.019259),
        |  ('hpk', 17, 12, 19.056368),
        |  ('hpk', 18, 12, 19.094266),
        |  ('hpk', 19, 12, 19.15681),
        |  ('hpk', 20, 12, 19.20404),
        |  ('hpk', 21, 12, 19.26412),
        |  ('hpk', 22, 12, 19.3103),
        |  ('hpk', 23, 12, 19.383094),
        |  ('hpk', 24, 12, 19.464216),
        |  ('hpk', 25, 12, 19.555619),
        |  ('hpk', 26, 12, 19.631438),
        |  ('hpk', 27, 12, 19.718725),
        |  ('hpk', 28, 12, 19.859563),
        |  ('hpk', 29, 7, 11.646982),
        |  ('hpk', 30, 11, 18.392618),
        |  ('hpk', 31, 8, 13.426387),
        |  ('hpk', 32, 4, 6.759426),
        |  ('hpk', 33, 6, 10.165368),
        |  ('hpk', 34, 5, 8.520277),
        |  ('fbk', 0, 11, 18.876288),
        |  ('fbk', 1, 11, 19.045319),
        |  ('fbk', 2, 9, 15.763177),
        |  ('fbk', 3, 5, 8.867742),
        |  ('fbk', 4, 8, 14.326463),
        |  ('fbk', 5, 5, 9.060574),
        |  ('fbk', 6, 2, 3.649322),
        |  ('fbk', 7, 2, 3.666471),
        |  ('fbk', 8, 1, 1.869841),
        |  ('fbk', 9, 2, 3.740765),
        |  ('fbk', 10, 1, 1.88889),
        |  ('fbk', 11, 1, 1.88889)) t(vendor, grp, n_mods, group_current)""".stripMargin,
    "acc_stats" ->
      """SELECT 1.359462::DOUBLE AS mean_nhits, 0.72338::DOUBLE AS frac_ge1,
        |  0.606608::DOUBLE AS frac_ge2, 1000000::BIGINT AS n_events""".stripMargin,
    "acc_hist" ->
      """SELECT n_hits::BIGINT AS n_hits, n::BIGINT AS n FROM (VALUES
        |  (0, 276620), (1, 116772), (2, 577514), (3, 28714), (4, 380)) t(n_hits, n)""".stripMargin,
    "area_rollup" ->
      """SELECT level, n_entities::BIGINT AS n_entities, total_area::DOUBLE AS total_area FROM (VALUES
        |  ('sensor', 894, 779121.0),
        |  ('module', 447, 779121.0),
        |  ('sm', 78, 779121.0),
        |  ('dee', 1, 779121.0)) t(level, n_entities, total_area)""".stripMargin,
    "run_compare" ->
      """SELECT bin::BIGINT AS bin, center::DOUBLE AS center, mean_updated::DOUBLE AS mean_updated,
        |  mean_plain::DOUBLE AS mean_plain, delta::DOUBLE AS delta FROM (VALUES
        |  (0, 1.675763, 0.052905, 0.082251, -0.029347),
        |  (1, 1.709288, 0.725011, 1.012094, -0.287083),
        |  (2, 1.742813, 1.325564, 1.623134, -0.29757),
        |  (3, 1.776338, 1.429146, 1.669028, -0.239882),
        |  (4, 1.809863, 1.512258, 1.65798, -0.145722),
        |  (5, 1.843388, 1.652488, 1.680966, -0.028477),
        |  (6, 1.876913, 1.655074, 1.655074, 0.0),
        |  (7, 1.910438, 1.661743, 1.661743, 0.0),
        |  (8, 1.943963, 1.6841, 1.6841, 0.0),
        |  (9, 1.977488, 1.650211, 1.650211, 0.0),
        |  (10, 2.011013, 1.670773, 1.670773, 0.0),
        |  (11, 2.044538, 1.680505, 1.680505, 0.0),
        |  (12, 2.078063, 1.648565, 1.648565, 0.0),
        |  (13, 2.111588, 1.649884, 1.649884, 0.0),
        |  (14, 2.145113, 1.682593, 1.682593, 0.0),
        |  (15, 2.178638, 1.634882, 1.634882, 0.0),
        |  (16, 2.212163, 1.66672, 1.66672, 0.0),
        |  (17, 2.245688, 1.656516, 1.656516, 0.0),
        |  (18, 2.279213, 1.67568, 1.67568, 0.0),
        |  (19, 2.312738, 1.642608, 1.642608, 0.0),
        |  (20, 2.346263, 1.665894, 1.665894, 0.0),
        |  (21, 2.379788, 1.655564, 1.655564, 0.0),
        |  (22, 2.413313, 1.684911, 1.684911, 0.0),
        |  (23, 2.446838, 1.646751, 1.646751, 0.0),
        |  (24, 2.480363, 1.652691, 1.652691, 0.0),
        |  (25, 2.513888, 1.660873, 1.660873, 0.0),
        |  (26, 2.547413, 1.638992, 1.638992, 0.0),
        |  (27, 2.580938, 1.681982, 1.6883, -0.006318),
        |  (28, 2.614463, 1.600907, 1.658132, -0.057225),
        |  (29, 2.647988, 1.57928, 1.62836, -0.049081),
        |  (30, 2.681513, 1.536213, 1.653046, -0.116832),
        |  (31, 2.715038, 1.32326, 1.579686, -0.256426),
        |  (32, 2.748563, 1.213115, 1.40061, -0.187495),
        |  (33, 2.782088, 1.18411, 0.947449, 0.236661),
        |  (34, 2.815613, 1.04571, 0.376744, 0.668966),
        |  (35, 2.849138, 0.837193, 0.019191, 0.818002),
        |  (36, 2.882663, 0.529261, 0.0, 0.529261),
        |  (37, 2.916188, 0.234159, 0.0, 0.234159),
        |  (38, 2.949713, 0.075601, 0.0, 0.075601),
        |  (39, 2.983238, 0.001674, 0.0, 0.001674)) t(bin, center, mean_updated, mean_plain, delta)""".stripMargin,
    "acc_nhits_profile_r" ->
      """SELECT bin::BIGINT AS bin, center::DOUBLE AS center, mean_n::DOUBLE AS mean_n, n_events::BIGINT AS n_events FROM (VALUES
        |  (0, 311.0625, 0.048895, 53032),
        |  (1, 333.1875, 0.423029, 48921),
        |  (2, 355.3125, 0.954067, 46307),
        |  (3, 377.4375, 1.193744, 43382),
        |  (4, 399.5625, 1.333699, 40971),
        |  (5, 421.6875, 1.577145, 38862),
        |  (6, 443.8125, 1.619745, 36657),
        |  (7, 465.9375, 1.656563, 35168),
        |  (8, 488.0625, 1.66291, 33454),
        |  (9, 510.1875, 1.643065, 31947),
        |  (10, 532.3125, 1.672057, 30484),
        |  (11, 554.4375, 1.658259, 29218),
        |  (12, 576.5625, 1.669965, 28294),
        |  (13, 598.6875, 1.644727, 26892),
        |  (14, 620.8125, 1.676738, 26378),
        |  (15, 642.9375, 1.657022, 24850),
        |  (16, 665.0625, 1.665711, 24069),
        |  (17, 687.1875, 1.63526, 23318),
        |  (18, 709.3125, 1.68114, 22593),
        |  (19, 731.4375, 1.651102, 22015),
        |  (20, 753.5625, 1.662266, 21286),
        |  (21, 775.6875, 1.645379, 20560),
        |  (22, 797.8125, 1.689553, 19997),
        |  (23, 819.9375, 1.666031, 19403),
        |  (24, 842.0625, 1.661825, 19002),
        |  (25, 864.1875, 1.652413, 18381),
        |  (26, 886.3125, 1.68756, 17789),
        |  (27, 908.4375, 1.663495, 17444),
        |  (28, 930.5625, 1.666236, 17015),
        |  (29, 952.6875, 1.657288, 16527),
        |  (30, 974.8125, 1.654042, 15921),
        |  (31, 996.9375, 1.572502, 15710),
        |  (32, 1019.0625, 1.455936, 15103),
        |  (33, 1041.1875, 1.4167, 15078),
        |  (34, 1063.3125, 1.437882, 14714),
        |  (35, 1085.4375, 1.329329, 14317),
        |  (36, 1107.5625, 1.027088, 13844),
        |  (37, 1129.6875, 0.589258, 13461),
        |  (38, 1151.8125, 0.129662, 13273),
        |  (39, 1173.9375, 0.002459, 13012)) t(bin, center, mean_n, n_events)""".stripMargin,
    "acc_nhits_profile_eta" ->
      """SELECT bin::BIGINT AS bin, center::DOUBLE AS center, mean_n::DOUBLE AS mean_n, n_events::BIGINT AS n_events FROM (VALUES
        |  (0, 1.675763, 0.052905, 24875),
        |  (1, 1.709288, 0.725011, 24641),
        |  (2, 1.742813, 1.325564, 25184),
        |  (3, 1.776338, 1.429146, 25129),
        |  (4, 1.809863, 1.512258, 24636),
        |  (5, 1.843388, 1.652488, 24897),
        |  (6, 1.876913, 1.655074, 25101),
        |  (7, 1.910438, 1.661743, 24913),
        |  (8, 1.943963, 1.6841, 25144),
        |  (9, 1.977488, 1.650211, 25138),
        |  (10, 2.011013, 1.670773, 25004),
        |  (11, 2.044538, 1.680505, 24858),
        |  (12, 2.078063, 1.648565, 25154),
        |  (13, 2.111588, 1.649884, 25046),
        |  (14, 2.145113, 1.682593, 24990),
        |  (15, 2.178638, 1.634882, 24907),
        |  (16, 2.212163, 1.66672, 24847),
        |  (17, 2.245688, 1.656516, 24761),
        |  (18, 2.279213, 1.67568, 25333),
        |  (19, 2.312738, 1.642608, 24925),
        |  (20, 2.346263, 1.665894, 25007),
        |  (21, 2.379788, 1.655564, 24948),
        |  (22, 2.413313, 1.684911, 25031),
        |  (23, 2.446838, 1.646751, 25005),
        |  (24, 2.480363, 1.652691, 25162),
        |  (25, 2.513888, 1.660873, 25141),
        |  (26, 2.547413, 1.638992, 25005),
        |  (27, 2.580938, 1.681982, 25008),
        |  (28, 2.614463, 1.600907, 24919),
        |  (29, 2.647988, 1.57928, 25183),
        |  (30, 2.681513, 1.536213, 24839),
        |  (31, 2.715038, 1.32326, 25017),
        |  (32, 2.748563, 1.213115, 25254),
        |  (33, 2.782088, 1.18411, 24871),
        |  (34, 2.815613, 1.04571, 24940),
        |  (35, 2.849138, 0.837193, 25220),
        |  (36, 2.882663, 0.529261, 24657),
        |  (37, 2.916188, 0.234159, 25030),
        |  (38, 2.949713, 0.075601, 25185),
        |  (39, 2.983238, 0.001674, 25095)) t(bin, center, mean_n, n_events)""".stripMargin,
    "acc_nhits_profile_phi" ->
      """SELECT bin::BIGINT AS bin, center::DOUBLE AS center, mean_n::DOUBLE AS mean_n, n_events::BIGINT AS n_events FROM (VALUES
        |  (0, -1.531526, 0.851308, 25119),
        |  (1, -1.452987, 1.174388, 25168),
        |  (2, -1.374447, 1.197644, 25207),
        |  (3, -1.295907, 1.338495, 24541),
        |  (4, -1.217367, 1.379378, 24867),
        |  (5, -1.138827, 1.482596, 24965),
        |  (6, -1.060288, 1.528476, 24951),
        |  (7, -0.981748, 1.48805, 25020),
        |  (8, -0.903208, 1.42306, 25065),
        |  (9, -0.824668, 1.488366, 25098),
        |  (10, -0.746128, 1.449603, 25051),
        |  (11, -0.667588, 1.452445, 25234),
        |  (12, -0.589049, 1.491245, 25071),
        |  (13, -0.510509, 1.488061, 25212),
        |  (14, -0.431969, 1.353749, 25128),
        |  (15, -0.353429, 1.338418, 25303),
        |  (16, -0.274889, 1.438713, 24891),
        |  (17, -0.19635, 1.385672, 24972),
        |  (18, -0.11781, 1.219085, 25150),
        |  (19, -0.03927, 1.242622, 25006),
        |  (20, 0.03927, 1.228344, 25212),
        |  (21, 0.11781, 1.222227, 24943),
        |  (22, 0.19635, 1.335081, 25179),
        |  (23, 0.274889, 1.365771, 24704),
        |  (24, 0.353429, 1.338403, 24787),
        |  (25, 0.431969, 1.359549, 24934),
        |  (26, 0.510509, 1.486538, 25182),
        |  (27, 0.589049, 1.491338, 25168),
        |  (28, 0.667588, 1.459394, 24861),
        |  (29, 0.746128, 1.43645, 24768),
        |  (30, 0.824668, 1.489932, 24781),
        |  (31, 0.903208, 1.418044, 25105),
        |  (32, 0.981748, 1.475477, 25160),
        |  (33, 1.060288, 1.525678, 24905),
        |  (34, 1.138827, 1.477843, 24891),
        |  (35, 1.217367, 1.450002, 24631),
        |  (36, 1.295907, 1.391817, 25004),
        |  (37, 1.374447, 1.209045, 24655),
        |  (38, 1.452987, 1.180548, 25118),
        |  (39, 1.531526, 0.865842, 24993)) t(bin, center, mean_n, n_events)""".stripMargin,
    "acc_time_profile_eta" ->
      """SELECT bin::BIGINT AS bin, center::DOUBLE AS center, mean_t::DOUBLE AS mean_t, n_events::BIGINT AS n_events FROM (VALUES
        |  (0, 1.675763, 45.731132, 1272),
        |  (1, 1.709288, 41.322647, 13421),
        |  (2, 1.742813, 36.621817, 20225),
        |  (3, 1.776338, 35.651082, 20896),
        |  (4, 1.809863, 36.129483, 22113),
        |  (5, 1.843388, 35.677133, 23941),
        |  (6, 1.876913, 35.686843, 24265),
        |  (7, 1.910438, 35.556185, 24041),
        |  (8, 1.943963, 35.20309, 24238),
        |  (9, 1.977488, 35.607093, 24187),
        |  (10, 2.011013, 35.408728, 24142),
        |  (11, 2.044538, 35.169756, 23902),
        |  (12, 2.078063, 35.550688, 24138),
        |  (13, 2.111588, 35.607958, 24095),
        |  (14, 2.145113, 35.098014, 23989),
        |  (15, 2.178638, 35.651478, 23817),
        |  (16, 2.212163, 35.231404, 23822),
        |  (17, 2.245688, 35.361998, 23688),
        |  (18, 2.279213, 35.018398, 24188),
        |  (19, 2.312738, 35.482966, 23806),
        |  (20, 2.346263, 35.138726, 23896),
        |  (21, 2.379788, 35.221919, 23753),
        |  (22, 2.413313, 34.816098, 23851),
        |  (23, 2.446838, 35.262418, 23755),
        |  (24, 2.480363, 35.146939, 23879),
        |  (25, 2.513888, 34.991502, 23830),
        |  (26, 2.547413, 35.275752, 23649),
        |  (27, 2.580938, 34.651664, 23684),
        |  (28, 2.614463, 35.710452, 23427),
        |  (29, 2.647988, 35.761987, 23401),
        |  (30, 2.681513, 35.460835, 22188),
        |  (31, 2.715038, 35.231865, 19079),
        |  (32, 2.748563, 35.300726, 17703),
        |  (33, 2.782088, 35.407257, 17093),
        |  (34, 2.815613, 36.448123, 15773),
        |  (35, 2.849138, 38.265023, 13779),
        |  (36, 2.882663, 39.317227, 8925),
        |  (37, 2.916188, 41.542535, 4461),
        |  (38, 2.949713, 42.534404, 1526),
        |  (39, 2.983238, 46.25, 42)) t(bin, center, mean_t, n_events)""".stripMargin,
    "acc_profile2d_rowsum" ->
      """SELECT bin::BIGINT AS bin, n_cells::BIGINT AS n_cells, sum_mean::DOUBLE AS sum_mean FROM (VALUES
        |  (0, 40, 2.095864),
        |  (1, 40, 28.887627),
        |  (2, 40, 53.141168),
        |  (3, 40, 57.236963),
        |  (4, 40, 60.486568),
        |  (5, 40, 66.094949),
        |  (6, 40, 66.200244),
        |  (7, 40, 66.474047),
        |  (8, 40, 67.35338),
        |  (9, 40, 66.047146),
        |  (10, 40, 66.841027),
        |  (11, 40, 67.222469),
        |  (12, 40, 65.950302),
        |  (13, 40, 65.975104),
        |  (14, 40, 67.318426),
        |  (15, 40, 65.362703),
        |  (16, 40, 66.675353),
        |  (17, 40, 66.272491),
        |  (18, 40, 67.076447),
        |  (19, 40, 65.662635),
        |  (20, 40, 66.64156),
        |  (21, 40, 66.221426),
        |  (22, 40, 67.419248),
        |  (23, 40, 65.845688),
        |  (24, 40, 66.078869),
        |  (25, 40, 66.374181),
        |  (26, 40, 65.566388),
        |  (27, 40, 67.276845),
        |  (28, 40, 64.071919),
        |  (29, 40, 63.224737),
        |  (30, 40, 61.543483),
        |  (31, 40, 52.837571),
        |  (32, 40, 48.706428),
        |  (33, 40, 47.331311),
        |  (34, 40, 41.819835),
        |  (35, 40, 33.58892),
        |  (36, 40, 21.150839),
        |  (37, 40, 9.381259),
        |  (38, 40, 3.058053),
        |  (39, 40, 0.063826)) t(bin, n_cells, sum_mean)""".stripMargin,
    "sm_counts" ->
      "SELECT 78::BIGINT AS n_sm, 447::BIGINT AS n_modules, 894::BIGINT AS n_sensors",
    "sm_flavors" ->
      """SELECT n_mod::BIGINT AS n_mod, n_sm::BIGINT AS n_sm FROM (VALUES
        |  (3, 16), (6, 35), (7, 27)) t(n_mod, n_sm)""".stripMargin,
    "total_current" ->
      "SELECT 723.920384::DOUBLE AS total_ma",
    "etroc_hist" ->
      """SELECT bin::BIGINT AS bin, n::BIGINT AS n FROM (VALUES
        |  (3, 374), (4, 592), (5, 298), (6, 164), (7, 106), (8, 82), (9, 57),
        |  (10, 28), (11, 39), (12, 18), (13, 16), (14, 6), (15, 1), (16, 5),
        |  (17, 2)) t(bin, n)""".stripMargin,
    "bandwidth_tbps" ->
      """SELECT 2.337466::DOUBLE AS bw_tdr, 0.964666::DOUBLE AS bw_mini_hdr,
        |  0.840372::DOUBLE AS bw_mini_hdr_nocal, 0.497172::DOUBLE AS bw_no_hdr_nocal""".stripMargin,
    "bv_study" ->
      """SELECT config, leads::BIGINT AS leads, channels::BIGINT AS channels FROM (VALUES
        |  ('HPK_split4_2p5fC', 399, 321), ('HPK_split4_5fC', 336, 258),
        |  ('HPK_split4_10fC', 267, 189), ('HPK_split4_15fC', 234, 156),
        |  ('FBK_w13_2p5fC', 333, 255), ('FBK_w13_5fC', 258, 180),
        |  ('FBK_w13_10fC', 202, 124), ('FBK_w13_15fC', 180, 102)) t(config, leads, channels)""".stripMargin
  )
}
