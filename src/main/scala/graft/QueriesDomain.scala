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

  private def d2Sensors(spark: SparkSession): DataFrame = {
    val centers = Layouts.faceCenters(spark, "disk1", "back")
    SmReconstruct.reconstruct(spark, centers)
  }

  /** Acceptance stats over the exact seed-42 reference particle sample. */
  private def accStats(spark: SparkSession, dir: String): DataFrame = {
    val nh = Acceptance.run(spark, particles(spark))
    Acceptance.stats(nh).select(
      round(col("mean_nhits"), 6).as("mean_nhits"),
      round(col("frac_ge1"), 6).as("frac_ge1"),
      round(col("frac_ge2"), 6).as("frac_ge2"),
      col("n_events")
    )
  }

  /** Full n_hits histogram for the same sample. */
  private def accHist(spark: SparkSession, dir: String): DataFrame =
    Acceptance.run(spark, particles(spark))
      .groupBy(col("n_hits"))
      .agg(count(lit(1)).as("n"))

  /** Supermodule reconstruction entity counts (X8). */
  private def smCounts(spark: SparkSession, dir: String): DataFrame = {
    val s = d2Sensors(spark)
    s.agg(
      countDistinct("sm_id").as("n_sm"),
      countDistinct("sm_id", "mod_i").as("n_modules"),
      count(lit(1)).as("n_sensors")
    )
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

  /** X3 dee tiling of the 'updated' layout: per-face entity counts. */
  private def tilingCounts(spark: SparkSession, dir: String): DataFrame =
    graft.ops.DeeTiling.tileUpdatedLayout(spark)
      .filter(col("kind") === "sm")
      .groupBy("face")
      .agg(count(lit(1)).as("n_sm"), sum("n_mod").cast("long").as("n_modules"))

  /** X3 tiling flavor counts per face (A7 over the tiled layout). */
  private def tilingFlavors(spark: SparkSession, dir: String): DataFrame =
    graft.ops.DeeTiling.tileUpdatedLayout(spark)
      .filter(col("kind") === "sm")
      .groupBy(col("face"), col("n_mod").cast("long").as("n_mod"))
      .agg(count(lit(1)).as("n_sm"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tiling_counts" -> (tilingCounts _),
    "tiling_flavors" -> (tilingFlavors _),
    "ring_split" -> (ringSplit _),
    "ring_members" -> (ringMembers _),
    "minsplit_studies" -> (minsplitStudies _),
    "greedy_groups" -> (greedyGroups _),
    "acc_stats" -> (accStats _),
    "acc_hist" -> (accHist _),
    "sm_counts" -> (smCounts _),
    "sm_flavors" -> (smFlavors _),
    "total_current" -> (totalCurrent _),
    "etroc_hist" -> (etrocHist _),
    "bandwidth_tbps" -> (bandwidthTbps _),
    "bv_study" -> (bvStudy _)
  )

  val oracles: Map[String, String] = Map(
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
