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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
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
