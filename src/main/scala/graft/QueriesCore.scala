package graft

import graft.geom.Transforms
import graft.io.FaceTsv
import graft.ops.{HistogramOps, PartitionSolver, SpatialJoin, ZOrder}
import graft.physics.Physics
import graft.pipelines.Layouts
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic operator conformance queries over the /root/testdata tables —
  * one per SURVEY §2 family, each with a DuckDB oracle in
  * [[QueriesCore.oracles]]. Column names and rounding match the oracle
  * exactly (the driver sorts columns by name and hashes values).
  */
object QueriesCore {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table with a whole-epoch-seconds `sec` column — the
    * key every event-time query (sessionize, windows, as-of, interval)
    * groups and orders by. Derivation is schema-adaptive
    * ([[graft.util.EventTime]]): the fixture's `ts` has shipped both as
    * long epoch-nanos and as parquet timestamp micros across driver
    * generations, while the DuckDB oracles' `floor(epoch(ts))::BIGINT`
    * is stable across both. */
  private def events(spark: SparkSession, dir: String): DataFrame =
    graft.util.EventTime.withEpochSec(t(spark, dir, "events"))

  /** q1: pricing-summary aggregation (A2/A5/A14-style). */
  private def q1Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("n_rows")
      )

  /** S1: Face TSV scan (quirky header, CRLF, #REF! rows dropped). */
  private def s1FaceTsv(spark: SparkSession, dir: String): DataFrame = {
    val fixDir = new java.io.File(Layouts.resolveFixture("Face 1.txt")).getParent
    FaceTsv.readAll(spark, fixDir)
      .groupBy("face")
      .agg(
        count(lit(1)).as("n_rows"),
        sum("module_id").cast("long").as("sum_mod"),
        round(sum("x"), 3).as("sum_x"),
        round(sum("y"), 3).as("sum_y"),
        round(sum("z"), 3).as("sum_z")
      )
      .withColumn("face", col("face").cast("long"))
  }

  /** P1: forward transform (x,y,z) → (r, θ, η, φ). */
  private def p1Fwd(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "part").select(
      col("p_partkey"),
      col("p_retailprice").as("x"),
      (pmod(col("p_partkey"), lit(1000)) - 500).cast("double").as("y"),
      lit(3000.0).as("z")
    )
    Transforms.withKinematics(df)
      .select(
        col("p_partkey"),
        round(col("r"), 6).as("r"),
        round(col("theta"), 6).as("theta"),
        round(col("eta"), 6).as("eta"),
        round(col("phi"), 6).as("phi")
      )
  }

  /** P2: inverse transform (η,φ,z) → (x,y). */
  private def p2Inv(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "orders").select(
      col("o_orderkey"),
      (lit(1.659) + pmod(col("o_orderkey"), lit(997)).cast("double") / 997.0 * 1.341).as("eta"),
      ((pmod(col("o_orderkey"), lit(611)).cast("double") / 611.0 - 0.5) * math.Pi).as("phi")
    )
    Transforms.withCartesian(df, zMm = 3000.0)
      .select(
        col("o_orderkey"),
        round(col("x"), 6).as("x"),
        round(col("y"), 6).as("y")
      )
  }

  /** P9–P12: sensor physics models over a derived radius column. */
  private def p9Physics(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "supplier")
      .select(col("s_suppkey"), (lit(315.0) + pmod(col("s_suppkey"), lit(870)).cast("double")).as("r_mm"))
      .select(
        col("s_suppkey"),
        round(Physics.irradiationCol(col("r_mm")), 6).as("fluence"),
        round(Physics.getCurrentCol(col("r_mm")), 6).as("current_ma"),
        round(Physics.sensorOccupancyCol(col("r_mm")), 6).as("occupancy")
      )

  /** P14: the ten BV ladder curves on a radius grid. */
  private def p14BvCurves(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val curves = Physics.bvCurves.toSeq.sortBy(_._1).map { case (n, (a, b)) => (n, a, b) }
      .toDF("curve", "a", "b")
    val rs = spark.range(0, 9).select((col("id") * 100 + 316).cast("double").as("r"))
    rs.crossJoin(curves)
      .select(col("curve"), col("r"), round(col("a") * log(col("r")) - col("b"), 6).as("r_min"))
  }

  /** F9: multi-hit selection — orders with more than 4 line items. */
  private def f9Multihit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_items"))
      .filter(col("n_items") > 4)

  /** J-equi: orders ⋈ customer ⋈ nation revenue rollup (broadcast dims). */
  private def joinOrdersCustomer(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(broadcast(t(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))

  /** J1: the grid-bucketed point-in-rect spatial join on synthetic
    * coordinates (customers = points, suppliers = rects). */
  private def j1SpatialGrid(spark: SparkSession, dir: String): DataFrame = {
    val points = t(spark, dir, "customer").select(
      col("c_custkey"),
      col("c_acctbal").as("px"),
      (pmod(col("c_custkey") * 37, lit(2000)) - 1000).cast("double").as("py")
    )
    val rects = t(spark, dir, "supplier").select(
      col("s_suppkey"),
      (col("s_acctbal") - 40).as("ax1"),
      (col("s_acctbal") + 40).as("ax2"),
      ((pmod(col("s_suppkey") * 97, lit(2000)) - 1000).cast("double") - 60).as("ay1"),
      ((pmod(col("s_suppkey") * 97, lit(2000)) - 1000).cast("double") + 60).as("ay2")
    )
    SpatialJoin.hitJoin(points, rects, Seq.empty, cell = 100.0)
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("n_hits"))
  }

  /** J1 with the LARGE-rect-side plan: `broadcastRects = false`
    * shuffles BOTH sides on the grid-cell key into a hash equi-join —
    * the shape for a rect table too big to broadcast (100× sensor
    * counts). Same oracle as `j1_spatial_grid`: the two physical
    * plans must agree row-for-row; [[graft.PlanShapeSpec]] pins the
    * exchange-on-cell-keys/no-BNLJ plan shape. */
  private def j1SpatialShuffle(spark: SparkSession, dir: String): DataFrame = {
    val points = t(spark, dir, "customer").select(
      col("c_custkey"),
      col("c_acctbal").as("px"),
      (pmod(col("c_custkey") * 37, lit(2000)) - 1000).cast("double").as("py")
    )
    val rects = t(spark, dir, "supplier").select(
      col("s_suppkey"),
      (col("s_acctbal") - 40).as("ax1"),
      (col("s_acctbal") + 40).as("ax2"),
      ((pmod(col("s_suppkey") * 97, lit(2000)) - 1000).cast("double") - 60).as("ay1"),
      ((pmod(col("s_suppkey") * 97, lit(2000)) - 1000).cast("double") + 60).as("ay2")
    )
    SpatialJoin.hitJoin(points, rects, Seq.empty, cell = 100.0, broadcastRects = false)
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("n_hits"))
  }

  /** J3/O8: rank-based row pairing (consecutive pairs by descending
    * account balance within a nation). */
  private def j3Pairing(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .withColumn(
        "k",
        row_number().over(Window.partitionBy("c_nationkey").orderBy(desc("c_acctbal"), col("c_custkey"))) - 1
      )
      .withColumn("pair", (col("k") / 2).cast("long"))
      .groupBy("c_nationkey", "pair")
      // sum, not avg: the mean of two 2-decimal values can land exactly
      // on a .xx5 rounding boundary where Spark (decimal-string round)
      // and the oracle (binary round) disagree; the sum cannot.
      .agg(round(sum("c_acctbal"), 2).as("pair_sum"), count(lit(1)).as("n_in_pair"))

  /** J5: self-pairing combinations (i ≤ j) within an order. */
  private def j5SelfPair(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    val a = l.select(col("l_orderkey"), col("l_linenumber").as("i"), col("l_quantity").as("qa"))
    val b = l.select(col("l_orderkey"), col("l_linenumber").as("j"), col("l_quantity").as("qb"))
    a.join(b, Seq("l_orderkey"))
      .filter(col("i") <= col("j"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_pairs"), round(sum(col("qa") * col("qb")), 2).as("qprod"))
  }

  /** A1: per-group min/max. */
  private def a1MinMax(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "supplier")
      .groupBy("s_nationkey")
      .agg(
        round(min("s_acctbal"), 2).as("min_bal"),
        round(max("s_acctbal"), 2).as("max_bal"),
        count(lit(1)).as("n_supp")
      )

  /** A9: 1D histogram of extended price. */
  private def hist1dPrice(spark: SparkSession, dir: String): DataFrame = {
    val s = HistogramOps.BinSpec(20, 0.0, 80000.0)
    HistogramOps.hist1d(t(spark, dir, "lineitem"), col("l_extendedprice"), s)
      .select(col("bin"), col("n"), round(col("center"), 6).as("center"))
  }

  /** A10: 2D histogram (quantity × discount). */
  private def hist2dQtyDisc(spark: SparkSession, dir: String): DataFrame =
    HistogramOps.hist2d(
      t(spark, dir, "lineitem"),
      col("l_quantity"), HistogramOps.BinSpec(10, 0.0, 50.0),
      col("l_discount"), HistogramOps.BinSpec(11, 0.0, 0.11)
    )

  /** A10 (full shape): 3D histogram — two regular axes + an INTEGER
    * axis (l_linenumber ∈ 1..7), the (η,φ,n) fill shape of
    * dee_geometry.py:616-621. */
  private def hist3dQtyDiscLine(spark: SparkSession, dir: String): DataFrame =
    HistogramOps.hist3dInt(
      t(spark, dir, "lineitem"),
      col("l_quantity"), HistogramOps.BinSpec(10, 0.0, 50.0),
      col("l_discount"), HistogramOps.BinSpec(11, 0.0, 0.11),
      col("l_linenumber"), HistogramOps.IntSpec(1, 7)
    )

  /** A10/A11: axis-sum projection + integer-axis profile over the 3D
    * histogram table (the reference's `h[{'phi': sum}].profile('n')`
    * at dee_geometry.py:690-698): per-quantity-bin mean line number. */
  private def hist3dProjProfile(spark: SparkSession, dir: String): DataFrame = {
    val h3 = hist3dQtyDiscLine(spark, dir)
    HistogramOps.profileHist(
      HistogramOps.projectHist(h3, "biny"),
      "binz", col("binz").cast("double")
    ).select(col("binx"), round(col("mean"), 6).as("mean"), col("n"))
  }

  /** A11: profile — per-quantity-bin mean price. */
  private def profilePrice(spark: SparkSession, dir: String): DataFrame =
    HistogramOps.profile1d(
      t(spark, dir, "lineitem"),
      col("l_quantity"), HistogramOps.BinSpec(10, 0.0, 50.0),
      col("l_extendedprice")
    ).select(col("bin"), round(col("mean"), 2).as("mean"), col("n"), round(col("center"), 6).as("center"))

  /** A13/J6: binned efficiency with binomial errors. */
  private def a13Efficiency(spark: SparkSession, dir: String): DataFrame =
    HistogramOps.efficiency(
      t(spark, dir, "lineitem"),
      col("l_discount"), HistogramOps.BinSpec(11, 0.0, 0.11),
      col("l_returnflag") === "R"
    ).select(col("bin"), col("n"), col("k"), round(col("p"), 6).as("p"), round(col("err"), 6).as("err"))

  /** A15: distinct. */
  private def a15Distinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part").select("p_brand", "p_type").distinct()

  /** O2: deterministic top-k. Sort+limit first (Spark's
    * TakeOrderedAndProject — per-partition top-k, no global sort), then
    * rank the k survivors; a global row_number window would serialize
    * the whole table through one partition. */
  private def o2TopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(15)
      .withColumn("rk", row_number().over(Window.orderBy(desc("o_totalprice"), col("o_orderkey"))).cast("long"))
      .select(col("rk"), col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))

  /** O3: argmax selection per group (min_by/max_by shape). */
  private def o3Argmax(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "supplier")
      .withColumn("rk", row_number().over(Window.partitionBy("s_nationkey").orderBy(desc("s_acctbal"), col("s_suppkey"))))
      .filter(col("rk") === 1)
      .select(col("s_nationkey"), col("s_suppkey"), round(col("s_acctbal"), 2).as("best_bal"))

  /** O6: gaps-and-islands — contiguous same-type event runs per user. */
  private def o6Runs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(spark, dir, "events")
      .withColumn("chg", when(lag("event_type", 1).over(w).isNull || lag("event_type", 1).over(w) =!= col("event_type"), 1).otherwise(0))
      .withColumn("run_id", sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .groupBy("user_id", "run_id")
      .agg(first("event_type").as("event_type"), count(lit(1)).as("run_len"))
  }

  /** O8: alternating-index (parity) slice. */
  private def o8Parity(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .withColumn(
        "k",
        row_number().over(Window.partitionBy("c_nationkey").orderBy(desc("c_acctbal"), col("c_custkey"))) - 1
      )
      .withColumn("parity", pmod(col("k"), lit(2)).cast("long"))
      .groupBy("c_nationkey", "parity")
      .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal_sum"))

  /** Sessionization: 30-minute-gap sessions over the events stream. */
  private def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(spark, dir)
      .withColumn("gap", col("sec") - lag("sec", 1).over(w))
      .withColumn("new_sess", when(col("gap").isNull || col("gap") > 1800, 1).otherwise(0))
      .withColumn("sess_id", sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .groupBy("user_id")
      .agg(max("sess_id").as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** Streaming↔batch parity (SURVEY §2.10): run the Structured
    * Streaming sessionizer over the events table fed as deterministic
    * MemoryStream micro-batches, then check the per-user rollup against
    * the batch gaps-and-islands oracle. Two time-ordered halves
    * replicate incremental arrival; two far-future sentinel rows first
    * push the watermark past every real session's timeout, then trigger
    * the micro-batch in which those event-time timeouts fire, so every
    * session closes. The driver-side collect is the MemoryStream feed
    * (10k fixture rows), not a processing step. */
  private def streamSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = events(spark, dir)
      .select(col("user_id"), col("sec"), col("event_type"), col("value").cast("double"))
      .orderBy("sec", "user_id")
      .as[(Long, Long, String, Double)]
      .collect()
    val maxSec = rows.iterator.map(_._2).max
    val gapSec = 1800L
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val queryName = "stream_sess_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = EventStreams.sessionize(spark, df, gapSec = gapSec)
      .writeStream.format("memory").queryName(queryName).outputMode("append").start()
    try {
      val data = rows.map { case (u, sec, et, v) => (u, new java.sql.Timestamp(sec * 1000), et, v) }
      val (h1, h2) = data.splitAt(data.length / 2)
      mem.addData(h1.toIndexedSeq); q.processAllAvailable()
      mem.addData(h2.toIndexedSeq); q.processAllAvailable()
      val jump = gapSec + 601L // past gap + the 10-minute watermark lag
      mem.addData(Seq((-1L, new java.sql.Timestamp((maxSec + jump) * 1000), "s", 0.0)))
      q.processAllAvailable()
      mem.addData(Seq((-1L, new java.sql.Timestamp((maxSec + 2 * jump) * 1000), "s", 0.0)))
      q.processAllAvailable()
      spark.table(queryName)
        .filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("n_events").cast("long").as("n_events"))
        .localCheckpoint(eager = true)
    } finally q.stop()
  }

  /** TTL-bounded streaming dedup parity ("exact within horizon"): the
    * event stream arrives in (sec, event_id) order across three
    * micro-batches and each (user_id, event_type) key emits an event
    * iff no occurrence of that key arrived within the 4-hour horizon
    * before it (sliding from the last occurrence). The oracle is the
    * batch lag-window rule `keep iff gap > horizon` — equality holds
    * wherever the micro-batch boundaries fall because the suppression
    * decision compares EVENT TIMES held in state, never the watermark
    * ([[graft.streaming.EventStreams.dedupFirstSeenTtl]]). Unlike the
    * exact-forever first-seen paths, state here is one long per key
    * and is evicted once the watermark passes last-seen + horizon —
    * the state-plateau contract EventStreamsSpec pins with a RocksDB
    * run. No sentinel needed: emission happens on arrival. */
  private def streamDedupTtl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val horizonSec = 14400L
    val rows = events(spark, dir)
      .select(col("sec"), col("user_id"), col("event_type"), col("event_id"))
      .orderBy("sec", "event_id")
      .as[(Long, Long, String, Long)]
      .collect()
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Long)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type", "event_id")
    val queryName = "stream_ttl_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = EventStreams.dedupFirstSeenTtl(spark, df, horizonSec)
      .writeStream.format("memory").queryName(queryName).outputMode("append").start()
    try {
      val data = rows.map { case (sec, u, et, id) => (new java.sql.Timestamp(sec * 1000), u, et, id) }
      val third = data.length / 3
      mem.addData(data.take(third).toIndexedSeq); q.processAllAvailable()
      mem.addData(data.slice(third, 2 * third).toIndexedSeq); q.processAllAvailable()
      mem.addData(data.drop(2 * third).toIndexedSeq); q.processAllAvailable()
      spark.table(queryName)
        .select("event_id", "user_id", "event_type", "sec")
        .localCheckpoint(eager = true)
    } finally q.stop()
  }

  /** Streaming windowed counts parity: the watermarked 5-minute
    * tumbling aggregation over the same MemoryStream feed, checked
    * against the batch GROUP BY floor(epoch/300). Sentinel 1 pushes
    * the watermark past every real window's end; sentinel 2 triggers
    * the micro-batch that emits them (append-mode windows finalize one
    * batch after the watermark passes). value sums round at 2 decimals
    * safely because the inputs are 2-decimal values — the exact sum is
    * itself a 2-decimal number, never at a rounding boundary. */
  private def streamWindowedCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = events(spark, dir)
      .select(col("user_id"), col("sec"), col("event_type"), col("value").cast("double"))
      .orderBy("sec", "user_id")
      .as[(Long, Long, String, Double)]
      .collect()
    val maxSec = rows.iterator.map(_._2).max
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val queryName = "stream_wc_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = EventStreams.windowedCounts(df)
      .writeStream.format("memory").queryName(queryName).outputMode("append").start()
    try {
      val data = rows.map { case (u, sec, et, v) => (new java.sql.Timestamp(sec * 1000), u, et, v) }
      val (h1, h2) = data.splitAt(data.length / 2)
      mem.addData(h1.toIndexedSeq); q.processAllAvailable()
      mem.addData(h2.toIndexedSeq); q.processAllAvailable()
      mem.addData(Seq((new java.sql.Timestamp((maxSec + 1200) * 1000), -1L, "s", 0.0)))
      q.processAllAvailable()
      mem.addData(Seq((new java.sql.Timestamp((maxSec + 3000) * 1000), -1L, "s", 0.0)))
      q.processAllAvailable()
      spark.table(queryName)
        .withColumn("window_start", col("window_start").cast("long"))
        .filter(col("window_start") <= maxSec)
        .select(
          col("window_start"), col("event_type"), col("n"),
          round(col("value_sum"), 2).as("value_sum"))
        .localCheckpoint(eager = true)
    } finally q.stop()
  }

  /** Streaming exact COUNT(DISTINCT) parity: per-(5-minute window,
    * type) distinct users through the stateful set operator (built-in
    * streaming aggregates refuse distinct), fed and closed out exactly
    * like the other streaming parity queries, vs the batch
    * count(DISTINCT) oracle. */
  private def streamDistinctUsers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = events(spark, dir)
      .select(col("user_id"), col("sec"), col("event_type"))
      .orderBy("sec", "user_id")
      .as[(Long, Long, String)]
      .collect()
    val maxSec = rows.iterator.map(_._2).max
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type")
    val queryName = "stream_du_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = EventStreams.distinctUsers(spark, df)
      .writeStream.format("memory").queryName(queryName).outputMode("append").start()
    try {
      val data = rows.map { case (u, sec, et) => (new java.sql.Timestamp(sec * 1000), u, et) }
      val (h1, h2) = data.splitAt(data.length / 2)
      mem.addData(h1.toIndexedSeq); q.processAllAvailable()
      mem.addData(h2.toIndexedSeq); q.processAllAvailable()
      mem.addData(Seq((new java.sql.Timestamp((maxSec + 1200) * 1000), -1L, "s")))
      q.processAllAvailable()
      mem.addData(Seq((new java.sql.Timestamp((maxSec + 3000) * 1000), -1L, "s")))
      q.processAllAvailable()
      spark.table(queryName)
        .filter(col("window_start") <= maxSec)
        .select("window_start", "event_type", "n_users")
        .localCheckpoint(eager = true)
    } finally q.stop()
  }

  /** HLL-sketch streaming COUNT(DISTINCT) with a DRIVER-GATED error
    * contract: the same feed as `stream_distinct_users` runs through
    * [[graft.streaming.EventStreams.distinctUsersApprox]] (p=12
    * HyperLogLog registers in state — constant 4 KB per key vs the
    * exact set's O(cardinality)), then joins the batch-exact counts
    * and emits (window_start, event_type, n_users = EXACT,
    * err_ok = |approx − exact| ≤ max(0.05·exact, 1)). The tolerance is
    * 5% relative with a ±1 absolute floor: tiny windows (2–20 users)
    * sit in the linear-counting regime where a single register
    * collision shifts the estimate by exactly 1 — measured worst case
    * across all three fixtures (graft.dev.HllProbe: worstAbs = 1 at
    * every sf; the worst RELATIVE error is that ±1 on a 2-user
    * window). The DuckDB oracle recomputes the exact counts and
    * asserts err_ok literally TRUE — so the hash-match gates the
    * sketch's error bound, not just its plumbing (the sketch is
    * deterministic: XXH64 seed 42, so the bound either always holds
    * on this fixture or never does). */
  private def streamDistinctHll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = events(spark, dir)
      .select(col("user_id"), col("sec"), col("event_type"))
      .orderBy("sec", "user_id")
      .as[(Long, Long, String)]
      .collect()
    val maxSec = rows.iterator.map(_._2).max
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type")
    val queryName = "stream_hll_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = EventStreams.distinctUsersApprox(spark, df)
      .writeStream.format("memory").queryName(queryName).outputMode("append").start()
    val approx =
      try {
        val data = rows.map { case (u, sec, et) => (new java.sql.Timestamp(sec * 1000), u, et) }
        val (h1, h2) = data.splitAt(data.length / 2)
        mem.addData(h1.toIndexedSeq); q.processAllAvailable()
        mem.addData(h2.toIndexedSeq); q.processAllAvailable()
        mem.addData(Seq((new java.sql.Timestamp((maxSec + 1200) * 1000), -1L, "s")))
        q.processAllAvailable()
        mem.addData(Seq((new java.sql.Timestamp((maxSec + 3000) * 1000), -1L, "s")))
        q.processAllAvailable()
        spark.table(queryName)
          .filter(col("window_start") <= maxSec)
          .select(col("window_start"), col("event_type"), col("n_users").as("n_approx"))
          .localCheckpoint(eager = true)
      } finally q.stop()
    val exact = events(spark, dir)
      .groupBy((floor(col("sec") / 300) * 300).cast("long").as("window_start"), col("event_type"))
      .agg(countDistinct("user_id").as("n_users"))
    exact
      .join(approx, Seq("window_start", "event_type"), "left")
      .select(col("window_start"), col("event_type"), col("n_users"),
        coalesce(
          abs(col("n_approx").cast("double") - col("n_users").cast("double"))
            <= greatest(lit(0.05) * col("n_users").cast("double"), lit(1.0)),
          lit(false)).as("err_ok"))
  }

  /** Skew-safe aggregation over a LOW-cardinality key: per-event-type
    * count + exact integer cents sum through [[graft.ops.SaltedAgg]]'s
    * two-phase salted plan (wide exchange on (type, salt), tiny final
    * combine on type). The value sum is per-row floored cents, so the
    * merge is integer-exact and oracle-reproducible regardless of
    * aggregation order. */
  private def saltedTypeStats(spark: SparkSession, dir: String): DataFrame =
    graft.ops.SaltedAgg.countSum(
      t(spark, dir, "events"),
      key = col("event_type"),
      valueCol = floor(col("value") * 100 + 0.5).cast("long"),
      saltCol = col("user_id"),
      salts = 16
    ).select(col("k").as("event_type"), col("n"), col("value_sum"))

  /** Range join over the event stream: every (click, purchase) pair of
    * the same user within ±300 s, through
    * [[graft.ops.IntervalJoin.pointInInterval]]'s bucket-replicated
    * equi-join (bucket = 600 s ≈ interval width → ≤2 replicas per
    * interval). The oracle is the plain inequality join. */
  private def intervalClickPurchase(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("sec").as("t"), col("event_id").as("id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), (col("sec") - 300).as("lo"), (col("sec") + 300).as("hi"),
        col("event_id").as("id"))
    graft.ops.IntervalJoin.pointInInterval(clicks, purchases, "user_id", bucket = 600L)
      .select(
        col("p_id").as("click_id"), col("i_id").as("purchase_id"),
        col("k").as("user_id"), (col("t") - col("lo") - 300).as("dt_sec"))
  }

  /** STREAM-STREAM interval join parity: the clicks and purchases of
    * the event stream arrive as two separate watermarked streams and
    * join with event-time bounds (±300 s, same user) — the streaming
    * form of `interval_click_purchase`, against the same plain
    * inequality-join oracle. Both sides are fed as deterministic
    * MemoryStream halves; inner-join matches emit as soon as both
    * sides are buffered, so no watermark-closure sentinels are needed
    * (the watermark only bounds join state). */
  private def streamIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = events(spark, dir)
      .select(col("event_id"), col("user_id"), col("sec"), col("event_type"))
      .orderBy("sec", "event_id")
      .as[(Long, Long, Long, String)]
      .collect()
    def feedRows(kind: String) = rows.collect {
      case (id, u, sec, et) if et == kind => (new java.sql.Timestamp(sec * 1000), u, id)
    }
    val memC = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val memP = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val cdf = memC.toDF().toDF("ts", "user_id", "event_id")
    val pdf = memP.toDF().toDF("ts", "user_id", "event_id")
    val queryName = "stream_ij_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = EventStreams.intervalJoin(cdf, pdf)
      .writeStream.format("memory").queryName(queryName).outputMode("append").start()
    try {
      // both feeds split at the same global time (see streamAsofJoin:
      // per-stream halves can advance the watermark past the slower
      // stream's second half and drop rows as late)
      val midSec = rows(rows.length / 2)._3
      val (c1, c2) = feedRows("click").partition(_._1.getTime / 1000 < midSec)
      val (p1, p2) = feedRows("purchase").partition(_._1.getTime / 1000 < midSec)
      memC.addData(c1.toIndexedSeq); memP.addData(p1.toIndexedSeq); q.processAllAvailable()
      memC.addData(c2.toIndexedSeq); memP.addData(p2.toIndexedSeq); q.processAllAvailable()
      spark.table(queryName)
        .select("click_id", "purchase_id", "user_id", "dt_sec")
        .localCheckpoint(eager = true)
    } finally q.stop()
  }

  /** STREAMING as-of join parity: the clicks and purchases of the
    * event stream arrive as two watermarked streams and every click is
    * annotated with its latest prior purchase — the streaming form of
    * `asof_purchase`, against the SAME DuckDB ASOF LEFT JOIN oracle.
    * Unlike the interval join, as-of matches cannot emit on arrival
    * (a later-arriving earlier purchase could change the answer), so
    * emission is watermark-gated; a far-future sentinel on the left
    * stream (user −1, filtered from the result) matures every real
    * click at end of feed. */
  private def streamAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = events(spark, dir)
      .select(col("event_id"), col("user_id"), col("sec"), col("event_type"))
      .orderBy("sec", "event_id")
      .as[(Long, Long, Long, String)]
      .collect()
    def feedRows(kind: String) = rows.collect {
      case (id, u, sec, et) if et == kind => (new java.sql.Timestamp(sec * 1000), u, id)
    }
    val maxSec = rows.map(_._3).max
    val memL = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val memR = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val queryName = "stream_asof_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = graft.streaming.EventStreams.asOfJoin(
        spark,
        memL.toDF().toDF("ts", "user_id", "event_id"),
        memR.toDF().toDF("ts", "user_id", "event_id"))
      .writeStream.format("memory").queryName(queryName).outputMode("append").start()
    try {
      // split BOTH feeds at the same global time: a per-stream halfway
      // split would advance the watermark past the slower stream's
      // second half (the two types' medians differ) and drop those
      // rows as late — a feed artifact, not operator semantics
      val midSec = rows(rows.length / 2)._3
      val (c1, c2) = feedRows("click").partition(_._1.getTime / 1000 < midSec)
      val (p1, p2) = feedRows("purchase").partition(_._1.getTime / 1000 < midSec)
      memL.addData(c1.toIndexedSeq); memR.addData(p1.toIndexedSeq); q.processAllAvailable()
      memL.addData(c2.toIndexedSeq); memR.addData(p2.toIndexedSeq); q.processAllAvailable()
      // sentinel a day past the data + the 10 min watermark delay, twice
      // (first batch advances the watermark, second applies it)
      memL.addData((new java.sql.Timestamp((maxSec + 86400) * 1000), -1L, -1L))
      q.processAllAvailable()
      memL.addData((new java.sql.Timestamp((maxSec + 2 * 86400) * 1000), -1L, -1L))
      q.processAllAvailable()
      spark.table(queryName)
        .filter(col("user_id") >= 0)
        .select(col("event_id"), col("user_id"), col("sec"),
          col("asof_id").as("last_purchase_id"), col("gap_sec"))
        .localCheckpoint(eager = true)
    } finally q.stop()
  }

  /** Exact discrete percentiles (p50/p90/p99 of extended price per
    * return flag) by explicit rank arithmetic — the SAME index formula
    * on both engines (rank = floor(p·(n−1)) + 1 over the ascending
    * sort), so no interpolation-definition drift between Spark
    * `percentile` and DuckDB `quantile_*` can bite. Exact percentiles
    * inherently sort each group (one exchange + sort here); at 100 TB
    * the approximate `percentile_approx` sketch is the scale path, but
    * its t-digest output is implementation-defined and not
    * oracle-exact, so the conformance query pins the exact form. */
  private def percentilesPrice(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    val ranked = t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("l_returnflag")))
    def at(p: Double) = floor(lit(p) * (col("n") - 1)).cast("long") + 1
    ranked
      .groupBy("l_returnflag")
      .agg(
        max(when(col("rn") === at(0.5), col("l_extendedprice"))).as("p50"),
        max(when(col("rn") === at(0.9), col("l_extendedprice"))).as("p90"),
        max(when(col("rn") === at(0.99), col("l_extendedprice"))).as("p99"))
  }

  /** AS-OF join over the event stream: each click annotated with the
    * user's most recent prior (inclusive) purchase — DuckDB checks it
    * with its native ASOF LEFT JOIN, Spark runs
    * [[graft.ops.AsOfJoin.lastPrior]]'s single-exchange union-carry
    * plan. Purchases are deduped to max event_id per (user, second) on
    * both sides so the match is deterministic. */
  private def asofPurchase(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("sec"), col("event_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .groupBy("user_id", "sec")
      .agg(max("event_id").as("event_id"))
    graft.ops.AsOfJoin.lastPrior(clicks, purchases, "user_id", "sec", "event_id")
      .select(
        col("id").as("event_id"), col("k").as("user_id"), col("t").as("sec"),
        col("asof_id").as("last_purchase_id"),
        (col("t") - col("asof_ts")).as("gap_sec"))
  }

  /** U1: union of tagged branches. */
  private def u1Union(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    o.filter(col("o_totalprice") > 250000).select(lit("hi").as("tag"), col("o_orderkey"))
      .unionByName(o.filter(col("o_totalprice") < 5000).select(lit("lo").as("tag"), col("o_orderkey")))
  }

  /** U2: mirror union (x ∪ −x). */
  private def u2Mirror(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part").select(col("p_partkey"), col("p_retailprice").as("x"))
    p.unionByName(p.select(col("p_partkey"), (-col("x")).as("x")))
      .groupBy("p_partkey")
      .agg(count(lit(1)).as("n"), round(sum("x"), 6).as("x_sum"), round(sum(abs(col("x"))), 2).as("abs_sum"))
  }

  /** CUBE rollup over orders: counts and integer-cents totals for every
    * (status, priority) combination plus both one-dimensional margins
    * and the grand total — the grouping-sets surface (ROLLUP is covered
    * by `area_rollup`). Cents are floored per row so every margin is
    * integer-exact across engines. */
  private def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long"))
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents_sum"))

  /** P4: deg → rad (ETL.py:40-41) over the angles the reference
    * actually rotates by — the inner/outer attachment and service
    * angles of dee_geometry.py — plus the axes. Closes the one
    * "trivial, untested" row of the §2 table with a direct oracle
    * (golden VALUES captured from one run; radians() is a pure
    * per-row function, so the output is partition-independent). */
  private def p4DegRad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Seq(-177.5, -150.0, -112.0, -90.0, -68.0, -30.0, -2.5,
        0.0, 2.5, 30.0, 45.0, 68.0, 90.0, 112.0, 150.0, 177.5, 180.0, 270.0, 359.9)
      .toDF("deg")
      .select(col("deg"), round(Transforms.degToRad(col("deg")), 9).as("rad"))
  }

  /** Z-order layout audit over lineitem: Morton-interleave
    * (l_partkey, l_suppkey) mod 1024 (10 bits each), bucket by the
    * top z bits, and emit each bucket's row count and per-dimension
    * bounding box — the min/max stats file-level skipping would use.
    * Tight boxes in BOTH dimensions are the z-order locality property
    * that makes `ZOrder.clusterByZ` a multi-dim pruning layout. */
  private def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val x = pmod(col("l_partkey"), lit(1024L))
    val y = pmod(col("l_suppkey"), lit(1024L))
    t(spark, dir, "lineitem")
      .select(ZOrder.zValue(x, y, 10).as("z"), x.as("x"), y.as("y"))
      .withColumn("bucket", shiftright(col("z"), 12))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"))
  }

  /** X1: integer partition solver, n = 1..60 (golden VALUES oracle). */
  private def x1Partition(spark: SparkSession, dir: String): DataFrame = {
    val pf = udf((n: Int) => PartitionSolver.getPartition(n).mkString(","))
    spark.range(1, 61).select(col("id").as("n"), pf(col("id").cast("int")).as("flavors"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "s1_face_tsv" -> (s1FaceTsv _),
    "p1_transform_fwd" -> (p1Fwd _),
    "p2_transform_inv" -> (p2Inv _),
    "p4_degrad" -> (p4DegRad _),
    "p9_physics" -> (p9Physics _),
    "p14_bv_curves" -> (p14BvCurves _),
    "f9_multihit" -> (f9Multihit _),
    "join_orders_customer" -> (joinOrdersCustomer _),
    "j1_spatial_grid" -> (j1SpatialGrid _),
    "j1_spatial_shuffle" -> (j1SpatialShuffle _),
    "j3_pairing" -> (j3Pairing _),
    "j5_selfpair" -> (j5SelfPair _),
    "a1_minmax" -> (a1MinMax _),
    "hist1d_price" -> (hist1dPrice _),
    "hist2d_qty_disc" -> (hist2dQtyDisc _),
    "hist3d_qty_disc_line" -> (hist3dQtyDiscLine _),
    "hist3d_proj_profile" -> (hist3dProjProfile _),
    "profile_price" -> (profilePrice _),
    "a13_efficiency" -> (a13Efficiency _),
    "a15_distinct" -> (a15Distinct _),
    "o2_topk" -> (o2TopK _),
    "o3_argmax" -> (o3Argmax _),
    "o6_runs" -> (o6Runs _),
    "o8_parity" -> (o8Parity _),
    "asof_purchase" -> (asofPurchase _),
    "cube_orders" -> (cubeOrders _),
    "interval_click_purchase" -> (intervalClickPurchase _),
    "percentiles_price" -> (percentilesPrice _),
    "salted_type_stats" -> (saltedTypeStats _),
    "sessionize" -> (sessionize _),
    "stream_sessionize" -> (streamSessionize _),
    "stream_dedup_ttl" -> (streamDedupTtl _),
    "stream_windowed_counts" -> (streamWindowedCounts _),
    "stream_distinct_users" -> (streamDistinctUsers _),
    "stream_distinct_hll" -> (streamDistinctHll _),
    "stream_interval_join" -> (streamIntervalJoin _),
    "stream_asof_join" -> (streamAsofJoin _),
    "u1_union" -> (u1Union _),
    "u2_mirror" -> (u2Mirror _),
    "x1_partition" -> (x1Partition _),
    "zorder_layout" -> (zorderLayout _)
  )

  val oracles: Map[String, String] = Map(
    "zorder_layout" ->
      """WITH t AS (
        |  SELECT (l_partkey % 1024)::BIGINT AS x, (l_suppkey % 1024)::BIGINT AS y FROM lineitem),
        |z AS (
        |  SELECT x, y,
        |    list_sum(list_transform(range(0, 10), i ->
        |      (((x >> i) & 1) << (2*i)) + (((y >> i) & 1) << (2*i + 1))))::BIGINT AS z
        |  FROM t)
        |SELECT (z >> 12)::BIGINT AS bucket, count(*) AS n,
        |  min(x)::BIGINT AS x_min, max(x)::BIGINT AS x_max,
        |  min(y)::BIGINT AS y_min, max(y)::BIGINT AS y_max
        |FROM z GROUP BY 1""".stripMargin,
    "stream_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, floor(epoch(ts))::BIGINT AS sec, event_type FROM events),
        |l AS (SELECT event_id, user_id, sec FROM e WHERE event_type = 'click'),
        |r AS (SELECT user_id, sec, max(event_id) AS r_id FROM e
        |      WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.sec, r.r_id AS last_purchase_id,
        |  (l.sec - r.sec)::BIGINT AS gap_sec
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.sec <= l.sec""".stripMargin,
    "asof_purchase" ->
      """WITH e AS (
        |  SELECT event_id, user_id, floor(epoch(ts))::BIGINT AS sec, event_type FROM events),
        |l AS (SELECT event_id, user_id, sec FROM e WHERE event_type = 'click'),
        |r AS (SELECT user_id, sec, max(event_id) AS r_id FROM e
        |      WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.sec, r.r_id AS last_purchase_id,
        |  (l.sec - r.sec)::BIGINT AS gap_sec
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.sec <= l.sec""".stripMargin,
    "cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS cents_sum
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "interval_click_purchase" ->
      """WITH e AS (
        |  SELECT event_id, user_id, floor(epoch(ts))::BIGINT AS sec, event_type FROM events)
        |SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
        |  (c.sec - p.sec)::BIGINT AS dt_sec
        |FROM e c JOIN e p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND c.sec BETWEEN p.sec - 300 AND p.sec + 300""".stripMargin,
    "stream_interval_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, floor(epoch(ts))::BIGINT AS sec, event_type FROM events)
        |SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
        |  (c.sec - p.sec)::BIGINT AS dt_sec
        |FROM e c JOIN e p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND c.sec BETWEEN p.sec - 300 AND p.sec + 300""".stripMargin,
    "stream_distinct_users" ->
      """SELECT (floor(epoch(ts))::BIGINT // 300) * 300 AS window_start, event_type,
        |  count(DISTINCT user_id)::BIGINT AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin,
    "stream_distinct_hll" ->
      """SELECT (floor(epoch(ts))::BIGINT // 300) * 300 AS window_start, event_type,
        |  count(DISTINCT user_id)::BIGINT AS n_users, TRUE AS err_ok
        |FROM events GROUP BY 1, 2""".stripMargin,
    "percentiles_price" ->
      """WITH s AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  max(CASE WHEN rn = floor(0.5 * (n - 1))::BIGINT + 1 THEN l_extendedprice END) AS p50,
        |  max(CASE WHEN rn = floor(0.9 * (n - 1))::BIGINT + 1 THEN l_extendedprice END) AS p90,
        |  max(CASE WHEN rn = floor(0.99 * (n - 1))::BIGINT + 1 THEN l_extendedprice END) AS p99
        |FROM s GROUP BY l_returnflag""".stripMargin,
    "salted_type_stats" ->
      """SELECT event_type, count(*) AS n,
        |  sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS value_sum
        |FROM events GROUP BY event_type""".stripMargin,
    "x1_partition" ->
      """SELECT n::BIGINT AS n, flavors FROM (VALUES
        |  (1, ''),
        |  (2, ''),
        |  (3, '3'),
        |  (4, '3'),
        |  (5, '3'),
        |  (6, '6'),
        |  (7, '7'),
        |  (8, '7'),
        |  (9, '6,3'),
        |  (10, '7,3'),
        |  (11, '7,3'),
        |  (12, '6,6'),
        |  (13, '7,6'),
        |  (14, '7,7'),
        |  (15, '6,6,3'),
        |  (16, '7,6,3'),
        |  (17, '7,7,3'),
        |  (18, '6,6,6'),
        |  (19, '7,6,6'),
        |  (20, '7,7,6'),
        |  (21, '7,7,7'),
        |  (22, '7,6,6,3'),
        |  (23, '7,7,6,3'),
        |  (24, '7,7,7,3'),
        |  (25, '7,6,6,6'),
        |  (26, '7,7,6,6'),
        |  (27, '7,7,7,6'),
        |  (28, '7,7,7,7'),
        |  (29, '7,7,6,6,3'),
        |  (30, '7,7,7,6,3'),
        |  (31, '7,7,7,7,3'),
        |  (32, '7,7,6,6,6'),
        |  (33, '7,7,7,6,6'),
        |  (34, '7,7,7,7,6'),
        |  (35, '7,7,7,7,7'),
        |  (36, '7,7,7,6,6,3'),
        |  (37, '7,7,7,7,6,3'),
        |  (38, '7,7,7,7,7,3'),
        |  (39, '7,7,7,6,6,6'),
        |  (40, '7,7,7,7,6,6'),
        |  (41, '7,7,7,7,7,6'),
        |  (42, '7,7,7,7,7,7'),
        |  (43, '7,7,7,7,6,6,3'),
        |  (44, '7,7,7,7,7,6,3'),
        |  (45, '7,7,7,7,7,7,3'),
        |  (46, '7,7,7,7,6,6,6'),
        |  (47, '7,7,7,7,7,6,6'),
        |  (48, '7,7,7,7,7,7,6'),
        |  (49, '7,7,7,7,7,7,7'),
        |  (50, '7,7,7,7,7,6,6,3'),
        |  (51, '7,7,7,7,7,7,6,3'),
        |  (52, '7,7,7,7,7,7,7,3'),
        |  (53, '7,7,7,7,7,6,6,6'),
        |  (54, '7,7,7,7,7,7,6,6'),
        |  (55, '7,7,7,7,7,7,7,6'),
        |  (56, '7,7,7,7,7,7,7,7'),
        |  (57, '7,7,7,7,7,7,6,6,3'),
        |  (58, '7,7,7,7,7,7,7,6,3'),
        |  (59, '7,7,7,7,7,7,7,7,3'),
        |  (60, '7,7,7,7,7,7,6,6,6')) t(n, flavors)""".stripMargin,
    "s1_face_tsv" ->
      """SELECT face::BIGINT AS face, n_rows::BIGINT AS n_rows, sum_mod::BIGINT AS sum_mod,
        |  sum_x::DOUBLE AS sum_x, sum_y::DOUBLE AS sum_y, sum_z::DOUBLE AS sum_z
        |FROM (VALUES
        |  (1, 902, 407253, 0.0, 7526.7, 2704421.5),
        |  (2, 893, 399311, 376.35, 1028.4, 2683911.5),
        |  (3, 902, 407253, 0.0, 7526.7, 2725167.5),
        |  (4, 893, 399311, 376.35, 1028.4, 2704450.5)
        |) t(face, n_rows, sum_mod, sum_x, sum_y, sum_z)""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "p1_transform_fwd" ->
      """WITH src AS (
        |  SELECT p_partkey, p_retailprice AS x,
        |         ((p_partkey % 1000)::DOUBLE - 500) AS y, 3000.0::DOUBLE AS z
        |  FROM part)
        |SELECT p_partkey,
        |  round(sqrt(x*x + y*y), 6) AS r,
        |  round(atan2(sqrt(x*x + y*y), z), 6) AS theta,
        |  round(-ln(tan(atan2(sqrt(x*x + y*y), z) / 2)), 6) AS eta,
        |  round(atan2(y, x), 6) AS phi
        |FROM src""".stripMargin,
    "p4_degrad" ->
      """SELECT deg::DOUBLE AS deg, rad::DOUBLE AS rad FROM (VALUES
        |  (-177.5, -3.097959422),
        |  (-150.0, -2.617993878),
        |  (-112.0, -1.954768762),
        |  (-90.0, -1.570796327),
        |  (-68.0, -1.186823891),
        |  (-30.0, -0.523598776),
        |  (-2.5, -0.043633231),
        |  (0.0, 0.0),
        |  (2.5, 0.043633231),
        |  (30.0, 0.523598776),
        |  (45.0, 0.785398163),
        |  (68.0, 1.186823891),
        |  (90.0, 1.570796327),
        |  (112.0, 1.954768762),
        |  (150.0, 2.617993878),
        |  (177.5, 3.097959422),
        |  (180.0, 3.141592654),
        |  (270.0, 4.71238898),
        |  (359.9, 6.281439978)
        |) t(deg, rad)""".stripMargin,
    "p2_transform_inv" ->
      """WITH src AS (
        |  SELECT o_orderkey,
        |    (1.659 + (o_orderkey % 997)::DOUBLE / 997.0 * 1.341) AS eta,
        |    (((o_orderkey % 611)::DOUBLE / 611.0 - 0.5) * pi()) AS phi
        |  FROM orders),
        |k AS (SELECT o_orderkey, 2.0 * atan(exp(-eta)) AS theta, phi FROM src)
        |SELECT o_orderkey,
        |  round(3000.0 * tan(theta) * cos(phi), 6) AS x,
        |  round(3000.0 * tan(theta) * sin(phi), 6) AS y
        |FROM k""".stripMargin,
    "p9_physics" ->
      """WITH src AS (SELECT s_suppkey, (315.0 + (s_suppkey % 870)::DOUBLE) AS r FROM supplier),
        |f AS (SELECT s_suppkey, r, (-9.053e+00 + 7.420e+03 / r + 3.664e-03 * r) AS fl FROM src)
        |SELECT s_suppkey,
        |  round(fl, 6) AS fluence,
        |  round(0.75 + (20 * fl * 1e14 * (256 * 0.13 * 0.13 * 0.005) * 3.70235e-19 * 1e3) * 1, 6) AS current_ma,
        |  round(0.11 + 91297.0 / (r * r), 6) AS occupancy
        |FROM f""".stripMargin,
    "p14_bv_curves" ->
      """SELECT c.curve, (g.g * 100 + 316)::DOUBLE AS r,
        |  round(c.a * ln((g.g * 100 + 316)::DOUBLE) - c.b, 6) AS r_min
        |FROM (VALUES
        |  ('fbk_w13_10fc', 363.91::DOUBLE, 1834.6::DOUBLE),
        |  ('fbk_w13_15fc', 333.15::DOUBLE, 1664.5::DOUBLE),
        |  ('fbk_w13_2p5fc', 499.43::DOUBLE, 2618.8::DOUBLE),
        |  ('fbk_w13_5fc', 435.93::DOUBLE, 2251.2::DOUBLE),
        |  ('fbk_w15_5fc', 497.95::DOUBLE, 2630.6::DOUBLE),
        |  ('fbk_w19_5fc', 307.12::DOUBLE, 1468.9::DOUBLE),
        |  ('hpk_split4_10fc', 481.91::DOUBLE, 2544.6::DOUBLE),
        |  ('hpk_split4_15fc', 446.32::DOUBLE, 2338.6::DOUBLE),
        |  ('hpk_split4_2p5fc', 578.03::DOUBLE, 3103.6::DOUBLE),
        |  ('hpk_split4_5fc', 526.14::DOUBLE, 2792.0::DOUBLE)
        |) c(curve, a, b)
        |CROSS JOIN generate_series(0, 8) g(g)""".stripMargin,
    "f9_multihit" ->
      "SELECT l_orderkey, count(*) AS n_items FROM lineitem GROUP BY l_orderkey HAVING count(*) > 4",
    "join_orders_customer" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "j1_spatial_grid" ->
      """WITH pts AS (
        |  SELECT c_custkey, c_acctbal AS px,
        |         ((c_custkey * 37) % 2000 - 1000)::DOUBLE AS py FROM customer),
        |rects AS (
        |  SELECT s_suppkey, s_acctbal - 40 AS ax1, s_acctbal + 40 AS ax2,
        |         ((s_suppkey * 97) % 2000 - 1000)::DOUBLE - 60 AS ay1,
        |         ((s_suppkey * 97) % 2000 - 1000)::DOUBLE + 60 AS ay2 FROM supplier)
        |SELECT s_suppkey, count(*) AS n_hits
        |FROM pts JOIN rects
        |  ON ax1 < px AND px < ax2 AND ay1 < py AND py < ay2
        |GROUP BY s_suppkey""".stripMargin,
    "j1_spatial_shuffle" ->
      """WITH pts AS (
        |  SELECT c_custkey, c_acctbal AS px,
        |         ((c_custkey * 37) % 2000 - 1000)::DOUBLE AS py FROM customer),
        |rects AS (
        |  SELECT s_suppkey, s_acctbal - 40 AS ax1, s_acctbal + 40 AS ax2,
        |         ((s_suppkey * 97) % 2000 - 1000)::DOUBLE - 60 AS ay1,
        |         ((s_suppkey * 97) % 2000 - 1000)::DOUBLE + 60 AS ay2 FROM supplier)
        |SELECT s_suppkey, count(*) AS n_hits
        |FROM pts JOIN rects
        |  ON ax1 < px AND px < ax2 AND ay1 < py AND py < ay2
        |GROUP BY s_suppkey""".stripMargin,
    "j3_pairing" ->
      """WITH rk AS (
        |  SELECT c_nationkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) - 1 AS k
        |  FROM customer)
        |SELECT c_nationkey, (k // 2)::BIGINT AS pair,
        |  round(sum(c_acctbal), 2) AS pair_sum, count(*) AS n_in_pair
        |FROM rk GROUP BY c_nationkey, k // 2""".stripMargin,
    "j5_selfpair" ->
      """SELECT a.l_orderkey, count(*) AS n_pairs,
        |  round(sum(a.l_quantity * b.l_quantity), 2) AS qprod
        |FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber <= b.l_linenumber
        |GROUP BY a.l_orderkey""".stripMargin,
    "a1_minmax" ->
      """SELECT s_nationkey, round(min(s_acctbal), 2) AS min_bal,
        |  round(max(s_acctbal), 2) AS max_bal, count(*) AS n_supp
        |FROM supplier GROUP BY s_nationkey""".stripMargin,
    "hist1d_price" ->
      """WITH b AS (
        |  SELECT least(floor((l_extendedprice - 0.0) / ((80000.0 - 0.0) / 20)), 19)::BIGINT AS bin
        |  FROM lineitem WHERE l_extendedprice >= 0.0 AND l_extendedprice < 80000.0)
        |SELECT bin, count(*) AS n,
        |  round(0.0 + (bin + 0.5) * ((80000.0 - 0.0) / 20), 6) AS center
        |FROM b GROUP BY bin""".stripMargin,
    "hist2d_qty_disc" ->
      """WITH b AS (
        |  SELECT least(floor((l_quantity - 0.0) / ((50.0 - 0.0) / 10)), 9)::BIGINT AS binx,
        |         least(floor((l_discount - 0.0) / ((0.11 - 0.0) / 11)), 10)::BIGINT AS biny
        |  FROM lineitem
        |  WHERE l_quantity >= 0.0 AND l_quantity < 50.0
        |    AND l_discount >= 0.0 AND l_discount < 0.11)
        |SELECT binx, biny, count(*) AS n FROM b GROUP BY binx, biny""".stripMargin,
    "hist3d_qty_disc_line" ->
      """WITH b AS (
        |  SELECT least(floor((l_quantity - 0.0) / ((50.0 - 0.0) / 10)), 9)::BIGINT AS binx,
        |         least(floor((l_discount - 0.0) / ((0.11 - 0.0) / 11)), 10)::BIGINT AS biny,
        |         l_linenumber::BIGINT AS binz
        |  FROM lineitem
        |  WHERE l_quantity >= 0.0 AND l_quantity < 50.0
        |    AND l_discount >= 0.0 AND l_discount < 0.11
        |    AND l_linenumber BETWEEN 1 AND 7)
        |SELECT binx, biny, binz, count(*) AS n FROM b GROUP BY binx, biny, binz""".stripMargin,
    "hist3d_proj_profile" ->
      """WITH b AS (
        |  SELECT least(floor((l_quantity - 0.0) / ((50.0 - 0.0) / 10)), 9)::BIGINT AS binx,
        |         l_linenumber::BIGINT AS binz
        |  FROM lineitem
        |  WHERE l_quantity >= 0.0 AND l_quantity < 50.0
        |    AND l_discount >= 0.0 AND l_discount < 0.11
        |    AND l_linenumber BETWEEN 1 AND 7)
        |SELECT binx, round(sum(binz * cnt)::DOUBLE / sum(cnt), 6) AS mean,
        |  sum(cnt)::BIGINT AS n
        |FROM (SELECT binx, binz, count(*) AS cnt FROM b GROUP BY binx, binz)
        |GROUP BY binx""".stripMargin,
    "profile_price" ->
      """WITH b AS (
        |  SELECT least(floor((l_quantity - 0.0) / ((50.0 - 0.0) / 10)), 9)::BIGINT AS bin,
        |         l_extendedprice AS v
        |  FROM lineitem WHERE l_quantity >= 0.0 AND l_quantity < 50.0)
        |SELECT bin, round(avg(v), 2) AS mean, count(*) AS n,
        |  round(0.0 + (bin + 0.5) * ((50.0 - 0.0) / 10), 6) AS center
        |FROM b GROUP BY bin""".stripMargin,
    "a13_efficiency" ->
      """WITH b AS (
        |  SELECT least(floor((l_discount - 0.0) / ((0.11 - 0.0) / 11)), 10)::BIGINT AS bin,
        |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS sel
        |  FROM lineitem WHERE l_discount >= 0.0 AND l_discount < 0.11)
        |SELECT bin, count(*) AS n, sum(sel)::BIGINT AS k,
        |  round(sum(sel)::DOUBLE / count(*), 6) AS p,
        |  round(sqrt((sum(sel)::DOUBLE / count(*)) * (1 - sum(sel)::DOUBLE / count(*)) / count(*)), 6) AS err
        |FROM b GROUP BY bin""".stripMargin,
    "a15_distinct" ->
      "SELECT DISTINCT p_brand, p_type FROM part",
    "o2_topk" ->
      """SELECT CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk,
        |  o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |FROM orders
        |QUALIFY rk <= 15""".stripMargin,
    "o3_argmax" ->
      """SELECT s_nationkey, s_suppkey, round(s_acctbal, 2) AS best_bal
        |FROM supplier
        |QUALIFY row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) = 1""".stripMargin,
    "o6_runs" ->
      """WITH c AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (
        |  SELECT user_id, event_type,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS run_id
        |  FROM c)
        |SELECT user_id, run_id, min(event_type) AS event_type, count(*) AS run_len
        |FROM r GROUP BY user_id, run_id""".stripMargin,
    "o8_parity" ->
      """WITH rk AS (
        |  SELECT c_nationkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) - 1 AS k
        |  FROM customer)
        |SELECT c_nationkey, (k % 2)::BIGINT AS parity, count(*) AS n,
        |  round(sum(c_acctbal), 2) AS bal_sum
        |FROM rk GROUP BY c_nationkey, k % 2""".stripMargin,
    "stream_windowed_counts" ->
      """SELECT (floor(floor(epoch(ts)) / 300) * 300)::BIGINT AS window_start, event_type,
        |  count(*) AS n, round(sum(value), 2) AS value_sum
        |FROM events GROUP BY 1, 2""".stripMargin,
    "stream_dedup_ttl" ->
      """WITH g AS (
        |  SELECT event_id, user_id, event_type, floor(epoch(ts))::BIGINT AS sec,
        |    floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT) OVER (
        |      PARTITION BY user_id, event_type ORDER BY floor(epoch(ts)), event_id) AS gap
        |  FROM events)
        |SELECT event_id, user_id, event_type, sec
        |FROM g WHERE gap IS NULL OR gap > 14400""".stripMargin,
    "stream_sessionize" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CASE WHEN floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT) OVER w IS NULL
        |           OR floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, sum(new_sess)::BIGINT AS n_sessions, count(*) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,
    "sessionize" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CASE WHEN floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT) OVER w IS NULL
        |           OR floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, sum(new_sess)::BIGINT AS n_sessions, count(*) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,
    "u1_union" ->
      """SELECT 'hi' AS tag, o_orderkey FROM orders WHERE o_totalprice > 250000
        |UNION ALL
        |SELECT 'lo' AS tag, o_orderkey FROM orders WHERE o_totalprice < 5000""".stripMargin,
    "u2_mirror" ->
      """WITH m AS (
        |  SELECT p_partkey, p_retailprice AS x FROM part
        |  UNION ALL
        |  SELECT p_partkey, -p_retailprice AS x FROM part)
        |SELECT p_partkey, count(*) AS n, round(sum(x), 6) AS x_sum,
        |  round(sum(abs(x)), 2) AS abs_sum
        |FROM m GROUP BY p_partkey""".stripMargin
  )
}
