package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Library entry point — the way a user drives the engine without
  * reading the driver contract in [[SparkEntry]].
  *
  * {{{
  * import graft.GraftSession
  *
  * val spark = GraftSession.builder().getOrCreate()
  * GraftSession.attach(spark)                  // SQL functions on a reused session
  *
  * val docs = GraftSession.table(spark, "/data/sf0.1", "documents")
  * val pairs = graft.text.MinHashLsh.verifiedPairs(docs, "doc_id", "text", tau = 0.7)
  * val sensors = GraftSession.faceSensors(spark)          // memoized layout dims
  * val acc = GraftSession.query("acc_stats")(spark, "/data/sf0.1")
  * spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
  * }}}
  *
  * The builder pre-applies the confs the engine needs for oracle-exact
  * semantics (UTC session timezone, nanos-as-long parquet timestamps)
  * and registers the custom Catalyst expressions
  * ([[graft.functions.GraftExtensions]]: `graft_dot`,
  * `graft_band_hashes`, `graft_int8_quantize`) via
  * `SparkSessionExtensions`. On a cluster, pass the real master/conf
  * through the returned builder as usual — nothing here is
  * local-mode-specific except the defaults.
  */
object GraftSession {

  /** Pre-configured session builder. `shufflePartitions` should track
    * the cluster's total cores (the engine's plans assume AQE can
    * coalesce down, not split up). */
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.functions.GraftExtensions)

  /** Register the engine's SQL functions on an EXISTING session —
    * `withExtensions` only applies at session creation, so a reused or
    * externally built session attaches here. Idempotent. */
  def attach(spark: SparkSession): Unit =
    graft.functions.GraftExtensions.register(spark)

  /** One of the standard tables (`lineitem`, `orders`, `documents`,
    * `embeddings`, `events`, ...) from a scale-factor directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** A named conformance query (the full SURVEY §2 surface — see
    * [[SparkEntry.queries]] for the catalog). */
  def query(name: String): (SparkSession, String) => DataFrame =
    SparkEntry.queries.getOrElse(
      name,
      throw new NoSuchElementException(
        s"unknown graft query '$name'; available: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))

  /** The session-memoized sensor layout dimension table (active-area
    * corners per face) that the acceptance pipelines join against. */
  def faceSensors(spark: SparkSession): DataFrame =
    graft.pipelines.Layouts.faceSensors(spark)

  /** The session-memoized tiling of a named dee layout
    * ("updated" | "baseline" | "plain"). */
  def tiling(spark: SparkSession, layout: String = "updated"): DataFrame =
    graft.ops.DeeTiling.tileLayout(spark, layout)
}
