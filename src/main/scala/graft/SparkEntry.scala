package graft

import graft.pipelines.{Acceptance, Layouts}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query: the MC geometric-acceptance study (SURVEY §3.1 step
    * 7) — generate particles, propagate to the four detector faces,
    * grid-bucketed point-in-rect spatial join against the YAML sensor
    * layout, per-event hit counts, η-binned acceptance profile.
    * Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val particles = Acceptance.generateParticles(spark, 50000)
    val sensors = Layouts.faceSensors(spark)
    Acceptance.etaProfileSparse(particles, Acceptance.hitCounts(spark, particles, sensors))
  }

  /** One entry per implemented operator from SURVEY.md §2.
    * Populated in Queries.scala (kept separate — it is large). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles

  /** Bench-only registry: scale-contrast cells whose oracle would be a
    * 1,000-stage CTE chain (engine-side equality proofs in BpeSpec).
    * Deliberately NOT part of `queries` — every `queries` entry carries
    * a DuckDB oracle, keeping the driver's conformance file all-green. */
  def scaleQueries: Map[String, (SparkSession, String) => DataFrame] = Queries.scaleOnly
}
