package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The driver-checked operator conformance surface (SURVEY §2 inventory
  * re-expressed over the /root/testdata TPC-H-ish tables, plus the
  * training-data-pipeline operators over documents/embeddings).
  *
  * Contract: for every key in `all`, `oracles` should carry equivalent
  * ANSI SQL for DuckDB over the same parquet tables (column names must
  * match — the driver sorts columns by name and hashes values). Ops not
  * expressible in SQL get a rows-only check (no oracle entry).
  *
  * Float discipline: aggregates over doubles are rounded (sum order is
  * nondeterministic in both engines); per-row transcendental results are
  * rounded to 6 decimals (JVM vs libm last-ulp).
  */
object Queries {

  private def t(dir: String, name: String)(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** q1: pricing-summary aggregation (A2/A5/A14-style). */
  private def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("n_rows")
      )
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _)
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
