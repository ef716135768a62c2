package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The driver-checked operator conformance surface (SURVEY §2 inventory
  * re-expressed over the /root/testdata TPC-H-ish tables, the domain
  * fixtures, and the documents/embeddings training-data tables).
  *
  * Contract: for every key in `all`, `oracles` should carry equivalent
  * ANSI SQL for DuckDB over the same parquet tables (column names must
  * match — the driver sorts columns by name and hashes values). Ops not
  * expressible in SQL get a rows-only check (no oracle entry).
  *
  * Float discipline: aggregates over doubles are rounded (sum order is
  * nondeterministic in both engines); per-row transcendental results are
  * rounded to 6 decimals (JVM vs libm last-ulp). Rankings happen on
  * pre-rounded values so ties resolve identically in both engines.
  */
object Queries {

  val all: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.all ++ QueriesText.all ++ QueriesDomain.all

  /** Bench-only scale-contrast cells (no ANSI-SQL oracle can exist;
    * engine-side equality proofs live in the test suites). Disjoint
    * from `all` so the driver's conformance catalog stays all-green. */
  val scaleOnly: Map[String, (SparkSession, String) => DataFrame] =
    QueriesText.scaleOnly

  val oracles: Map[String, String] =
    QueriesCore.oracles ++ QueriesText.oracles ++ QueriesDomain.oracles
}
