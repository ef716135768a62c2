package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join — for every left row, the right row with the
  * greatest timestamp ≤ the left row's timestamp within the same key
  * (the "latest prior fact" join of event/market-data pipelines).
  *
  * Spark has no native as-of join; the naive formulations die at scale:
  * a range-predicate join (`l.key = r.key AND r.ts <= l.ts`) explodes
  * to one row per (left × prior-right) before a per-left argmax prunes
  * it, and a correlated subquery isn't distributed at all. This
  * operator instead UNIONS the tagged sides and does ONE per-key
  * sort-window pass, carrying the last-seen right row forward:
  * per-row state is one struct, output is |left| rows, and the plan is
  * exactly one hash exchange (by key) + sort — the same shape a
  * sessionize has, keyed high-cardinality.
  *
  * Determinism: right rows must be unique per (key, ts) — callers
  * dedup first (e.g. keep max id per key/ts; the conformance query
  * does exactly that, mirrored in its oracle). At equal timestamps the
  * right row sorts BEFORE the left row (tag desc), so `ts_r = ts_l`
  * matches — the same inclusive contract as DuckDB/kdb asof joins.
  */
object AsOfJoin {

  /** left:  (key, ts, id)   — rows to annotate;
    * right: (key, ts, id)   — facts to look up, unique per (key, ts).
    * Returns (id, key, ts, asof_id, asof_ts) with null asof columns for
    * left rows preceding every right row of their key. */
  def lastPrior(left: DataFrame, right: DataFrame,
                keyCol: String, tsCol: String, idCol: String): DataFrame = {
    val l = left.select(
      col(keyCol).as("k"), col(tsCol).cast("long").as("t"),
      col(idCol).cast("long").as("id"), lit(0).as("is_r"))
    val r = right.select(
      col(keyCol).as("k"), col(tsCol).cast("long").as("t"),
      col(idCol).cast("long").as("id"), lit(1).as("is_r"))
    // right sorts before left at equal t (inclusive asof); id breaks
    // residual ties deterministically
    val w = Window.partitionBy("k").orderBy(col("t"), desc("is_r"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("carry",
        last(when(col("is_r") === 1, struct(col("id").as("rid"), col("t").as("rt"))),
          ignoreNulls = true).over(w))
      .filter(col("is_r") === 0)
      .select(
        col("id"), col("k"), col("t"),
        col("carry.rid").as("asof_id"),
        col("carry.rt").as("asof_ts"))
  }
}
