package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase SALTED aggregation — the standard mitigation for hot
  * grouping keys at cluster scale.
  *
  * A plain `groupBy(k)` hash-partitions every row by `k`; with a
  * low-cardinality or skewed key (a handful of event types across
  * 100 TB of events) one reducer receives a whole key's rows while the
  * rest idle. Salting splits each key into `salts` sub-keys for the
  * first (wide) exchange, so the hot key's partial aggregation spreads
  * across `salts` reducers; the second exchange then combines the
  * ≤ (distinct keys × salts) partial rows — a dimension-table-sized
  * shuffle regardless of input size.
  *
  * Exact (not approximate) for ALGEBRAIC aggregates — those with an
  * associative/commutative merge: count/sum here, min/max/bit_or by
  * extension. The salt is derived from `saltCol` (any high-cardinality
  * column) via xxhash64, not `rand()`, so results are deterministic
  * and oracle-reproducible.
  *
  * NOTE: Spark's map-side partial aggregation already collapses rows
  * per (task, key), which handles MODERATE skew; salting matters when
  * a hot key's row count per task is small but the number of tasks
  * whose output lands on one reducer is huge, or when the per-key
  * partial state itself is large (collect-style aggregates). The
  * operator exists so pipelines can opt in where profiles show reducer
  * skew.
  */
object SaltedAgg {

  /** count + sum(valueCol) per `key`, salted across `salts` reducers.
    * Emits (key, n, value_sum). */
  def countSum(df: DataFrame, key: Column, valueCol: Column, saltCol: Column,
               salts: Int = 16): DataFrame = {
    val partial = df
      .groupBy(key.as("k"), pmod(xxhash64(saltCol), lit(salts)).as("salt"))
      .agg(count(lit(1)).as("pn"), sum(valueCol).as("psum"))
    partial
      .groupBy(col("k"))
      .agg(sum("pn").as("n"), sum("psum").as("value_sum"))
  }
}
