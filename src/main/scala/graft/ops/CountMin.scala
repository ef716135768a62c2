package graft.ops

import graft.text.SimHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005) — the
  * frequency companion to the HLL distinct sketch
  * ([[graft.streaming.EventStreams.distinctUsersApprox]]): a
  * `depth × width` counter grid answering "how often did item x occur"
  * within additive overcount, in `depth × width` longs of state no
  * matter how large the item universe is. The pipeline use is vocab /
  * heavy-hitter telemetry over token streams where an exact per-token
  * count table (one row per DISTINCT token — billions for web-scale
  * n-gram vocabularies) is the thing being avoided.
  *
  * Determinism is the design constraint, as with the quality
  * classifier's integer GD: every counter is a SUM of occurrence
  * counts (commutative, order-independent), and the row hashes are the
  * portable md5-based [[SimHash.tokenHash]] seeded by row index — so
  * the sketch is bit-identical across partitionings and re-runs, and a
  * DuckDB oracle replays the ENTIRE sketch (cells, estimates, ranks)
  * exactly, unlike a Misra-Gries/Space-Saving summary whose contents
  * depend on merge order.
  *
  * Scale shape: [[sketch]] is one map-side explode (×depth) into a
  * partially-aggregated groupBy with AT MOST depth·width output rows —
  * a dim-table, whatever the corpus size. [[estimate]] broadcasts the
  * sketch and map-side-joins candidates against it (no corpus
  * exchange). The sketch MERGES by cell-wise sum — shard sketches
  * union + re-aggregate to exactly the whole-corpus sketch
  * (spec-pinned), which is what makes it a one-pass streaming/
  * incremental-friendly statistic.
  *
  * Guarantee (deterministic half): est(x) ≥ true(x) always — every
  * occurrence of x lands in all `depth` of x's cells; collisions only
  * ADD. The probabilistic half (est ≤ true + εN w.h.p.) is measured,
  * not assumed: the conformance row emits both sides so the oracle
  * re-derives the observed error.
  */
object CountMin {

  /** Standard (ε, δ) → grid sizing (Cormode & Muthukrishnan 2005,
    * §4.1): `width = ⌈e/ε⌉` makes each row's expected collision mass
    * ≤ (ε/e)·N, so by Markov a single row overcounts x by more than
    * ε·N with probability ≤ 1/e; `depth = ⌈ln(1/δ)⌉` independent rows
    * drive the min's failure probability to ≤ (1/e)^depth ≤ δ. The
    * resulting contract, self-serve: true(x) ≤ est(x) ≤ true(x) + ε·N
    * with probability ≥ 1 − δ per item, in `depth · width` longs of
    * state. Heavy-hitter use: a threshold-φN report from this grid
    * has NO false negatives (deterministic overcount) and any false
    * positive's true count exceeds (φ − ε)·N w.p. ≥ 1 − δ — pick
    * ε ≤ φ/2 to make impostors at least half-heavy. */
  def dims(eps: Double, delta: Double): (Int, Int) = {
    require(eps > 0 && eps < 1, s"CountMin.dims: eps must be in (0,1), got $eps")
    require(delta > 0 && delta < 1, s"CountMin.dims: delta must be in (0,1), got $delta")
    (math.max(1, math.ceil(math.log(1.0 / delta)).toInt),
      math.ceil(math.E / eps).toInt)
  }

  /** [[sketch]] sized from an accuracy contract instead of raw grid
    * dims — the self-serve constructor. */
  def sketchBounded(items: DataFrame, itemCol: String, eps: Double, delta: Double): DataFrame = {
    val (depth, width) = dims(eps, delta)
    sketch(items, itemCol, depth, width)
  }

  /** Row-r cell of an item: portable 60-bit md5 hash of "r_item" mod
    * width — replayable in ANSI SQL as
    * `('0x' || substr(md5(r || '_' || item), 1, 15))::BIGINT % width`. */
  def cellOf(r: Column, item: Column, width: Int): Column =
    pmod(SimHash.tokenHash(concat(r.cast("string"), lit("_"), item)), lit(width.toLong))

  /** The sketch table (r, cell, c): one partial-aggregated exchange
    * over ≤ depth·width keys, corpus scanned once map-side. */
  def sketch(items: DataFrame, itemCol: String, depth: Int, width: Int): DataFrame =
    items.select(col(itemCol).cast("string").as("item"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"), col("item"))
      .select(col("r"), cellOf(col("r"), col("item"), width).as("cell"))
      .groupBy("r", "cell").agg(count(lit(1)).as("c"))

  /** Point estimates for candidate items: min over the depth rows of
    * the item's cell counters. The sketch side broadcasts (dim-table
    * by construction); absent cells count 0 (an item whose cell no row
    * ever touched has estimate 0 on that row — the left join keeps the
    * min honest for never-seen candidates). */
  def estimate(sk: DataFrame, candidates: DataFrame, itemCol: String,
               depth: Int, width: Int): DataFrame =
    candidates.select(col(itemCol).cast("string").as("item")).distinct()
      .select(col("item"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("item"), col("r"), cellOf(col("r"), col("item"), width).as("cell"))
      .join(broadcast(sk), Seq("r", "cell"), "left")
      .groupBy("item").agg(min(coalesce(col("c"), lit(0L))).as("est"))
}
