package graft.text

import graft.util.Pin
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** GPT-style sequence packing: concatenate the deterministically
  * shuffled token stream and slice it into fixed-budget training
  * sequences, letting documents straddle sequence boundaries (the
  * standard "concat-and-chunk" pretraining layout, cf. GPT-3 §2.3 /
  * The Pile's packing step).
  *
  * The running token offset is a DISTRIBUTED prefix sum:
  *   1. range-partition the corpus by the shuffle key (one exchange —
  *      the only one in the plan),
  *   2. cumulative-sum within each sorted partition (a per-partition
  *      running-carry scan: this is genuine per-partition imperative
  *      logic, the one shape `mapPartitions` exists for — a
  *      `Window.partitionBy(pid)` would re-exchange the whole corpus
  *      because the checkpointed scan's partitioning is opaque to
  *      Catalyst),
  *   3. add the exclusive prefix of per-partition totals — a
  *      #partitions-row aggregate, broadcast back.
  * No global window anywhere: a `Window.orderBy` without partitioning
  * serializes the corpus through one task, which is exactly the shape
  * that dies at 100 TB. Here every stage is bounded by one range
  * partition and driver state is one long per partition.
  *
  * The shuffle key is `md5(id)` — deterministic, engine-portable
  * (DuckDB's md5 yields the identical hex string), and uniform, so
  * range partitions balance without sampling skew.
  */
object Packing {

  /** One row per (document, training sequence) span.
    *
    * @param docs      input with `idCol` (integral) and a token count
    * @param budget    tokens per packed training sequence
    * @param parts     range partitions for the prefix sum (pass the
    *                  session shuffle parallelism; at cluster scale,
    *                  ~corpus_tokens / (budget * 1e6))
    * @return columns: id, seq_id (0-based packed-sequence index),
    *         seq_tokens (tokens this doc contributes to that sequence)
    */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: String,
                    budget: Int, parts: Int, reliable: Boolean = false): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._

    // pin the partition assignment: the totals pass and the cumsum
    // pass must see identical pids and row order. Mode trade-off
    // (executor-local blocks vs reliable checkpoint storage) is
    // [[graft.util.Pin]]'s contract; pass reliable = true on long
    // production jobs where an executor loss must not fail the run.
    val keyed = Pin(docs
      .select(col(idCol).cast("long").as("id"), col(tokensCol).cast("long").as("toks"))
      // zero-token docs occupy no span; dropping them keeps the
      // sequence() bounds well-ordered (start <= cum - 1 iff toks >= 1)
      .filter(col("toks") > 0)
      .withColumn("ord", md5(col("id").cast("string")))
      .repartitionByRange(parts, col("ord"), col("id"))
      .sortWithinPartitions("ord", "id")
      .withColumn("pid", spark_partition_id()),
      reliable)

    // exclusive prefix of per-partition token totals (one long per
    // partition — driver state is O(parts), not O(rows))
    val offsets: Seq[(Int, Long)] = {
      val totals = keyed.groupBy("pid").agg(sum("toks").as("t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1).toSeq
      totals.map(_._1).zip(totals.scanLeft(0L)(_ + _._2))
    }
    val offDf = broadcast(offsets.toDF("pid", "off"))

    // per-partition running carry over the checkpointed sort order
    val toksIdx = keyed.schema.fieldIndex("toks")
    val cum = keyed.mapPartitions { it =>
      var acc = 0L
      it.map { r => acc += r.getLong(toksIdx); Row.fromSeq(r.toSeq :+ acc) }
    }(Encoders.row(keyed.schema.add("pcum", LongType, nullable = false)))

    val b = lit(budget.toLong)
    cum
      .join(offDf, Seq("pid"), "left")
      .na.fill(0L, Seq("off"))
      .withColumn("cum", col("pcum") + col("off"))
      .withColumn("start", col("cum") - col("toks"))
      // the sequences this doc spans: floor(start/B) .. floor((cum-1)/B)
      .withColumn("seq_id", explode(sequence(
        expr(s"start div ${budget}L"), expr(s"(cum - 1L) div ${budget}L"))))
      .select(
        col("id"),
        col("seq_id"),
        (least(col("cum"), (col("seq_id") + 1L) * b) -
          greatest(col("start"), col("seq_id") * b)).as("seq_tokens"))
  }

  /** Deterministic down-sampling to a per-group token budget: order
    * each group's documents by a salted portable hash (an arbitrary
    * but reproducible shuffle), admit documents while the group's
    * running token total is still under `budget` (the admitting
    * document may overshoot — "fill until full" semantics, the form
    * subset builders like FineWeb's subsamples use).
    *
    * The running total is the GROUPED form of [[packSequences]]'s
    * distributed prefix sum: one range exchange on (group, hash), a
    * per-partition carry scan that RESETS at group boundaries (groups
    * are contiguous within a partition under the range partitioning),
    * and per-(partition, group) totals rolled into per-group exclusive
    * offsets on the driver — O(parts + groups crossing a partition
    * boundary) driver state, never a per-group global window (a
    * billion-doc group would serialize through one task there; here it
    * just spans many range partitions like any other key range).
    *
    * Same fault-tolerance note as [[packSequences]]: the pinned
    * partition order uses [[graft.util.Pin]] (`localCheckpoint` by
    * default, reliable checkpoint with `reliable = true`).
    *
    * @return the ADMITTED rows: (group, id, toks, cum_before) with
    *         cum_before = group tokens ahead of this doc in hash order
    */
  def sampleToBudget(docs: DataFrame, idCol: String, tokensCol: String,
                     groupCol: String, budget: Long, parts: Int, salt: String,
                     reliable: Boolean = false): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._

    val keyed = Pin(docs
      .select(
        col(groupCol).cast("string").as("grp"),
        col(idCol).cast("long").as("id"),
        col(tokensCol).cast("long").as("toks"))
      .filter(col("toks") > 0)
      .withColumn("ord", md5(concat(col("id").cast("string"), lit(salt))))
      .repartitionByRange(parts, col("grp"), col("ord"), col("id"))
      .sortWithinPartitions("grp", "ord", "id")
      .withColumn("pid", spark_partition_id()),
      reliable)

    // per-(partition, group) totals → per-group exclusive offsets in
    // pid order; only groups that span a boundary contribute >1 row
    val offsets: Seq[(Int, String, Long)] = keyed
      .groupBy("pid", "grp").agg(sum("toks").as("t"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(r => (r._2, r._1))
      .toSeq
      .groupBy(_._2)
      .iterator
      .flatMap { case (grp, rows) =>
        val sorted = rows.sortBy(_._1)
        sorted.map(_._1).zip(sorted.scanLeft(0L)(_ + _._3)).map {
          case (pid, off) => (pid, grp, off)
        }
      }
      .toSeq
    val offDf = broadcast(offsets.toDF("pid", "grp", "off"))

    // per-partition carry, reset at group boundaries (rows are sorted
    // by grp within the pinned partitions)
    val grpIdx = keyed.schema.fieldIndex("grp")
    val toksIdx = keyed.schema.fieldIndex("toks")
    val cum = keyed.mapPartitions { it =>
      var acc = 0L
      var cur: String = null
      it.map { r =>
        val g = r.getString(grpIdx)
        if (g != cur) { cur = g; acc = 0L }
        acc += r.getLong(toksIdx)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }(Encoders.row(keyed.schema.add("pcum", LongType, nullable = false)))

    cum
      .join(offDf, Seq("pid", "grp"), "left")
      .na.fill(0L, Seq("off"))
      .withColumn("cum_before", col("pcum") + col("off") - col("toks"))
      .filter(col("cum_before") < budget)
      .select(col("grp"), col("id"), col("toks"), col("cum_before"))
  }
}
