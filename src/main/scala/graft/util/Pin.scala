package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage-cut pinning for DataFrames whose downstream passes depend
  * on a FROZEN partition assignment and intra-partition row order
  * (the distributed-prefix-sum operators: sequence packing, budget
  * sampling) or that must be materialized exactly once
  * (perplexity's doc-term table feeding two consumers).
  *
  * Two modes, identical semantics, different fault tolerance:
  *
  *  - `reliable = false` → [[DataFrame.localCheckpoint]]: partitions
  *    are stored on executor block managers with lineage cut. Fastest
  *    (no external IO), but on a real cluster the loss of one
  *    executor makes the pinned RDD unrecoverable and fails the job —
  *    acceptable for bench/batch steps that simply re-run.
  *  - `reliable = true` → [[DataFrame.checkpoint]]: partitions are
  *    written to `SparkContext.getCheckpointDir` (must be set, on
  *    durable shared storage — HDFS/S3 on a cluster). Survives
  *    executor loss; the production mode for long multi-stage
  *    pipelines where a re-run is expensive.
  *
  * Both modes materialize ONE block/file per partition and replay
  * partitions in their stored order, so partition ids
  * (`spark_partition_id()` columns computed before the pin) and
  * per-partition row order are bit-identical across modes — the
  * equality [[graft.PackingSpec]] asserts.
  */
object Pin {

  /** Session conf flag that flips every conf-driven pin site (the
    * SparkEntry query surface) to reliable checkpointing. */
  val ReliableConfKey = "spark.graft.pin.reliable"

  def reliableFromConf(spark: SparkSession): Boolean =
    spark.conf.getOption(ReliableConfKey).exists(_.toBoolean)

  def apply(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) {
      require(
        df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableConfKey pinning requires SparkContext.setCheckpointDir on durable shared storage")
      df.checkpoint()
    } else df.localCheckpoint()

  /** Pin with the mode chosen by [[ReliableConfKey]] (default local). */
  def apply(df: DataFrame): DataFrame = apply(df, reliableFromConf(df.sparkSession))
}
