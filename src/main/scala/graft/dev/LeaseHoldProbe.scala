package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures how long `TableIndex.commitBatch` holds the INDEX writer
  * lease relative to the whole commit, on a deliberately slow staged
  * write (a sleeping UDF prices the parquet write at ~3 s — the
  * "multi-second staged write" stand-in for a real shard). A sampler
  * thread polls `_writer.lease` existence at 10 ms resolution.
  *
  * Run against the r14 tree (staging INSIDE the lease) the hold ≈ the
  * full commit; against the r15 tree the hold is the move phase only —
  * the before/after for the stage-outside-the-lease refactor. Uses
  * only the public commitBatch(dir, bid, tables) arity so the same
  * source runs unmodified on both trees. */
object LeaseHoldProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("lease-hold-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val slow = udf((x: Long) => { Thread.sleep(300L); x }).asNondeterministic()
    for (pass <- 1 to 3) {
      val idx = graft.util.TempDirs.scratch("leasehold").toString
      val lease = new java.io.File(s"$idx/_writer.lease")
      @volatile var sampling = true
      @volatile var heldMs = 0L
      val sampler = new Thread(() => {
        var firstSeen = 0L
        var lastSeen = 0L
        while (sampling) {
          if (lease.exists()) {
            val now = System.currentTimeMillis()
            if (firstSeen == 0L) firstSeen = now
            lastSeen = now
          }
          Thread.sleep(10)
        }
        heldMs = if (firstSeen == 0L) 0L else lastSeen - firstSeen
      })
      sampler.setDaemon(true); sampler.start()
      val df = spark.range(10).repartition(1).select(col("id"), slow(col("id")).as("v"))
      val t0 = System.currentTimeMillis()
      graft.util.TableIndex.commitBatch(spark, idx, f"hold-$pass",
        Seq(("t.parquet", df, Seq.empty)))
      val totalMs = System.currentTimeMillis() - t0
      Thread.sleep(50); sampling = false; sampler.join(2000)
      println(f"pass $pass: commit total ${totalMs}%d ms, writer-lease held ~${heldMs}%d ms " +
        f"(${heldMs * 100.0 / totalMs}%.0f%% of the commit)")
    }
    spark.stop()
  }
}
