package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming dedup path against the RocksDB state store provider —
  * the provider a 100 TB pipeline would run (state spills to local
  * disk instead of living on the executor heap, and snapshot/changelog
  * checkpointing bounds recovery time). The engine's stateful ops are
  * provider-agnostic by construction; this spec proves the wiring by
  * running first-seen dedup under RocksDB and asserting both the
  * results and that RocksDB actually held the state (provider-specific
  * metrics present in the query progress).
  */
class RocksDbStateSpec extends SparkSpec {

  test("streaming first-seen dedup runs on the RocksDB state store provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, Long)]
    val df = mem.toDF().toDF("doc_id", "h")
    val q = EventStreams.dedupFirstSeen(spark, df)
      .writeStream.format("memory").queryName("rocks_dedup").outputMode("append").start()
    try {
      mem.addData((1L, 100L), (2L, 100L), (3L, 200L))
      q.processAllAvailable()
      mem.addData((4L, 200L), (5L, 300L)) // 200 is a dup from batch 1: state crossed batches
      q.processAllAvailable()
      val kept = spark.table("rocks_dedup")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(kept === Set((1L, 100L), (3L, 200L), (5L, 300L)))
      val custom = q.lastProgress.stateOperators.head.customMetrics
      assert(custom.keySet.toArray.exists(_.toString.startsWith("rocksdb")),
        s"expected RocksDB state-store metrics in progress, got ${custom.keySet}")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
}
