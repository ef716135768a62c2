package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Every stateful streaming path against the RocksDB state store
  * provider — the provider a 100 TB pipeline would run (state spills
  * to local disk instead of living on the executor heap, and
  * snapshot/changelog checkpointing bounds recovery time). The
  * engine's stateful ops are provider-agnostic by construction, but
  * each op exercises a different state-codec surface — dropDuplicates
  * keys, windowed-aggregation buffers, a Set-valued aggregation state,
  * and flatMapGroupsWithState case-class state — so each is proven
  * separately: run under RocksDB, assert both the results and that
  * RocksDB actually held the state (provider-specific metrics in the
  * query progress).
  */
class RocksDbStateSpec extends SparkSpec {

  private def ts(min: Int): java.sql.Timestamp =
    new java.sql.Timestamp(1700000000000L + min * 60000L)

  /** Run `body` with the RocksDB provider set, assert the finished
    * query actually reported RocksDB state metrics, restore config. */
  private def underRocksDb(name: String)(start: => StreamingQuery)(body: StreamingQuery => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = start
    try {
      body(q)
      val custom = q.lastProgress.stateOperators.head.customMetrics
      assert(custom.keySet.toArray.exists(_.toString.startsWith("rocksdb")),
        s"$name: expected RocksDB state-store metrics in progress, got ${custom.keySet}")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("streaming first-seen dedup runs on the RocksDB state store provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val df = mem.toDF().toDF("doc_id", "h")
    underRocksDb("dedup")(
      EventStreams.dedupFirstSeen(spark, df)
        .writeStream.format("memory").queryName("rocks_dedup").outputMode("append").start()
    ) { q =>
      mem.addData((1L, 100L), (2L, 100L), (3L, 200L))
      q.processAllAvailable()
      mem.addData((4L, 200L), (5L, 300L)) // 200 is a dup from batch 1: state crossed batches
      q.processAllAvailable()
      val kept = spark.table("rocks_dedup")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(kept === Set((1L, 100L), (3L, 200L), (5L, 300L)))
    }
  }

  test("TTL dedup (event-time-timeout eviction) runs on the RocksDB state store provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Long)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type", "event_id")
    def at(s: Long) = new java.sql.Timestamp((1700000000L + s) * 1000L)
    underRocksDb("ttl_dedup")(
      EventStreams.dedupFirstSeenTtl(spark, df, horizonSec = 100, watermark = "10 seconds")
        .writeStream.format("memory").queryName("rocks_ttl").outputMode("append").start()
    ) { q =>
      mem.addData((at(0), 1L, "a", 1L), (at(50), 1L, "a", 2L))
      q.processAllAvailable()
      mem.addData((at(5000), 2L, "a", 3L)) // advances watermark far past key 1's horizon
      q.processAllAvailable()
      mem.addData((at(6000), 3L, "a", 4L)) // the batch whose timeout sweep evicts key 1
      q.processAllAvailable()
      val kept = spark.table("rocks_ttl").select("event_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L, 4L), s"RocksDB TTL dedup emitted $kept")
      assert(q.lastProgress.stateOperators.head.numRowsTotal <= 2,
        "expired key's state row survived the RocksDB event-time timeout sweep")
    }
  }

  test("streaming paragraph dedup runs on the RocksDB state store provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("doc_id", "pidx", "ph", "para")
    underRocksDb("paragraph dedup")(
      EventStreams.dedupParagraphFirstSeen(spark, df)
        .writeStream.format("memory").queryName("rocks_para").outputMode("append").start()
    ) { q =>
      // hash 100 appears twice in batch 1 (intra-batch minBy) and
      // again in batch 2 (cross-batch state)
      mem.addData((1L, 0L, 100L, "a b"), (1L, 1L, 100L, "a b"), (2L, 0L, 200L, "c d"))
      q.processAllAvailable()
      mem.addData((3L, 0L, 100L, "a b"), (3L, 1L, 300L, "e f"))
      q.processAllAvailable()
      val kept = spark.table("rocks_para")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(kept === Set((1L, 0L, "a b"), (2L, 0L, "c d"), (3L, 1L, "e f")))
    }
  }

  test("windowed counts run on the RocksDB state store provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    underRocksDb("windowed counts")(
      EventStreams.windowedCounts(df)
        .writeStream.format("memory").queryName("rocks_wc").outputMode("append").start()
    ) { q =>
      mem.addData((ts(0), 1L, "click", 1.0), (ts(1), 2L, "click", 2.0), (ts(2), 1L, "view", 3.0))
      q.processAllAvailable()
      mem.addData((ts(60), 1L, "click", 1.0)) // advance watermark, close the window
      q.processAllAvailable()
      val rows = spark.table("rocks_wc").select("event_type", "n", "value_sum")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("click", 2L, 3.0)) && rows.contains(("view", 1L, 3.0)), s"got $rows")
    }
  }

  test("streaming LSH candidates (List-valued bucket state) run on the RocksDB provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Int, Long)]
    val df = mem.toDF().toDF("doc_id", "band", "bucket")
    underRocksDb("lsh candidates")(
      EventStreams.lshCandidatesFirstSeen(spark, df)
        .writeStream.format("memory").queryName("rocks_lsh").outputMode("append").start()
    ) { q =>
      mem.addData((1L, 0, 100L), (2L, 0, 100L))
      q.processAllAvailable()
      mem.addData((3L, 0, 100L)) // joins the bucket across the batch boundary
      q.processAllAvailable()
      val pairs = spark.table("rocks_lsh").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairs")
    }
  }

  test("exact windowed COUNT(DISTINCT) (Set-valued state) runs on the RocksDB provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type")
    underRocksDb("distinct users")(
      EventStreams.distinctUsers(spark, df)
        .writeStream.format("memory").queryName("rocks_du").outputMode("append").start()
    ) { q =>
      mem.addData((ts(0), 1L, "click"), (ts(1), 1L, "click"), (ts(2), 2L, "click"))
      q.processAllAvailable()
      mem.addData((ts(3), 1L, "click"), (ts(4), 3L, "view")) // user 1 again across batches
      q.processAllAvailable()
      mem.addData((ts(60), 9L, "s")); q.processAllAvailable()
      mem.addData((ts(120), 9L, "s")); q.processAllAvailable()
      val rows = spark.table("rocks_du").select("event_type", "n_users")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows.contains(("click", 2L)) && rows.contains(("view", 1L)), s"got $rows")
    }
  }

  test("streaming as-of join (buffered two-stream state) runs on the RocksDB provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val memR = MemoryStream[(java.sql.Timestamp, Long, Long)]
    underRocksDb("as-of join")(
      EventStreams.asOfJoin(
          spark,
          memL.toDF().toDF("ts", "user_id", "event_id"),
          memR.toDF().toDF("ts", "user_id", "event_id"))
        .writeStream.format("memory").queryName("rocks_asof").outputMode("append").start()
    ) { q =>
      memL.addData((ts(5), 1L, 100L))
      memR.addData((ts(2), 1L, 200L))
      q.processAllAvailable()
      memL.addData((ts(60), 9L, 999L)); q.processAllAvailable()
      memL.addData((ts(120), 9L, 998L)); q.processAllAvailable()
      val got = spark.table("rocks_asof").filter($"user_id" === 1L)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
      assert(got == Set((100L, 200L)), s"got $got")
    }
  }

  test("sessionization (flatMapGroupsWithState) runs on the RocksDB provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    underRocksDb("sessionize")(
      EventStreams.sessionize(spark, df, gapSec = 600)
        .writeStream.format("memory").queryName("rocks_sess").outputMode("append").start()
    ) { q =>
      mem.addData((7L, ts(0), "a", 1.0), (7L, ts(2), "b", 2.0))
      q.processAllAvailable()
      mem.addData((7L, ts(42), "c", 4.0)) // 40-min gap closes the first session
      q.processAllAvailable()
      val closed = spark.table("rocks_sess").select("user_id", "n_events", "value_sum")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      assert(closed.contains((7L, 2, 3.0)), s"got $closed")
    }
  }
}
