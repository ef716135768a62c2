package graft

import graft.util.TableIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Event log the staging UDFs write into — an `object`, so executor-
  * side deserialization resolves to the SAME JVM singleton in local
  * mode and the spec can read eval-time windows back. */
object CommitEvalLog {
  val events = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
  def rec(tag: String, sleepMs: Long): Long = {
    Thread.sleep(sleepMs)
    val t = System.currentTimeMillis()
    events.add(tag -> t)
    t
  }
  def times(tag: String): Seq[Long] =
    events.iterator().asScala.collect { case (`tag`, t) => t }.toSeq
  def clear(): Unit = events.clear()
}

/** The r15 commit shape: STAGING RUNS OUTSIDE THE WRITER LEASE
  * (`TableIndex.commitBatch` claims a per-batch staging lease, writes
  * the parquet, and only then takes the index lease for the move
  * phase). These specs pin the contract the refactor exists for:
  *
  *  - two producers appending DIFFERENT batches overlap their staged
  *    writes fully (the eval-time windows of their staging UDFs
  *    interleave — impossible if either write ran under the mutually
  *    exclusive index lease) and both land, neither rolled back;
  *  - a batch commit fired against a HELD lease with `leaseWaitMs`
  *    completes its staged write during the hold and lands after
  *    release — one staging pass, only the cheap move waited;
  *  - a torn earlier attempt of the SAME bid (live files, dead stage)
  *    is rolled back by the retry's move phase, not retroactively
  *    committed alongside the fresh rows;
  *  - repair() skips a LIVE stage (unexpired stage lease) and sweeps a
  *    DEAD one; fsck names the live state `live-stage`.
  */
class ConcurrentCommitSpec extends SparkSpec {

  /** `rows` rows through a sleeping, event-logging UDF, one task —
    * staging takes ≈ rows × perRowMs and every row eval is stamped. */
  private def slowDf(tag: String, rows: Int, perRowMs: Long): DataFrame = {
    val f = udf((x: Long) => CommitEvalLog.rec(tag, perRowMs)).asNondeterministic()
    spark.range(rows).repartition(1).select(col("id"), f(col("id")).as("v"))
  }

  test("two concurrent producers stage in parallel (outside the lease) and both batches land") {
    val idx = graft.util.TempDirs.scratch("cc_pair").toString
    CommitEvalLog.clear()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(tag: String, bid: String): Thread = {
      val t = new Thread(() => {
        try {
          // leaseWaitMs: the move phases still serialize on the index
          // lease — the loser must poll the short move, not fail the job
          assert(TableIndex.commitBatch(spark, idx, bid,
            Seq(("t.parquet", slowDf(tag, 10, 200), Seq.empty)), leaseWaitMs = 30000L))
        } catch { case e: Throwable => errs.add(e) }
      })
      t.setDaemon(true); t.start(); t
    }
    val a = writer("cc_a", "cc-bid-a")
    val b = writer("cc_b", "cc-bid-b")
    a.join(60000); b.join(60000)
    assert(errs.isEmpty, s"concurrent commit failed: ${errs.asScala.toList}")
    assert(TableIndex.isCommitted(spark, idx, "cc-bid-a"))
    assert(TableIndex.isCommitted(spark, idx, "cc-bid-b"))
    assert(TableIndex.snapshotTable(spark, idx, "t.parquet").get.count() == 20L,
      "a concurrent commit rolled the other's rows back")
    // the staged-write windows must OVERLAP: each write takes ~2 s, and
    // under the pre-r15 shape (write inside the mutually exclusive
    // lease) the two windows could never interleave
    val ta = CommitEvalLog.times("cc_a"); val tb = CommitEvalLog.times("cc_b")
    assert(ta.nonEmpty && tb.nonEmpty)
    assert(ta.min < tb.max && tb.min < ta.max,
      s"staged writes did NOT overlap (a=[${ta.min},${ta.max}] b=[${tb.min},${tb.max}]) — " +
        "staging is still serialized under the index lease")
    // no staging junk left behind (the empty `_staging` parent may
    // survive — only bid stages matter)
    val leftover = Option(new java.io.File(s"$idx/_staging").listFiles()).map(_.toSeq).getOrElse(Nil)
    assert(leftover.isEmpty, s"stage dirs leaked after commits: $leftover")
  }

  test("bounded-wait commit: staged under a contender's hold, lands after release, one staging pass") {
    val idx = graft.util.TempDirs.scratch("cc_wait").toString
    CommitEvalLog.clear()
    val token = TableIndex.acquireLease(spark, idx)
    @volatile var landed = false
    @volatile var err: Option[Throwable] = None
    val t = new Thread(() => {
      try landed = TableIndex.commitBatch(spark, idx, "cc-wait-b1",
        Seq(("t.parquet", slowDf("cc_w", 5, 150), Seq.empty)), leaseWaitMs = 30000L)
      catch { case e: Throwable => err = Some(e) }
    })
    t.setDaemon(true); t.start()
    Thread.sleep(2500) // long enough for the ~0.75 s staged write to finish under the hold
    val releaseAt = System.currentTimeMillis()
    TableIndex.releaseLease(spark, idx, token)
    t.join(60000)
    err.foreach(e => fail(s"bounded-wait commit failed: $e"))
    assert(landed, "bounded-wait commit did not land after the lease release")
    val evals = CommitEvalLog.times("cc_w")
    assert(evals.size == 5, s"staged write ran ${evals.size}/5 row evals — re-staged?")
    assert(evals.max < releaseAt,
      "staging waited for the lease — the write must complete during the contender's hold")
    assert(TableIndex.snapshotTable(spark, idx, "t.parquet").get.count() == 5L)
  }

  test("a torn earlier attempt of the SAME bid is rolled back by the retry, not committed alongside") {
    import spark.implicits._
    val idx = graft.util.TempDirs.scratch("cc_torn").toString
    new java.io.File(s"$idx/t.parquet").mkdirs()
    // the crash left: one live (moved, unmarked) file + a DEAD stage
    val tmp = graft.util.TempDirs.scratch("cc_torn_rows").toString + "/x"
    Seq((999L, 999L)).toDF("id", "v").write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
    assert(part.renameTo(new java.io.File(s"$idx/t.parquet/b_cc-torn__${part.getName}")))
    new java.io.File(s"$idx/_staging/cc-torn").mkdirs()
    // the retry (same bid) must kill the torn file before its marker
    assert(TableIndex.commitBatch(spark, idx, "cc-torn",
      Seq(("t.parquet", Seq((1L, 1L), (2L, 2L)).toDF("id", "v"), Seq.empty))))
    val got = TableIndex.snapshotTable(spark, idx, "t.parquet").get
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L),
      s"torn earlier attempt's rows leaked into the committed batch: $got")
  }

  test("repair skips a LIVE stage, sweeps a DEAD one; fsck names live-stage") {
    import spark.implicits._
    val idx = graft.util.TempDirs.scratch("cc_live").toString
    TableIndex.commitBatch(spark, idx, "cc-base",
      Seq(("t.parquet", Seq((1L, 1L)).toDF("id", "v"), Seq.empty)))
    // a live stage: lease file with an unexpired expiry
    val stage = new java.io.File(s"$idx/_staging/cc-live-bid")
    stage.mkdirs()
    java.nio.file.Files.write(new java.io.File(stage, "_stage.lease").toPath,
      s"sometoken ${System.currentTimeMillis() + 60000}".getBytes("UTF-8"))
    java.nio.file.Files.write(new java.io.File(stage, "probe").toPath, "x".getBytes)
    TableIndex.repair(spark, idx)
    assert(stage.exists(), "repair rolled back a LIVE stage (in-progress commit)")
    assert(TableIndex.fsck(spark, idx).exists(f => f.kind == "live-stage" && f.detail == "cc-live-bid"),
      "fsck did not name the live stage")
    // expire the stage lease: now it is a dead (torn) stage — swept
    java.nio.file.Files.write(new java.io.File(stage, "_stage.lease").toPath,
      s"sometoken ${System.currentTimeMillis() - 60000}".getBytes("UTF-8"))
    TableIndex.repair(spark, idx)
    assert(!stage.exists(), "repair did not sweep the dead stage")
    assert(TableIndex.snapshotTable(spark, idx, "t.parquet").get.count() == 1L)
  }
}
