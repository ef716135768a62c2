package graft

import graft.ml.{AnnSearch, IvfIndex}
import graft.text.IncrementalDedup
import graft.util.TableIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The round-13 concurrency story of the persisted indexes:
  *  - SNAPSHOT reads see committed batches only — a reader interleaved
  *    between a writer's move phase and its commit marker gets the
  *    pre-batch index (both indexes), never a torn prefix, and never
  *    repairs (so it cannot roll a live writer's batch back);
  *  - the WRITER LEASE turns the single-writer assumption into a
  *    fail-fast (a second concurrent writer throws), with expiry-steal
  *    for crashed writers;
  *  - batch ids are validated at entry ('__' and '/' would corrupt the
  *    rollback prefix / protocol paths);
  *  - a failed (false-returning) rename ABORTS the commit before the
  *    marker, preserving committed == complete;
  *  - the stream batch-id salt is checkpoint-PATH-normalized.
  */
class SnapshotLeaseSpec extends SparkSpec {

  private def docsDf: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def parquetFiles(path: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val root = new java.io.File(path)
    if (!root.exists()) Seq.empty else walk(root).filter(_.getName.endsWith(".parquet"))
  }

  /** The literal mid-commit on-disk state a reader can race: some of
    * the batch's files ALREADY MOVED live (bid-prefixed), staging
    * record present, NO commit marker yet. */
  private def tearBatch(indexDir: String, bid: String, table: String, rows: DataFrame): Unit = {
    val tmp = graft.util.TempDirs.scratch("snap_torn_rows").toString + "/t"
    rows.write.mode("overwrite").parquet(tmp)
    new java.io.File(s"$indexDir/_staging/$bid").mkdirs()
    val part = parquetFiles(tmp).head
    val dst = new java.io.File(s"$indexDir/$table/b_${bid}__${part.getName}")
    dst.getParentFile.mkdirs()
    assert(part.renameTo(dst), "test setup: could not plant the in-flight file")
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("dedup snapshot probe interleaved mid-commit sees the pre-batch index and repairs nothing") {
    val d = docsDf
    val old = d.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val shard = d.filter(pmod(col("doc_id"), lit(4)) === 0)
    // probing with the shard itself guarantees the sealed batch is
    // OBSERVABLE: once the shard is indexed, every shard doc exact-dups
    // itself — so after != preBatch must hold
    val probe = shard
    val idx = graft.util.TempDirs.scratch("snap_dedup").toString
    IncrementalDedup.buildIndex(old, "doc_id", "text", idx)
    val preBatch = rows(IncrementalDedup.processShard(spark, idx, probe, "doc_id", "text",
      tau = 0.8, snapshot = true))
    // writer crashes (or is still moving) mid-append: a slice of the
    // shard's hash rows is live but unmarked
    val bid = "snap_inflight_0001"
    tearBatch(idx, bid, "hashes.parquet",
      shard.limit(9).select(col("doc_id").cast("long").as("id"),
        xxhash64(graft.text.TextOps.normText(col("text"))).as("h")))
    val tornFile = parquetFiles(s"$idx/hashes.parquet")
      .filter(_.getName.startsWith(s"b_${bid}__"))
    assert(tornFile.nonEmpty, "test setup: no in-flight file planted")
    // the snapshot probe must see the PRE-batch index...
    val during = rows(IncrementalDedup.processShard(spark, idx, probe, "doc_id", "text",
      tau = 0.8, snapshot = true))
    assert(during == preBatch, "snapshot probe observed an uncommitted (torn) batch")
    // ...and must NOT have repaired (a concurrent repair would roll a
    // LIVE writer's batch back — the hazard snapshot reads remove)
    assert(tornFile.forall(_.exists()),
      "snapshot read ran repair() and rolled back the in-flight batch")
    // the writer finishes (replay): now the snapshot sees the batch
    IncrementalDedup.updateIndexInPlace(spark, idx, shard, "doc_id", "text",
      batchId = Some(bid))
    val after = rows(IncrementalDedup.processShard(spark, idx, probe, "doc_id", "text",
      tau = 0.8, snapshot = true))
    val afterPlain = rows(IncrementalDedup.processShard(spark, idx, probe, "doc_id", "text",
      tau = 0.8))
    assert(after == afterPlain, "snapshot diverged from the plain read on a quiescent index")
    assert(after != preBatch, "test fixture too weak: the appended shard changed no probe decision")
  }

  test("ivf snapshot probe interleaved mid-commit sees the pre-batch index (and search too)") {
    import spark.implicits._
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), expr("transform(embedding, x -> cast(x as double))").as("vec"))
    val old = all.filter(pmod(col("id"), lit(7)) =!= 0)
    val fresh = all.filter(pmod(col("id"), lit(7)) === 0)
    val queries = all.filter(pmod(col("id"), lit(50)) === 0).limit(10)
    val centroids = AnnSearch.kmeansCentroidsExact(old, 15, iters = 2)
    val book = AnnSearch.pqBook(old, m = 32, stride = 10)
    val idx = graft.util.TempDirs.scratch("snap_ivf").toString
    IvfIndex.build(old, centroids, book, idx)
    val pre = rows(IvfIndex.nearDupsExact(spark, idx, old, queries, tau = 0.9, snapshot = true))
    val preSearch = rows(IvfIndex.search(spark, idx, old, queries,
      k = 5, nprobe = 3, shortlist = 20, snapshot = true))
    val bid = "snap_ivf_0001"
    tearBatch(idx, bid, "encoded.parquet/cell=0",
      fresh.limit(3).select(col("id").as("n_id"), lit(Array[Byte](0, 0)).as("codes"),
        lit(1.0).as("n_norm")))
    assert(rows(IvfIndex.nearDupsExact(spark, idx, old, queries, tau = 0.9, snapshot = true)) == pre,
      "ivf snapshot nearDupsExact observed an uncommitted batch")
    assert(rows(IvfIndex.search(spark, idx, old, queries,
      k = 5, nprobe = 3, shortlist = 20, snapshot = true)) == preSearch,
      "ivf snapshot search observed an uncommitted batch")
    assert(parquetFiles(s"$idx/encoded.parquet").exists(_.getName.startsWith(s"b_${bid}__")),
      "snapshot read ran repair() and rolled back the in-flight batch")
    // writer completes; snapshot == plain on the sealed index
    IvfIndex.appendInPlace(spark, idx, fresh, batchId = Some(bid))
    val corpus = old.unionByName(fresh)
    assert(rows(IvfIndex.nearDupsExact(spark, idx, corpus, queries, tau = 0.9, snapshot = true)) ==
      rows(IvfIndex.nearDupsExact(spark, idx, corpus, queries, tau = 0.9)),
      "snapshot diverged from the plain read on a quiescent index")
  }

  test("writer lease: a second concurrent writer fails fast; an expired lease is stolen") {
    import spark.implicits._
    val idx = graft.util.TempDirs.scratch("lease").toString
    val rowsDf = Seq((1L, 11L), (2L, 22L)).toDF("id", "h")
    // writer A holds the lease
    val token = TableIndex.acquireLease(spark, idx)
    val e = intercept[IllegalStateException] {
      TableIndex.commitBatch(spark, idx, "lease_b1",
        Seq(("hashes.parquet", rowsDf, Seq.empty)))
    }
    assert(e.getMessage.contains("another writer"), e.getMessage)
    assert(!TableIndex.isCommitted(spark, idx, "lease_b1"),
      "a contended commit still landed")
    TableIndex.releaseLease(spark, idx, token)
    assert(TableIndex.commitBatch(spark, idx, "lease_b1",
      Seq(("hashes.parquet", rowsDf, Seq.empty))), "commit after release failed")
    // a crashed writer's EXPIRED lease is stolen, not honored forever
    TableIndex.acquireLease(spark, idx, leaseMs = -1000L)
    assert(TableIndex.commitBatch(spark, idx, "lease_b2",
      Seq(("hashes.parquet", rowsDf, Seq.empty))), "expired lease was not stolen")
    // the steal's own lease was released on exit
    assert(!new java.io.File(s"$idx/_writer.lease").exists(),
      "lease file leaked after commit")
  }

  test("lease heartbeat keeps a LONG mutation's lease alive past its expiry; a stale one stays stealable") {
    val idx = graft.util.TempDirs.scratch("lease_hb").toString
    // a 300 ms lease, renewed every ~100 ms: after 1 s (3+ expiries) a
    // second writer must STILL be refused — the renewal is what stops
    // a long commit's lease from being stolen mid-mutation
    val token = TableIndex.acquireLease(spark, idx, leaseMs = 300L)
    val hb = TableIndex.startLeaseHeartbeat(spark, idx, token, leaseMs = 300L)
    try {
      Thread.sleep(1000L)
      intercept[IllegalStateException] {
        TableIndex.acquireLease(spark, idx, leaseMs = 300L)
      }
    } finally hb.close()
    // heartbeat stopped: the lease expires and becomes stealable again
    Thread.sleep(500L)
    val thief = TableIndex.acquireLease(spark, idx, leaseMs = 300L)
    TableIndex.releaseLease(spark, idx, thief)
  }

  test("batch ids with '__' or '/' are rejected at entry (rollback-prefix aliasing)") {
    import spark.implicits._
    val idx = graft.util.TempDirs.scratch("badbid").toString
    val df = Seq((1L, 1L)).toDF("id", "h")
    for (bad <- Seq("a__b", "a/b", "", "a b")) {
      intercept[IllegalArgumentException] {
        TableIndex.commitBatch(spark, idx, bad, Seq(("hashes.parquet", df, Seq.empty)))
      }
    }
    // the streaming id shape stays valid
    TableIndex.requireValidBid("s0123456789abcdef_0000000042")
  }

  test("a false-returning rename aborts before the marker (committed == complete)") {
    val idx = graft.util.TempDirs.scratch("renamefail").toString
    new java.io.File(idx).mkdirs()
    val p = new org.apache.hadoop.fs.Path(idx)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a source that does not exist: local rename returns false, not throw
    val ghost = new org.apache.hadoop.fs.Path(s"$idx/_staging/x/t/ghost.parquet")
    val dst = new org.apache.hadoop.fs.Path(s"$idx/t/ghost.parquet")
    intercept[java.io.IOException] {
      TableIndex.renameAll(fs, Seq((ghost, dst)))
    }
  }

  test("checkpoint batch-id salt is path-normalized: respellings agree, distinct paths differ") {
    val a = TableIndex.checkpointSalt(spark, "/tmp/graft_ckpt_salt/x")
    assert(a == TableIndex.checkpointSalt(spark, "/tmp/graft_ckpt_salt/x/"))
    assert(a == TableIndex.checkpointSalt(spark, "/tmp/graft_ckpt_salt/./x"))
    assert(a == TableIndex.checkpointSalt(spark, "/tmp/graft_ckpt_salt//x"))
    assert(a != TableIndex.checkpointSalt(spark, "/tmp/graft_ckpt_salt/y"))
  }

  test("a pinned Snapshot is immune to commits landing between its table opens (cross-table)") {
    import spark.implicits._
    val idx = graft.util.TempDirs.scratch("snap_pin").toString
    TableIndex.commitBatch(spark, idx, "pin_b1", Seq(
      ("a.parquet", Seq((1L, 10L)).toDF("id", "h"), Seq.empty),
      ("b.parquet", Seq((1L, 100L)).toDF("id", "s"), Seq.empty)))
    // a logical read pins ONCE, then opens its tables one by one...
    val snap = TableIndex.openSnapshot(spark, idx)
    val aPre = TableIndex.snapshotTable(spark, snap, "a.parquet").get.count()
    // ...and a second batch commits BETWEEN those opens
    TableIndex.commitBatch(spark, idx, "pin_b2", Seq(
      ("a.parquet", Seq((2L, 20L)).toDF("id", "h"), Seq.empty),
      ("b.parquet", Seq((2L, 200L)).toDF("id", "s"), Seq.empty)))
    // table b, opened through the SAME pin after the commit landed,
    // must not show batch 2 — a per-table listing would pair batch-1-
    // only `a` with batch-2-bearing `b`: the cross-table tear
    val bDuring = TableIndex.snapshotTable(spark, snap, "b.parquet").get
    assert(aPre == 1L && bDuring.count() == 1L,
      "pinned snapshot tore across tables (later table open saw a mid-read commit)")
    // a FRESH pin sees the second batch in both tables
    val snap2 = TableIndex.openSnapshot(spark, idx)
    assert(TableIndex.snapshotTable(spark, snap2, "a.parquet").get.count() == 2L)
    assert(TableIndex.snapshotTable(spark, snap2, "b.parquet").get.count() == 2L)
    // tombstones committed after a pin are equally invisible to it —
    // the merge-on-read anti-join resolves against the SAME bid set
    TableIndex.commitBatch(spark, idx, "pin_del", Seq(
      ("tombstones.parquet", Seq(Tuple1(1L)).toDF("id"), Seq.empty)))
    val liveUnderPin = TableIndex.liveTable(spark, idx,
      TableIndex.snapshotTable(spark, snap2, "a.parquet").get, "id", Some(snap2))
    assert(liveUnderPin.count() == 2L,
      "a tombstone batch committed after the pin leaked into the pinned read")
    val liveFresh = TableIndex.liveTable(spark, idx,
      TableIndex.snapshotTable(spark, idx, "a.parquet").get, "id",
      Some(TableIndex.openSnapshot(spark, idx)))
    assert(liveFresh.count() == 1L, "a fresh pin missed the committed tombstones")
  }

  test("a caller-pinned handle freezes the index across OPERATIONS, not just tables") {
    val d = docsDf
    val old = d.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val shard = d.filter(pmod(col("doc_id"), lit(4)) === 0)
    val idx = graft.util.TempDirs.scratch("snap_session").toString
    IncrementalDedup.buildIndex(old, "doc_id", "text", idx)
    val session = TableIndex.openSnapshot(spark, idx)
    val probeA = rows(IncrementalDedup.processShard(spark, idx, shard, "doc_id", "text",
      tau = 0.8, at = Some(session)))
    // a writer commits between the session's two probes
    IncrementalDedup.updateIndexInPlace(spark, idx, shard, "doc_id", "text",
      batchId = Some("sess_b1"))
    val probeB = rows(IncrementalDedup.processShard(spark, idx, shard, "doc_id", "text",
      tau = 0.8, at = Some(session)))
    assert(probeB == probeA,
      "a pinned session's second probe saw a batch committed after the pin")
    // a per-call snapshot (fresh pin) DOES see it — the pin is the difference
    val fresh = rows(IncrementalDedup.processShard(spark, idx, shard, "doc_id", "text",
      tau = 0.8, snapshot = true))
    assert(fresh != probeA,
      "fixture too weak: the mid-session batch changed no decision")
    // same contract on the IVF side: nearDupsExact + search under one handle
    import spark.implicits._
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), expr("transform(embedding, x -> cast(x as double))").as("vec"))
    val oldV = all.filter(pmod(col("id"), lit(7)) =!= 0)
    val freshV = all.filter(pmod(col("id"), lit(7)) === 0)
    val queries = freshV.limit(10)
    val vidx = graft.util.TempDirs.scratch("snap_session_ivf").toString
    IvfIndex.build(oldV, AnnSearch.kmeansCentroidsExact(oldV, 15, iters = 2),
      AnnSearch.pqBook(oldV, m = 32, stride = 10), vidx)
    val vs = TableIndex.openSnapshot(spark, vidx)
    val ndA = rows(IvfIndex.nearDupsExact(spark, vidx, oldV, queries, tau = 0.9, at = Some(vs)))
    val seA = rows(IvfIndex.search(spark, vidx, oldV, queries,
      k = 5, nprobe = 3, shortlist = 20, at = Some(vs)))
    IvfIndex.appendInPlace(spark, vidx, freshV, batchId = Some("sess_v1"))
    assert(rows(IvfIndex.nearDupsExact(spark, vidx, oldV, queries, tau = 0.9, at = Some(vs))) == ndA,
      "pinned nearDupsExact saw the mid-session append")
    assert(rows(IvfIndex.search(spark, vidx, oldV, queries,
      k = 5, nprobe = 3, shortlist = 20, at = Some(vs))) == seA,
      "pinned search saw the mid-session append")
    val corpus = oldV.unionByName(freshV)
    assert(rows(IvfIndex.search(spark, vidx, corpus, queries,
      k = 5, nprobe = 3, shortlist = 20, snapshot = true)) != seA,
      "fixture too weak: the appended vectors changed no search result")
  }

  test("checkpointCommits folds markers into a base: replay still skips, snapshots stay complete") {
    import spark.implicits._
    val idx = graft.util.TempDirs.scratch("ckpt_commits").toString
    for (i <- 1 to 3)
      TableIndex.commitBatch(spark, idx, s"fold-b$i",
        Seq(("t.parquet", Seq((i.toLong, i.toLong)).toDF("id", "v"), Seq.empty)))
    val before = TableIndex.committedBids(spark, idx)
    assert(before == Set("fold-b1", "fold-b2", "fold-b3"))
    TableIndex.checkpointCommits(spark, idx)
    val names = new java.io.File(s"$idx/_commits").listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSet // .crc sidecars are FS noise
    assert(!names.exists(n => !n.startsWith("_")), s"markers survived the fold: $names")
    assert(names.count(_.startsWith("_base.")) == 1, s"expected one base file: $names")
    assert(TableIndex.committedBids(spark, idx) == before, "the fold changed the bid set")
    // a replayed batch whose marker was folded must STILL skip — the
    // exactly-once guarantee's first encounter with a fold
    assert(TableIndex.isCommitted(spark, idx, "fold-b2"))
    assert(!TableIndex.commitBatch(spark, idx, "fold-b2",
      Seq(("t.parquet", Seq((99L, 99L)).toDF("id", "v"), Seq.empty))),
      "a folded batch id was re-committed (duplicate rows)")
    val snap = TableIndex.openSnapshot(spark, idx)
    assert(TableIndex.snapshotTable(spark, snap, "t.parquet").get.count() == 3L,
      "snapshot lost folded batches' rows")
    // a commit AFTER the fold coexists: bids = base ∪ new markers
    TableIndex.commitBatch(spark, idx, "fold-b4",
      Seq(("t.parquet", Seq((4L, 4L)).toDF("id", "v"), Seq.empty)))
    assert(TableIndex.committedBids(spark, idx) == before + "fold-b4")
    // a second fold absorbs the new marker and replaces the old base
    TableIndex.checkpointCommits(spark, idx)
    val names2 = new java.io.File(s"$idx/_commits").listFiles().map(_.getName)
      .filterNot(n => n.startsWith("_tmp") || n.startsWith(".") || n == "_folded" ||
        n == "_fold_count") // r14: the persisted auto-fold cadence counter
      .toSet
    assert(names2.size == 1 && names2.head.startsWith("_base."), s"second fold left: $names2")
    assert(TableIndex.committedBids(spark, idx) == before + "fold-b4")
    TableIndex.checkpointCommits(spark, idx) // idempotent when nothing to fold
    assert(TableIndex.committedBids(spark, idx) == before + "fold-b4")
    assert(TableIndex.snapshotTable(spark, idx, "t.parquet").get.count() == 4L)
    // a leading '_' bid would name an invisible marker — rejected at entry
    intercept[IllegalArgumentException] { TableIndex.requireValidBid("_sneaky") }
    // ...and isCommitted validates too: the protocol's own _base.* /
    // _folded file names would otherwise read as "already committed"
    // and silently no-op an append under such a bid
    intercept[IllegalArgumentException] {
      TableIndex.isCommitted(spark, idx, "_folded")
    }
    // a crashed fold's temp is swept even when there is nothing to
    // fold (single base, no markers — the no-op path)
    val tmp2 = new java.io.File(s"$idx/_commits/_tmp.crashed")
    java.nio.file.Files.write(tmp2.toPath, "x".getBytes)
    TableIndex.checkpointCommits(spark, idx)
    assert(!tmp2.exists(), "no-op fold left a crashed fold's temp behind")
    // the fold sentinel exists and never counts as a marker
    assert(new java.io.File(s"$idx/_commits/_folded").exists())
    assert(!TableIndex.committedBids(spark, idx).contains("_folded"))
  }

  test("live writer vs snapshot readers: every concurrent read is a sealed, cross-table-consistent prefix") {
    import spark.implicits._
    val idx = graft.util.TempDirs.scratch("race_live").toString
    val writes = 10
    @volatile var writerErr: Option[Throwable] = None
    val writer = new Thread(() => {
      try {
        for (i <- 1 to writes)
          TableIndex.commitBatch(spark, idx, f"race-b$i%03d", Seq(
            ("a.parquet", Seq((i.toLong, i.toLong)).toDF("id", "x"), Seq.empty),
            ("b.parquet", Seq((i.toLong, i * 100L)).toDF("id", "y"), Seq.empty)))
      } catch { case t: Throwable => writerErr = Some(t) }
    })
    writer.setDaemon(true)
    writer.start()
    // readers race the live writer with NO coordination: each pinned
    // read must see the same sealed batch prefix in BOTH tables
    // (a==b — the cross-table guarantee under a real interleaving,
    // not a planted one) and prefixes must only grow
    var prev = 0L
    var reads = 0
    while (writer.isAlive || prev < writes) {
      val snap = TableIndex.openSnapshot(spark, idx)
      val a = TableIndex.snapshotTable(spark, snap, "a.parquet").map(_.count()).getOrElse(0L)
      val b = TableIndex.snapshotTable(spark, snap, "b.parquet").map(_.count()).getOrElse(0L)
      assert(a == b, s"concurrent snapshot tore across tables: a=$a b=$b")
      assert(a >= prev, s"snapshot prefix went backwards: $prev -> $a")
      prev = a
      reads += 1
      if (!writer.isAlive && prev >= writes) () else Thread.sleep(50)
      if (reads > 600) fail(s"writer never finished (err=$writerErr, seen=$prev)")
    }
    writer.join(10000)
    writerErr.foreach(t => fail(s"writer thread failed: $t"))
    assert(prev == writes.toLong)
    // at least a few reads must have raced the live writer (host-speed
    // tolerant; the assertions above did the real work on each one)
    assert(reads >= 3, s"only $reads reads — the race window never opened")
  }

  test("auto-fold: the writer's Nth commit folds the markers by itself") {
    import spark.implicits._
    val idx = graft.util.TempDirs.scratch("autofold").toString
    val bids = (1 to TableIndex.AutoFoldEvery).map(i => f"auto-b$i%03d")
    for ((b, i) <- bids.zipWithIndex)
      TableIndex.commitBatch(spark, idx, b,
        Seq(("t.parquet", Seq((i.toLong, i.toLong)).toDF("id", "v"), Seq.empty)))
    val names = new java.io.File(s"$idx/_commits").listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSet
    assert(names.count(!_.startsWith("_")) == 0,
      s"markers survived the auto-fold cadence: $names")
    assert(names.count(_.startsWith("_base.")) == 1, s"$names")
    assert(TableIndex.committedBids(spark, idx) == bids.toSet)
    // a replayed early bid still skips through the folded base
    assert(!TableIndex.commitBatch(spark, idx, bids.head,
      Seq(("t.parquet", Seq((99L, 99L)).toDF("id", "v"), Seq.empty))))
    assert(TableIndex.snapshotTable(spark, idx, "t.parquet").get.count() ==
      TableIndex.AutoFoldEvery.toLong)
  }

  test("a snapshot handle pinned on one index is rejected by an operation on another") {
    val d = docsDf
    val old = d.filter(pmod(col("doc_id"), lit(4)) =!= 0).limit(60)
    val shard = d.filter(pmod(col("doc_id"), lit(4)) === 0).limit(20)
    val idxA = graft.util.TempDirs.scratch("pin_cross_a").toString
    val idxB = graft.util.TempDirs.scratch("pin_cross_b").toString
    IncrementalDedup.buildIndex(old, "doc_id", "text", idxA)
    IncrementalDedup.buildIndex(old, "doc_id", "text", idxB)
    val handleA = TableIndex.openSnapshot(spark, idxA)
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.processShard(spark, idxB, shard, "doc_id", "text",
        tau = 0.8, at = Some(handleA))
    }
    assert(e.getMessage.contains("cross-index"), e.getMessage)
    // respellings of the SAME dir are fine (qualified comparison)
    IncrementalDedup.processShard(spark, s"$idxA/", shard, "doc_id", "text",
      tau = 0.8, at = Some(handleA)).collect()
  }

  test("refreshGeometry rejects a SUBSET corpus (under-sized radii would break exactness)") {
    import spark.implicits._
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), expr("transform(embedding, x -> cast(x as double))").as("vec"))
      .limit(60)
    val centroids = AnnSearch.kmeansCentroidsExact(all, 15, iters = 1)
    val book = AnnSearch.pqBook(all, m = 32, stride = 10)
    val idx = graft.util.TempDirs.scratch("geo_subset").toString
    IvfIndex.build(all, centroids, book, idx)
    val subset = all.limit(30)
    val e = intercept[IllegalArgumentException] {
      IvfIndex.refreshGeometry(spark, idx, subset)
    }
    assert(e.getMessage.contains("missing live indexed ids"), e.getMessage)
    // a covering corpus refreshes fine; a floats-bearing index needs none
    IvfIndex.refreshGeometry(spark, idx, all)
    val fidx = graft.util.TempDirs.scratch("geo_subset_f").toString
    IvfIndex.build(all, centroids, book, fidx, storeFloats = true)
    val empty = Seq.empty[(Long, Array[Double])].toDF("id", "vec")
    IvfIndex.refreshGeometry(spark, fidx, empty) // corpus ignored: refreshes from its own floats
  }
}
