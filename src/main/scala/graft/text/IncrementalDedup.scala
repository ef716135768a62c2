package graft.text

import graft.util.TableIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental (append-mode) dedup: dedup a NEW SHARD against an
  * already-indexed corpus without re-processing the corpus — the form
  * real pretraining pipelines run (a fresh crawl generation arrives; it
  * must be checked against everything already kept), vs the
  * corpus-at-once `dedup_exact`/`dedup_minhash_lsh` batch family.
  *
  * The persisted index is four parquet tables under one directory:
  *  - `hashes`   (id, h): `xxhash64` of the normalized text — the
  *    exact-dedup key ([[TextOps.normText]] — the engine's standard),
  *  - `sigs`     (id, sig: array<long>): MinHash signatures
  *    ([[MinHashLsh.signaturesFromSets]], same k as the batch family),
  *  - `bands`    (id, band, bucket), PARTITIONED BY bucket mod
  *    [[BandParts]]: the LSH band rows, pre-derived so probes read
  *    them instead of re-banding every signature, and partition-
  *    prunable for small (membership-check) shards,
  *  - `tombstones` (id), OPTIONAL: [[deleteInPlace]] removals, applied
  *    merge-on-read to every table until [[compactIndex]] folds them,
  *  - `shingles` (id, shh: array<long>): the distinct word-3-gram set,
  *    HASHED to 8-byte longs — exact-Jaccard verification reads these
  *    instead of re-tokenizing stored text. Jaccard over distinct
  *    shingle hashes equals Jaccard over the shingle strings absent an
  *    xxhash64 collision inside one compared pair (probability
  *    ~|union|²/2⁶⁵ — negligible at any real shingle-set size, and a
  *    collision would surface as an oracle hash mismatch, not silence).
  *
  * Durability ([[graft.util.TableIndex]], shared with
  * [[graft.ml.IvfIndex]]): every multi-table write is a staged
  * batch-id-named file set committed by ONE atomic marker — a crash
  * between table writes can no longer tear the index (hashes updated,
  * bands not), and a replayed streaming micro-batch resolves to its
  * already-committed batch id and is skipped, so replay cannot
  * duplicate rows. Build parameters (k, n, bands) persist in index
  * metadata and every probe/append resolves them FROM THE INDEX — a
  * caller passing a different banding than the build can no longer
  * silently mis-key the (band, bucket) join.
  *
  * Shard semantics (the pairwise batch rule, made incremental): a new
  * document is REJECTED iff
  *  - exact: its content hash appears in the index, or an earlier
  *    (smaller-id) shard document has the same hash;
  *  - near: some index document, or some earlier (smaller-id) shard
  *    document, has verified word-shingle Jaccard ≥ τ with it —
  *    the orientation-(a<b) rule of [[MinHashLsh.verifiedPairs]] with
  *    "index doc" counting as earlier than every shard doc.
  * Index and shard ids must be disjoint (generations partition the id
  * space in any real pipeline).
  *
  * Scale shape (100 TB corpus, 1 TB shard): the corpus is touched only
  * through its INDEX — a parquet scan of (id, hash/sig/shingle-hash)
  * rows, never the text. Exact dedup is one hash equi-join (left-semi)
  * on `h`; LSH candidates come from the same (band, bucket) equi-join
  * as the batch path with the same `maxBucket` skew cap, except one
  * side is the shard's band rows (tiny) and the index's band rows are
  * map-side filtered to shard-touched buckets (broadcast semi-join on
  * the shard's distinct bucket keys) BEFORE any exchange — the
  * corpus-sized scan never shuffles; verification joins shingle
  * sets BY ID for candidates only. Nothing is quadratic in the corpus;
  * the shard-sized side drives every join. The index itself is
  * append-only — [[updateIndex]] adds the survivors' rows, and the
  * result is bit-identical to re-indexing the union from scratch
  * (spec-pinned), which is what makes the incremental loop sound:
  * generation N's output state == the state a from-scratch rebuild
  * would produce.
  */
object IncrementalDedup {

  /** The band table's partition fan-out: band rows are stored
    * PARTITIONED BY `bp = bucket mod BandParts`, so a shard's probe
    * scans only the partitions its own buckets hash into. A bulk shard
    * touches all of them (every partition filter degenerates to
    * all-partitions at some selectivity), but the MEMBERSHIP-CHECK
    * shard — one document, `bands` buckets — reads ≤ bands/BandParts
    * of the band files, which is what makes the online "is this doc
    * already indexed" form cheap. */
  val BandParts = 64

  /** Build parameters resolved FROM THE INDEX when it carries metadata
    * (every index built since the meta landed does): the probe MUST
    * shingle/sign/band with the build's parameters or the (band,
    * bucket) keys silently mismatch and near-dup candidates are lost.
    * Legacy indexes without metadata fall back to the caller's args. */
  private def params(spark: SparkSession, indexDir: String,
                     k: Int, n: Int, bands: Int): (Int, Int, Int) = {
    val m = TableIndex.readMeta(spark, indexDir)
    (m.get("k").map(_.toInt).getOrElse(k),
      m.get("n").map(_.toInt).getOrElse(n),
      m.get("bands").map(_.toInt).getOrElse(bands))
  }

  private def indexRows(base: DataFrame, k: Int, n: Int, bands: Int)
  : Seq[(String, DataFrame, Seq[String])] = {
    val hashes = base.select(col("id"), xxhash64(TextOps.normText(col("text"))).as("h"))
    // one shingling pass feeds both the signature aggregate and the
    // stored verification sets (the verifiedPairs discipline)
    val sets = MinHashLsh.shingleSets(base, "id", "text", n).localCheckpoint(false)
    val sigs = MinHashLsh.signaturesFromSets(sets, "id", k).localCheckpoint(false)
    val bandRows = MinHashLsh.bandBuckets(sigs, "id", bands)
      .withColumn("bp", pmod(col("bucket"), lit(BandParts.toLong)))
    val shingles = sets.select(col("id"), expr("transform(sh, s -> xxhash64(s))").as("shh"))
    Seq(
      ("hashes.parquet", hashes, Seq.empty),
      ("sigs.parquet", sigs, Seq.empty),
      ("bands.parquet", bandRows, Seq("bp")),
      ("shingles.parquet", shingles, Seq.empty))
  }

  /** Write the four index tables for a corpus generation, plus the
    * (k, n, bands) metadata every later probe/append resolves its
    * parameters from. One protocol batch — a torn build leaves no
    * commit marker, so memoization guards re-run it. */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String, outDir: String,
                 k: Int = 32, n: Int = 3, bands: Int = 8): Unit = {
    val spark = docs.sparkSession
    TableIndex.wipe(spark, outDir)
    TableIndex.writeMeta(spark, outDir,
      Map("k" -> k.toString, "n" -> n.toString, "bands" -> bands.toString))
    val base = docs.select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("text"))
    TableIndex.commitBatch(spark, outDir, TableIndex.newBatchId("base"),
      indexRows(base, k, n, bands))
    ()
  }

  /** Append a processed shard's SURVIVORS to an index: reads `indexDir`,
    * writes `outDir` = old LIVE index rows ∪ the survivors' index rows.
    * Carried-over rows pass the tombstone anti-join — a generation copy
    * that re-materialized tombstoned rows WITHOUT the tombstone table
    * that suppressed them would silently resurrect every deleted
    * document in the new generation (the copy is also a fold point,
    * like [[compactIndex]]). Bit-identical to `buildIndex` over
    * (live old corpus ∪ survivors) — IncrementalDedupSpec pins the
    * equality, the persistence discipline that keeps generation state
    * replayable. */
  def updateIndex(spark: SparkSession, indexDirOrRoot: String, survivors: DataFrame,
                  idCol: String, textCol: String, outDir: String,
                  k: Int = 32, n: Int = 3, bands: Int = 8): Unit = {
    val indexDir = TableIndex.resolveDir(spark, indexDirOrRoot)
    TableIndex.repair(spark, indexDir)
    // history carry: the new generation answers isCommitted for every
    // source bid (seeded below), keeping replay exactly-once across a
    // manual pointer cutover (the catchUpAndPublish discipline)
    val srcBids = TableIndex.committedBids(spark, indexDir)
    val (kk, nn, bb) = params(spark, indexDir, k, n, bands)
    val base = survivors.select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("text"))
    val fresh = indexRows(base, kk, nn, bb).map(t => t._1 -> t._2).toMap
    TableIndex.wipe(spark, outDir)
    TableIndex.writeMeta(spark, outDir,
      Map("k" -> kk.toString, "n" -> nn.toString, "bands" -> bb.toString))
    TableIndex.commitBatch(spark, outDir, TableIndex.newBatchId("gen"), Seq(
      ("hashes.parquet",
        liveTable(spark, indexDir, spark.read.parquet(s"$indexDir/hashes.parquet"))
          .unionByName(fresh("hashes.parquet")),
        Seq.empty),
      ("sigs.parquet",
        liveTable(spark, indexDir, spark.read.parquet(s"$indexDir/sigs.parquet"))
          .unionByName(fresh("sigs.parquet")),
        Seq.empty),
      ("bands.parquet",
        liveTable(spark, indexDir, spark.read.parquet(s"$indexDir/bands.parquet")
            .withColumn("bp", col("bp").cast("long")))
          .unionByName(fresh("bands.parquet")),
        Seq("bp")),
      ("shingles.parquet",
        liveTable(spark, indexDir, spark.read.parquet(s"$indexDir/shingles.parquet"))
          .unionByName(fresh("shingles.parquet")),
        Seq.empty)))
    TableIndex.seedCommittedHistory(spark, outDir, srcBids)
    ()
  }

  /** The O(shard) index append: the survivors' rows land as new
    * batch-id-named files UNDER the existing four tables — existing
    * files are never read or rewritten, so a generation lands in time
    * proportional to the SHARD ([[updateIndex]]'s generation-copy form
    * rewrites the carried-over corpus — at 100 TB that prices every
    * shard at the full index). All four tables commit under ONE atomic
    * marker; a crash mid-append rolls back on the next open, and a
    * replayed `batchId` is skipped (exactly-once). Re-appending a
    * tombstoned id throws (the stale tombstone would silently suppress
    * the new rows) — compact first. Row contract identical to
    * [[updateIndex]]: spec-pinned rows ≡ rebuild-over-union with
    * pre-append files byte-untouched, the
    * [[graft.ml.IvfIndex.appendInPlace]] discipline. */
  def updateIndexInPlace(spark: SparkSession, indexDirOrRoot: String, survivors: DataFrame,
                         idCol: String, textCol: String,
                         k: Int = 32, n: Int = 3, bands: Int = 8,
                         batchId: Option[String] = None): Unit = {
    val bid = batchId.getOrElse(TableIndex.newBatchId())
    // root-addressed appends re-validate the generation pointer under
    // the commit's lease and retry across a concurrent swap — without
    // this, a shard committing into a just-superseded generation would
    // be invisible to every post-swap root reader (lost, no error)
    TableIndex.mutateCurrent(spark, indexDirOrRoot) { (indexDir, reqCur) =>
      if (!TableIndex.isCommitted(spark, indexDir, bid)) { // replayed batch: skip
        TableIndex.repair(spark, indexDir)
        val (kk, nn, bb) = params(spark, indexDir, k, n, bands)
        val base = survivors.select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("text"))
        TableIndex.assertNotTombstoned(spark, indexDir, base.select("id"), "id")
        TableIndex.commitBatch(spark, indexDir, bid, indexRows(base, kk, nn, bb),
          requireCurrentOf = reqCur)
        ()
      }
    }
    ()
  }

  /** ONLINE dedup: each arriving micro-batch of documents is deduped
    * against the CURRENT index ([[processShard]]) and its survivors
    * are appended in place ([[updateIndexInPlace]]) before the next
    * batch runs — the foreachBatch bridge, [[graft.ml.IvfIndex
    * .ingestStream]]'s discipline applied to the dedup index. Each
    * batch's decisions land in `decisionsDir/decisions.parquet` so the
    * caller owns a complete audit log; decisions and index rows each
    * commit under a checkpoint-salted batch id, so a micro-batch
    * replayed after a crash duplicates NEITHER (the id resolves to the
    * committed marker and the write is skipped), and a crash between
    * the two commits replays into one skip + one redo — the end state
    * is exactly the clean run's.
    *
    * Semantics, stated precisely: a document is rejected iff it
    * duplicates an INDEXED document or an earlier document OF ITS OWN
    * BATCH (the [[processShard]] rule). Near-duplicate (τ) relations
    * are not transitive, so a REJECTED earlier document rejects
    * same-batch successors but not later-batch ones (it never enters
    * the index) — micro-batch boundaries are observable exactly on
    * such τ-chains and nowhere else. The spec pins the stream equal to
    * the manual processShard-then-append loop over the same batches
    * (the harness adds nothing), and the final index equal to a
    * from-scratch rebuild over (initial ∪ all stream survivors). */
  def dedupStream(indexDir: String, docsStream: DataFrame, idCol: String, textCol: String,
                  decisionsDir: String, checkpointDir: String, tau: Double,
                  k: Int = 32, bands: Int = 8, n: Int = 3, maxBucket: Int = 1000)
  : org.apache.spark.sql.streaming.StreamingQuery = {
    // salt with the NORMALIZED checkpoint path so two streams (distinct
    // checkpoints) into one index can never collide on micro-batch
    // numbers, and a restart spelling the same checkpoint differently
    // re-derives the same ids (graft.util.TableIndex.checkpointSalt)
    val salt = TableIndex.checkpointSalt(docsStream.sparkSession, checkpointDir)
    docsStream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) TableIndex.awaitingLease() {
          val spark = batch.sparkSession
          val bid = f"s${salt}_$batchId%010d"
          val b = batch.toDF().localCheckpoint(true)
          val decisions = processShard(spark, indexDir, b, idCol, textCol, tau,
            k, bands, n, maxBucket).localCheckpoint(true)
          TableIndex.commitBatch(spark, decisionsDir, bid,
            Seq(("decisions.parquet", decisions, Seq.empty)))
          val survivors = b.join(
            decisions.filter(col("kept")).select(col("id").as(idCol)), Seq(idCol))
          updateIndexInPlace(spark, indexDir, survivors, idCol, textCol, k, n, bands,
            batchId = Some(bid))
        }
      }
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** The O(delete-list) takedown: append the ids to a TOMBSTONE table
    * — a removed document must stop rejecting future shards (its hash,
    * signature, band rows and shingle set all become invisible to
    * [[processShard]]) without rewriting the four corpus-sized tables.
    * Merge-on-read via [[graft.util.TableIndex.liveTable]];
    * [[compactIndex]] is the fold point. Re-appending a tombstoned id
    * before a compact throws ([[graft.util.TableIndex
    * .assertNotTombstoned]]). */
  def deleteInPlace(spark: SparkSession, indexDirOrRoot: String, ids: DataFrame): Unit = {
    val bid = TableIndex.newBatchId("del")
    TableIndex.mutateCurrent(spark, indexDirOrRoot) { (indexDir, reqCur) =>
      TableIndex.commitBatch(spark, indexDir, bid,
        Seq(("tombstones.parquet", ids.select(col("id").cast("long").as("id")), Seq.empty)),
        requireCurrentOf = reqCur)
    }
    ()
  }

  private def liveTable(spark: SparkSession, indexDir: String, df: DataFrame,
                        snap: Option[TableIndex.Snapshot] = None): DataFrame =
    TableIndex.liveTable(spark, indexDir, df, "id", snap)

  /** Fold point: rewrite the four tables without the tombstoned rows
    * and drop the tombstone table. ALL FOUR corpus-sized tables
    * rewrite through a SIZE-TARGETED repartition
    * ([[graft.util.TableIndex.compactionPartitions]]: ~128 MiB files,
    * floored at the cluster parallelism) — at 100 TB they carry
    * billions of rows, and a single-task funnel (the pre-r12
    * `coalesce(1)`) could never complete. The band table keeps its
    * bucket-partition DIRECTORY discipline but parallelizes WITHIN
    * partition values ([[graft.util.TableIndex.sizedKeyedRepartition]]
    * — per-bp byte-derived salt, single data pass): the pre-r14
    * `repartition(col("bp"))` bounded the corpus-sized rewrite at
    * ≤[[BandParts]] tasks forever, a straggler wall no cluster size
    * could fix. Spec-pinned ≡ rebuild-over-remaining, with >1 output
    * files per table AND >1 files under a deliberately hot bp.
    *
    * `at`: an optional pinned snapshot to build FROM ([[compactPublish]]
    * passes one) — the rewrite then reads a frozen committed view and
    * never calls repair(), so it can run CONCURRENTLY with a live
    * writer's in-flight commit (the default plain-read posture's
    * repair() could roll that writer's mid-move batch back, and the
    * live read could see a torn file wave). Batches committing after
    * the pin are the publisher's catch-up problem
    * ([[graft.util.TableIndex.catchUpAndPublish]]). */
  def compactIndex(spark: SparkSession, indexDir: String, outDir: String,
                   at: Option[TableIndex.Snapshot] = None): Unit = {
    val idir = at.map(_.dir).getOrElse(TableIndex.resolveDir(spark, indexDir))
    if (at.isEmpty) TableIndex.repair(spark, idir)
    TableIndex.wipe(spark, outDir)
    val meta = TableIndex.readMeta(spark, idir)
    if (meta.nonEmpty) TableIndex.writeMeta(spark, outDir, meta)
    def tableOf(name: String): DataFrame =
      TableIndex.readTable(spark, idir, name, at).getOrElse(throw new IllegalStateException(
        s"compactIndex: $idir/$name is missing or holds no committed rows"))
    val flat = for (t <- Seq("hashes", "sigs", "shingles")) yield {
      val n = TableIndex.compactionPartitions(spark, idir, s"$t.parquet")
      (s"$t.parquet",
        liveTable(spark, idir, tableOf(s"$t.parquet"), at).repartition(n),
        Seq.empty[String])
    }
    val bands = ("bands.parquet",
      TableIndex.sizedKeyedRepartition(spark, idir, "bands.parquet",
        liveTable(spark, idir, tableOf("bands.parquet")
          .withColumn("bp", col("bp").cast("long")), at),
        "bp", "bucket", "id"),
      Seq("bp"))
    TableIndex.commitBatch(spark, outDir, TableIndex.newBatchId("compact"), flat :+ bands)
    ()
  }

  /** [[compactIndex]] with the generation cutover made a LIBRARY
    * guarantee — and, since the second half of r14, a cutover that is
    * SAFE AGAINST CONCURRENT WRITERS: the rewrite reads a snapshot
    * PINNED at entry (no repair, no torn file waves from a racing
    * append), and the publish runs through [[graft.util.TableIndex
    * .catchUpAndPublish]] — under the source generation's writer
    * lease, any batch committed after the pin is copied bit-identically
    * into the new generation (same bids, so stream replay stays
    * exactly-once across the swap), the pinned bid HISTORY is seeded
    * into the new generation (a replayed pre-swap micro-batch still
    * skips), and only then does `root/_generation` swap (one atomic
    * rename). A root-addressed append racing the publish either lands
    * before the catch-up listing (carried over) or fails its pointer
    * re-validation and retries against the new generation
    * ([[graft.util.TableIndex.mutateCurrent]]) — no interleaving loses
    * a batch. A crash anywhere leaves the OLD generation
    * authoritative; pinned snapshot handles keep answering from their
    * generation across the swap. The superseded generation is NOT
    * deleted here — retire it with [[graft.util.TableIndex
    * .retireGeneration]] once in-flight readers drain. Returns the new
    * generation's directory. */
  def compactPublish(spark: SparkSession, root: String): String = {
    val cur = TableIndex.resolveGeneration(spark, root).getOrElse(
      throw new IllegalStateException(
        s"$root carries no _generation pointer — build into a child directory and " +
          "publishGeneration it first"))
    val snap = TableIndex.openSnapshot(spark, cur)
    val genName = "g" + java.util.UUID.randomUUID().toString.replace("-", "")
    val outDir = s"$root/$genName"
    compactIndex(spark, cur, outDir, at = Some(snap))
    TableIndex.catchUpAndPublish(spark, root, cur, genName, snap.bids)
    outDir
  }

  /** Dedup `shard` against the persisted index at `indexDir`. Returns
    * one row per shard document: (id, dup_exact, dup_near, kept).
    * Shingling/signature/banding parameters come from the INDEX
    * metadata when present (see [[params]]) — the caller's values are
    * a fallback for legacy indexes only.
    *
    * `snapshot = true` reads every index table through ONE pinned
    * [[graft.util.TableIndex.Snapshot]] (committed batches only, no
    * repair) — safe to run CONCURRENTLY with a writer's in-flight
    * commit: the probe sees the pre-batch index until the batch's
    * marker lands, and because the pin is per-CALL (one `_commits`
    * listing for hashes, sigs, shingles, bands AND tombstones), a
    * batch committing between this probe's table opens is visible in
    * all of them or none — never batch X's hashes without its band
    * rows, the cross-table tear a per-table listing would allow. It
    * also cannot roll a live writer's batch back the way the default
    * path's repair() can.
    *
    * `at`: a CALLER-pinned [[graft.util.TableIndex.Snapshot]] —
    * supersedes `snapshot` and extends the pin across OPERATIONS: every
    * probe (and [[graft.ml.IvfIndex]] call) passed the same handle
    * answers from the same frozen index state, even while a writer
    * commits between the calls — the multi-gate-pipeline / audit-
    * session consistency a per-call pin cannot give. */
  def processShard(spark: SparkSession, indexDirOrRoot: String, shard: DataFrame,
                   idCol: String, textCol: String, tau: Double,
                   k: Int = 32, bands: Int = 8, n: Int = 3,
                   maxBucket: Int = 1000, snapshot: Boolean = false,
                   at: Option[TableIndex.Snapshot] = None): DataFrame = {
    val snap = TableIndex.resolvePin(spark, indexDirOrRoot, snapshot, at)
    // the pin freezes the generation too — a plain read follows the
    // root's pointer fresh (see graft.util.TableIndex.resolveDir)
    val indexDir = snap.map(_.dir).getOrElse(TableIndex.resolveDir(spark, indexDirOrRoot))
    if (snap.isEmpty) TableIndex.repair(spark, indexDir)
    val (kk, nn, bb) = params(spark, indexDir, k, n, bands)
    def readIdx(table: String): DataFrame =
      snap match {
        case Some(s) =>
          TableIndex.snapshotTable(spark, s, s"$table.parquet").getOrElse(
            throw new IllegalStateException(
              s"$indexDir/$table.parquet holds no committed data (index mid-build?)"))
        case None => spark.read.parquet(s"$indexDir/$table.parquet")
      }
    // every index read goes through the tombstone anti-join — a
    // deleted document must neither hash-reject nor near-reject
    val idxHashes = liveTable(spark, indexDir, readIdx("hashes"), snap)
    val idxSigs = liveTable(spark, indexDir, readIdx("sigs"), snap)
    val idxShingles = liveTable(spark, indexDir, readIdx("shingles"), snap)
    val newDocs = shard
      .select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("text"))
    val newHashed = newDocs
      .select(col("id"), xxhash64(TextOps.normText(col("text"))).as("h"))
      .localCheckpoint(false)

    // exact: hash semi-join vs the index + earliest-wins inside the shard
    val dupExact = newHashed.join(idxHashes.select("h"), Seq("h"), "left_semi").select("id")
      .unionByName(newHashed
        .withColumn("mn", min("id").over(Window.partitionBy("h")))
        .filter(col("id") > col("mn"))
        .select("id"))
      .distinct()

    // near: LSH candidates (shard band rows vs index ∪ earlier-shard
    // band rows, same maxBucket cap as the batch family), verified
    // with exact Jaccard over the stored shingle-hash sets.
    // The index side is reduced to SHARD-TOUCHED buckets FIRST via a
    // broadcast semi-join on the shard's distinct (band, bucket) keys —
    // a map-side filter on the one corpus-sized scan — and only then
    // does the bucket-size cap run its (band, bucket) exchange over the
    // survivors. Untouched buckets can produce no candidate by
    // construction, and for touched buckets every member (index and
    // shard) survives the semi-join, so `bn` — and therefore the capped
    // candidate set — is identical to counting over ALL band rows. The
    // alternative (window-count the full union) shuffles the entire
    // index's band rows on every shard arrival: O(corpus) exchange per
    // shard instead of O(shard × touched-bucket membership).
    val newSets = MinHashLsh.shingleSets(newDocs, "id", "text", nn).localCheckpoint(false)
    val newSigs = MinHashLsh.signaturesFromSets(newSets, "id", kk)
    val newShh = newSets.select(col("id"), expr("transform(sh, s -> xxhash64(s))").as("shh"))
    val newBands = MinHashLsh.bandBuckets(newSigs, "id", bb).localCheckpoint(false)
    val touched = broadcast(newBands.select("band", "bucket").distinct())
    // the index's band rows come from the PERSISTED bucket-partitioned
    // band table when the index carries one: the shard's touched
    // bucket-partitions (≤ BandParts values, collected — a bounded dim
    // list) land as a partition filter, so a membership-check shard
    // (one doc, `bands` buckets) opens ≤ bands of the BandParts
    // partition directories instead of scanning every signature. Bulk
    // shards touch all partitions and pay the same one scan as the
    // derive-from-sigs form (pruning can only help). Indexes from
    // before the band table persisted fall back to deriving the rows.
    val idxBandRows = {
      val persisted = TableIndex.readTable(spark, indexDir, "bands.parquet", snap)
      persisted match {
        case Some(raw) =>
          val touchedParts = newBands
            .select(pmod(col("bucket"), lit(BandParts.toLong)).as("bp"))
            .distinct().collect().map(_.getLong(0)).toSeq
          liveTable(spark, indexDir, raw
            .withColumn("bp", col("bp").cast("long"))
            .filter(col("bp").isInCollection(touchedParts)), snap)
            .select("id", "band", "bucket")
        case None => MinHashLsh.bandBuckets(idxSigs, "id", bb)
      }
    }
    val allBands = idxBandRows
      .join(touched, Seq("band", "bucket"), "left_semi")
      .withColumn("is_new", lit(false))
      .unionByName(newBands.withColumn("is_new", lit(true)))
    val capped = allBands
      .withColumn("bn", count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("bn") <= maxBucket)
    val newSide = capped.filter(col("is_new"))
      .select(col("id").as("b"), col("band"), col("bucket"))
    val otherSide = capped
      .select(col("id").as("a"), col("band"), col("bucket"), col("is_new").as("a_new"))
    val cand = otherSide.join(newSide, Seq("band", "bucket"))
      .filter(!col("a_new") || col("a") < col("b"))
      .select("a", "b")
      .distinct()
    val aShh = idxShingles.unionByName(newShh)
      .select(col("id").as("a"), col("shh").as("sha"))
    val dupNear = cand
      .join(aShh, Seq("a"))
      .join(newShh.select(col("id").as("b"), col("shh").as("shb")), Seq("b"))
      .filter(size(array_intersect(col("sha"), col("shb"))).cast("double")
        / size(array_union(col("sha"), col("shb"))) >= tau)
      .select(col("b").as("id"))
      .distinct()

    newDocs.select("id")
      .join(dupExact.withColumn("de", lit(true)), Seq("id"), "left")
      .join(dupNear.withColumn("dn", lit(true)), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("de"), lit(false)).as("dup_exact"),
        coalesce(col("dn"), lit(false)).as("dup_near"))
      .withColumn("kept", !col("dup_exact") && !col("dup_near"))
  }

  /** OFFLINE index check: the protocol-level namespace findings
    * ([[graft.util.TableIndex.fsck]]) plus this index's row-level
    * invariant — every document id present in `hashes` must appear in
    * `sigs`, `shingles` AND `bands` (and vice versa). The commit
    * protocol makes a divergence impossible through any crash it
    * covers; fsck is for the states it does NOT cover (a manual copy
    * that dropped a table's files, a partial filesystem restore, a
    * foreign writer) — a doc missing from `bands` is silently
    * un-probeable, the failure mode that motivates the whole batch
    * protocol. Full-table id scans by design: an offline maintenance
    * pass, never the query path. */
  def fsckIndex(spark: SparkSession, indexDirOrRoot: String): Seq[TableIndex.FsckFinding] = {
    val indexDir = TableIndex.resolveDir(spark, indexDirOrRoot)
    val proto = TableIndex.rootFindings(spark, indexDirOrRoot) ++
      TableIndex.fsck(spark, indexDir)
    val expected = Seq("hashes", "sigs", "shingles", "bands")
    val present = expected.flatMap { t =>
      TableIndex.readTableIfExists(spark, indexDir, s"$t.parquet")
        .map(d => t -> d.select(col("id")).distinct())
    }
    // a wholly-absent table is EXACTLY the dropped-a-table restore this
    // check exists for — it must be a finding, not a silent skip that
    // leaves the surviving tables "in parity" with each other
    val missingTables = expected.filterNot(t => present.exists(_._1 == t))
      .map(t => TableIndex.FsckFinding("missing-table", s"$t.parquet holds no data"))
    val parity = present.headOption.toSeq.flatMap { case (baseName, base) =>
      present.tail.flatMap { case (t, d) =>
        val missing = base.join(d, Seq("id"), "left_anti").count()
        val extra = d.join(base, Seq("id"), "left_anti").count()
        (if (missing > 0)
           Seq(TableIndex.FsckFinding("id-parity", s"$t.parquet missing $missing ids present in $baseName"))
         else Nil) ++
        (if (extra > 0)
           Seq(TableIndex.FsckFinding("id-parity", s"$t.parquet has $extra ids absent from $baseName"))
         else Nil)
      }
    }
    proto ++ missingTables ++ parity
  }
}
