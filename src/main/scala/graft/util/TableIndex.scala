package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared lifecycle machinery for the PERSISTED multi-table indexes
  * ([[graft.text.IncrementalDedup]], [[graft.ml.IvfIndex]]): tombstone
  * merge-on-read, index metadata, and — the part neither parquet nor a
  * bare `mode("append")` gives — CRASH-CONSISTENT multi-table batch
  * commits with idempotent replay.
  *
  * The failure modes this closes (both were documented-but-open in the
  * indexes themselves): an in-place append writes several tables in
  * sequence, so a crash between table writes leaves a TORN index
  * (hashes updated, bands not — every later probe silently misses
  * near-dups); and a streaming micro-batch replayed after a crash
  * re-appends its rows, DUPLICATING them. At a production shard
  * cadence (hourly appends for months) both are weekly events, not
  * corner cases.
  *
  * Protocol — batch-id-named file sets with one atomic marker:
  *  1. STAGE: each table's new rows are written as a normal parquet
  *     dataset under `dir/_staging/<bid>/<table>/` (never visible to
  *     readers — Spark ignores `_`-prefixed paths).
  *  2. MOVE: every staged data file is renamed into the live table
  *     directory (preserving partition subpaths, so `bp=…`/`cell=…`
  *     pruning is untouched) under the name `b_<bid>__<original>` —
  *     the batch id IS the file name, which is what makes rollback
  *     possible without a file manifest.
  *  3. COMMIT: create the empty marker `dir/_commits/<bid>` — ONE
  *     atomic file create covering ALL tables of the batch.
  *  4. CLEAN: remove the staging directory.
  *
  * Markers accumulate one file per batch forever; [[checkpointCommits]]
  * periodically folds them into a versioned `_base` file so `_commits`
  * stays O(1) between folds instead of O(total batches ever) — the
  * listing every open pays.
  *
  * [[repair]] (run by every read/maintenance entry point; a no-op FS
  * existence check when nothing is staged) restores the invariant "the
  * live directories hold exactly the committed batches": a staging dir
  * whose marker exists is leftover cleanup (all files were moved
  * before the marker — finish step 4); one without a marker is a torn
  * batch — delete its staged files and any `b_<bid>__` files already
  * moved live (rollback). Replay is idempotent by construction:
  * [[commitBatch]] returns false without writing when the batch id is
  * already committed, so a redelivered micro-batch adds nothing.
  *
  * Portability: the protocol needs only atomic single-file rename and
  * create — HDFS and local FS semantics. On a rename-less object store
  * it would sit behind a committer that provides them, the same
  * requirement Spark's own FileOutputCommitter has.
  *
  * Write concurrency (r15 — the Delta/Iceberg stage-outside-the-lock
  * posture): [[commitBatch]] stages its parquet OUTSIDE the index
  * writer lease, under a per-batch STAGING lease
  * (`_staging/<bid>/_stage.lease`, heartbeat-renewed) that tells
  * [[repair]] a live stage from a torn one. The index lease
  * (`dir/_writer.lease`, atomic create-no-overwrite) covers only the
  * MOVE PHASE — repair + renames + marker + fold, metadata RPCs
  * independent of data volume — so N producers appending different
  * batches overlap their data writes fully and serialize only on the
  * cheap move. A contended move FAILS FAST by default (a typed
  * [[LeaseContentionException]]), or polls when the caller opts into
  * `leaseWaitMs` (batch producers racing a publisher's catch-up
  * window) / [[awaitingLease]] (streaming sinks). A crashed writer's
  * lease expires ([[LeaseMs]]) and the next writer steals it; a
  * crashed stager's stage lease expires and the next repair sweeps the
  * dead stage. Both leases are advisory in the one way any lock on a
  * rename-only filesystem must be: a steal decided during a long GC
  * pause of the old holder can race — the protocol stays
  * crash-consistent regardless (the loser's batch is torn and rolls
  * back), the leases exist to make the overlap LOUD.
  *
  * Readers have two postures. Plain reads ([[readTableIfExists]] and
  * the indexes' default paths) must not overlap an IN-FLIGHT commit:
  * moved files become visible to plain parquet reads before the marker
  * seals the batch, so a read racing the move phase can observe a
  * cross-table torn prefix (and a concurrent [[repair]] would roll the
  * writer's live batch back) — serialize them behind the writer, the
  * posture of every non-transactional Hive-layout table. SNAPSHOT
  * reads ([[snapshotTable]]) need no serialization: every data file
  * carries its batch id in its name and `_commits` lists the committed
  * ids, so a reader that lists files and keeps only committed-batch
  * files sees exactly the sealed prefix — an in-flight batch's moved
  * files are invisible until its marker lands (one atomic create), and
  * the snapshot path never runs [[repair]], so it can never roll back
  * a live writer's batch. A multi-table read pins ONE [[Snapshot]]
  * (one `_commits` listing) and opens every table through it, so a
  * batch committing mid-read is all-or-nothing across the read's
  * tables too — not just within each.
  */
object TableIndex {

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitsDir(dir: String) = new Path(s"$dir/_commits")
  private def stagingDir(dir: String) = new Path(s"$dir/_staging")
  private def prefix(bid: String) = s"b_${bid}__"

  /** Batch ids are embedded in marker paths and the `b_<bid>__` file
    * prefix, so the charset is load-bearing: a '/' would corrupt the
    * staging/marker paths, and a "__" inside the id would make one
    * batch's rollback prefix a PREFIX of another's files — repair of a
    * torn batch "x" would delete committed batch "x__y"'s rows. A
    * LEADING '_' would name a marker the `_commits` listing treats as
    * a protocol file, not a marker: the batch would commit (its marker
    * exists for [[isCommitted]]) yet stay permanently invisible to
    * [[committedBids]] and every snapshot read. Fail at entry, not at
    * repair time. */
  private[graft] def requireValidBid(bid: String): Unit =
    require(bid.nonEmpty && !bid.startsWith("_") && !bid.contains("__") &&
        bid.forall(c => c.isLetterOrDigit || c == '_' || c == '-'),
      s"invalid batch id '$bid': must be non-empty [A-Za-z0-9_-], not start with '_', " +
        "and contain no '__' (the id names marker and data-file paths)")

  /** A fresh batch id for a manual (non-stream) append. Stream callers
    * pass their own deterministic id (checkpoint-salted micro-batch
    * number) so a replayed batch resolves to the SAME id and is
    * skipped; manual ids only need uniqueness. */
  def newBatchId(tag: String = "a"): String =
    tag + java.util.UUID.randomUUID().toString.replace("-", "")

  /** The deterministic per-stream batch-id salt: the checkpoint path,
    * NORMALIZED (`fs.makeQualified` — scheme, working-dir resolution,
    * redundant-separator collapse) before hashing, so restarting a
    * stream with a differently-SPELLED path to the same checkpoint
    * (trailing slash, relative vs absolute) re-derives the SAME salt
    * and the exactly-once replay window stays closed. 64-bit (MD5-
    * folded via nameUUIDFromBytes) rather than the 32-bit String
    * hash — two independent streams sharing one index would need a
    * 2⁻⁶⁴-scale collision to silently skip each other's batches. */
  def checkpointSalt(spark: SparkSession, checkpointDir: String): String = {
    val p = new Path(checkpointDir)
    val q = fsOf(spark, p).makeQualified(p).toString
    java.util.UUID.nameUUIDFromBytes(q.getBytes("UTF-8"))
      .toString.replace("-", "").take(16)
  }

  /** Marker probe first (one existence check — the fast path), then —
    * only if this directory has EVER been folded (the [[FoldedSentinel]]
    * existence check) — the full bid set: a replayed micro-batch whose
    * marker was folded by [[checkpointCommits]] MUST still resolve as
    * committed, or the exactly-once guarantee breaks the first time a
    * fold runs under a live stream. A never-folded directory answers
    * in two `exists()` calls — the write path's replay pre-check must
    * not pay a full `_commits` listing per commit on a marker-heavy
    * index (the listing is exactly what the fold exists to retire).
    *
    * Validates `bid` at entry: the protocol's own `_base.*` / `_tmp.*`
    * file names would otherwise satisfy the marker existence probe and
    * make an append under such a bid silently no-op as "already
    * committed" — data loss with no error. */
  def isCommitted(spark: SparkSession, dir: String, bid: String): Boolean = {
    requireValidBid(bid)
    val m = new Path(commitsDir(dir), bid)
    val fs = fsOf(spark, m)
    if (fs.exists(m)) return true
    if (!fs.exists(new Path(commitsDir(dir), FoldedSentinel))) return false
    committedBids(spark, dir).contains(bid)
  }

  /** True iff the index at `dir` has at least one committed batch —
    * the build-memoization guard: a build that died partway leaves
    * staged or torn files but no marker, so the guard re-runs it
    * (the pre-r12 guards keyed on the FIRST-written table and could
    * skip a rebuild over a half-written index). */
  def anyCommitted(spark: SparkSession, dir: String): Boolean =
    committedBids(spark, dir).nonEmpty

  /** All committed batch ids — ONE directory listing (markers are
    * empty files named by their bid; `_`-prefixed entries are protocol
    * files) plus the newest `_base.<ver>` checkpoint's folded bids
    * (see [[checkpointCommits]]). Any interleaving with a concurrent
    * checkpoint yields the complete set: the new base lands (one
    * atomic rename) BEFORE any marker it folds is deleted, so a
    * listing sees every bid in a marker, a base, or both — never in
    * neither. */
  def committedBids(spark: SparkSession, dir: String): Set[String] = {
    val c = commitsDir(dir)
    val fs = fsOf(spark, c)
    if (!fs.exists(c)) return Set.empty
    // bounded re-list: a concurrent fold can delete the base we just
    // listed (after publishing its successor) — re-listing finds the
    // newer base, whose bid set is a superset. Persistent absence is a
    // genuine FS fault and must THROW, never shrink the bid set.
    var attempt = 0
    while (true) {
      val entries = fs.listStatus(c).iterator.map(_.getPath.getName).toSeq
      // '_'-prefixed entries are protocol files, '.'-prefixed are FS
      // artifacts (ChecksumFileSystem .crc sidecars) — neither is a marker
      val markers = entries.filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
      val newestBase = entries.filter(_.startsWith(BasePrefix)).sorted.lastOption
      try return newestBase.fold(markers)(b => markers ++ readBaseBids(fs, new Path(c, b)))
      catch {
        case e: java.io.FileNotFoundException =>
          attempt += 1
          if (attempt >= 5) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  // -- commit-marker checkpointing ---------------------------------
  // Every batch leaves one empty marker file forever; at streaming
  // micro-batch cadence (hourly shards for months, or a per-minute
  // stream) `_commits` grows to 10⁴–10⁵ entries and EVERY open —
  // snapshot pin, replay check, memoization guard — pays that
  // listing. checkpointCommits folds the markers into one versioned
  // text file. Committed bids are append-only facts (nothing
  // un-commits a batch), so any union of a stale base with surviving
  // markers is correct — that is what makes the fold safe to run
  // against live readers with no coordination beyond the writer
  // lease.

  private val BasePrefix = "_base."

  /** Created (once, never removed) by the FIRST fold of a directory:
    * its absence proves no base file has ever existed, so a missing
    * marker is authoritative and [[isCommitted]] answers a miss with
    * two `exists()` calls instead of a full `_commits` listing — the
    * write path's per-commit replay pre-check must not pay the very
    * listing the fold exists to retire. Ordering makes the sentinel
    * sound: it lands AFTER the base publish and BEFORE any marker
    * deletion, so a reader finding neither a bid's marker nor the
    * sentinel is guaranteed that bid was never folded. */
  private val FoldedSentinel = "_folded"

  /** THROWS on a read failure rather than degrading to an empty set:
    * a swallowed error here would silently drop every folded batch
    * from a reader's view — and, inside [[checkpointCommits]], would
    * write a new base MISSING those bids and then delete the old one,
    * permanently un-committing data. Transient FS errors must surface
    * as failed operations, never as a smaller bid set.
    *
    * Cached per (qualified path, modificationTime, length): base files
    * are IMMUTABLE once published (a fold writes a NEW version, never
    * rewrites), so a parsed bid set is valid for as long as that file
    * status holds — repeat opens skip the re-read of a file that grows
    * with total batches ever. The path alone is NOT a sufficient key:
    * [[wipe]] + rebuild at the same directory restarts base versioning
    * at `_base.…001`, re-publishing the same qualified path with a
    * DIFFERENT generation's bids — a path-keyed cache would serve the
    * dead generation's set, hiding newly committed batches from
    * snapshot readers and letting replayed bids re-append rows. The
    * FileStatus in the key catches that across JVMs; [[wipe]] also
    * purges same-JVM entries eagerly (local-FS modification times have
    * coarse granularity, so an immediate rebuild could collide). */
  private val baseBidsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()

  private def readBaseBids(fs: FileSystem, p: Path): Set[String] = {
    val q = fs.makeQualified(p).toString
    val st = fs.getFileStatus(p) // FileNotFoundException → caller's bounded re-list
    val key = s"$q#${st.getModificationTime}#${st.getLen}"
    val cached = baseBidsCache.get(key)
    if (cached != null) return cached
    val in = fs.open(p)
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    val bids = new String(bytes, "UTF-8").split("\n").iterator
      .map(_.trim).filter(_.nonEmpty).toSet
    baseBidsCache.put(key, bids)
    bids
  }

  // -- collected-dim-table cache ------------------------------------
  // The per-probe constant cost of the index read paths is DRIVER-SIDE
  // planning, not distributed compute (measured, dev/EmbStageProbe:
  // reading + collecting an 81-row centroid table costs ~0.14 s per
  // pass; the geometry join another ~0.25 s — against millisecond
  // task time). At production shard cadence every processShard /
  // nearDupsExact / search / appendInPlace call pays those constants
  // again for tables that are written once per generation. Collected
  // dim tables (centroids, PQ books, aggregated radii) are therefore
  // cached for the session, keyed by the table's VISIBLE-FILE
  // fingerprint — qualified path + each data file's (name,
  // modificationTime, length), the [[readBaseBids]] discipline: a
  // wipe()+rebuild at the same path re-keys (different files), an
  // appended geometry wave re-keys (new files), a [[replaceTable]]
  // re-keys (replaced files), and a snapshot exposing a different
  // committed subset re-keys (the bid filter is applied to the file
  // list before fingerprinting). The fingerprint costs one recursive
  // listStatus of a dim directory (a handful of files — one namenode
  // RPC) against the Spark read + collect it replaces.

  private val dimRowsCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Test hook: the dim cache's live keys — the eviction spec pins
    * "one live entry per (tag, table)" without reaching into the map. */
  private[graft] def dimCacheKeys: Set[String] = {
    import scala.jdk.CollectionConverters._
    dimRowsCache.keySet.asScala.toSet
  }

  /** Load-through cache of a COLLECTED dim table: returns `load` over
    * the table's rows, cached under the visible-file fingerprint (and
    * `tag`, so two collected shapes of one table don't collide). None
    * when the table is absent or has no visible data file — callers
    * keep their own fail-loud or default semantics. Only use for
    * tables whose collected form is dim-table-sized; the cache holds
    * strong references for the session. */
  def cachedDim[A <: AnyRef](tag: String, spark: SparkSession, dir: String, table: String,
                             snap: Option[Snapshot])(load: DataFrame => A): Option[A] = {
    val t = new Path(new Path(dir), table)
    val fs = fsOf(spark, t)
    if (!fs.exists(t)) return None
    val visible = listFilesRec(fs, t).filter { f =>
      val nm = f.getPath.getName
      if (nm.startsWith("_") || nm.startsWith(".")) false
      else if (nm.startsWith("b_")) {
        val i = nm.indexOf("__")
        snap match {
          case Some(s) => i > 2 && s.bids.contains(nm.substring(2, i))
          case None    => true
        }
      } else true
    }
    if (visible.isEmpty) return None
    val keyPrefix = tag + "|" + fs.makeQualified(t).toString + "|"
    val key = keyPrefix +
      visible.map(f => s"${f.getPath.getName}#${f.getModificationTime}#${f.getLen}")
        .sorted.mkString(",")
    val cached = dimRowsCache.get(key)
    if (cached != null) return Some(cached.asInstanceOf[A])
    val df = snap match {
      case Some(s) => snapshotTable(spark, s, table)
      case None    => readTableIfExists(spark, dir, table)
    }
    df.map { d =>
      val a = load(d)
      // ONE live entry per (tag, table): every geometry append /
      // refresh / generation swap re-keys, and a long-lived streaming
      // driver at per-shard cadence would otherwise accumulate dead
      // superseded entries for the whole session (strong references —
      // only wipe() purged them before r15). Evicting on insert trades
      // re-collection of a still-pinned OLD snapshot's dims (rare,
      // dim-table-cheap) for bounded memory (always).
      dimRowsCache.keySet.removeIf(k => k.startsWith(keyPrefix) && k != key)
      dimRowsCache.put(key, a)
      a
    }
  }

  /** Fold the current commit markers into one `_base.<ver+1>` file and
    * delete them — bounds `_commits` at O(1) entries between folds
    * instead of O(total batches ever). Ordering is superset-safe at
    * every step: (1) the union of the newest base and all markers is
    * written to a `_`-ignored temp and RENAMED to `_base.<ver+1>` (one
    * atomic publish — readers never see a partially-written base);
    * (2) only then are the folded markers deleted; (3) older base
    * versions are removed last. A reader listing at any interleaving
    * sees every committed bid at least once, and a crash leaves only
    * redundant files (re-folded by the next call). Runs under the
    * writer lease: a marker created by a concurrent commit after the
    * listing simply survives to the next fold. */
  def checkpointCommits(spark: SparkSession, dir: String): Unit = withLease(spark, dir) {
    checkpointCommitsLocked(spark, dir)
  }

  /** The fold body, for callers that ALREADY hold the writer lease
    * ([[commitBatch]]'s auto-fold — the lease is not reentrant). */
  private def checkpointCommitsLocked(spark: SparkSession, dir: String): Unit = {
    val c = commitsDir(dir)
    val fs = fsOf(spark, c)
    if (fs.exists(c)) {
      // sweep crashed folds' temps FIRST (inert — never read), and
      // unconditionally: a fold that crashed after a later successful
      // one would otherwise leave its temp behind forever (the no-op
      // path below never reached the old in-branch sweep)
      fs.listStatus(c).iterator.map(_.getPath)
        .filter(_.getName.startsWith("_tmp.")).foreach(fs.delete(_, false))
      val entries = fs.listStatus(c).map(_.getPath.getName)
      val markers = entries.filterNot(n => n.startsWith("_") || n.startsWith(".")).toSeq
      val bases = entries.filter(_.startsWith(BasePrefix)).sorted.toSeq
      if (markers.nonEmpty || bases.size > 1) {
        val ver = bases.lastOption.map(_.stripPrefix(BasePrefix).toLong).getOrElse(0L)
        val all = bases.lastOption.map(b => readBaseBids(fs, new Path(c, b)))
          .getOrElse(Set.empty) ++ markers
        val tmp = new Path(c, s"_tmp.${java.util.UUID.randomUUID().toString.replace("-", "")}")
        val out = fs.create(tmp, false)
        out.write(all.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
        out.close()
        val next = new Path(c, f"$BasePrefix${ver + 1}%019d")
        if (!fs.rename(tmp, next))
          throw new java.io.IOException(s"checkpointCommits: could not publish $next")
        // sentinel BEFORE marker deletion: from here on a missing
        // marker no longer proves "not committed", and isCommitted's
        // fast path must know that (see FoldedSentinel)
        fs.create(new Path(c, FoldedSentinel), true).close()
        markers.foreach(m => fs.delete(new Path(c, m), false))
        bases.foreach(b => fs.delete(new Path(c, b), false))
      }
      // any fold — auto or manual — restarts the commit cadence (the
      // counter is "commits since the last fold", persisted so the
      // cadence survives writer-JVM turnover; see maybeAutoFold)
      writeFoldCount(fs, dir, 0L)
    }
  }

  /** A PINNED consistent view of an index directory: the committed-bid
    * set, listed ONCE at open time. Every table opened through the
    * same Snapshot filters its file list against this one set, so a
    * batch whose marker lands WHILE a multi-table read is assembling
    * is either visible in ALL of the read's tables or in NONE.
    *
    * This is the cross-TABLE half of snapshot isolation. Filtering to
    * committed bids per table call closes the torn-PREFIX hazard (an
    * in-flight batch's moved files are invisible until its one marker
    * lands), but re-listing `_commits` per table re-opens a tear
    * ACROSS tables: a batch committing between a probe's `hashes` open
    * and its `bands` open would give the probe the batch's hashes
    * without its band rows — the same silently-missed-near-dup class
    * the whole protocol exists to prevent, time-shifted into the
    * reader. One listing per LOGICAL operation (not per table) is the
    * fix, and it is also cheaper. */
  final case class Snapshot private[util] (dir: String, bids: Set[String],
                                           origin: Option[String] = None)

  /** Pin a snapshot of `dir`: one `_commits` listing. Open one per
    * logical read (a probe, a search, a maintenance measurement) and
    * pass it to every table open inside that read.
    *
    * `dir` may be a generation ROOT (a directory carrying a
    * [[publishGeneration]] pointer): the pin resolves the pointer ONCE
    * and freezes on that generation — `(generation, bids)` — so the
    * handle keeps answering from the pinned generation even if a
    * concurrent [[publishGeneration]] swaps the pointer mid-read
    * (the pre-swap generation's files are untouched until an explicit
    * [[retireGeneration]]). `origin` records the root the caller
    * addressed, so [[resolvePin]] can recognize the handle when later
    * operations address the same root. */
  def openSnapshot(spark: SparkSession, dir: String): Snapshot = {
    val resolved = resolveDir(spark, dir)
    Snapshot(resolved, committedBids(spark, resolved),
      origin = if (resolved == dir) None else Some(dir))
  }

  /** Resolve one operation's read posture — the shared entry-point
    * logic of `processShard`/`nearDupsExact`/`search`: a caller-pinned
    * handle (`at`) wins, else a fresh per-operation pin when
    * `snapshot`, else plain. A handle pinned on a DIFFERENT index
    * throws (path-qualified comparison, so respellings of one dir
    * still match): without the check, every table read would resolve
    * against the handle's directory while the operation labels itself
    * with `dir` — answers silently computed from the wrong index. */
  def resolvePin(spark: SparkSession, dir: String, snapshot: Boolean,
                 at: Option[Snapshot]): Option[Snapshot] = {
    at.foreach { s =>
      def q(x: String) = { val p = new Path(x); fsOf(spark, p).makeQualified(p) }
      val target = q(dir)
      // three ways a handle legitimately names this index: pinned on
      // this exact directory; pinned THROUGH this root (origin records
      // the root, so the handle survives a concurrent generation swap);
      // or pinned on a generation whose ROOT is being addressed (mixed
      // addressing across a swap — the handle's generation is a direct
      // child of a pointer-bearing root)
      val ok = q(s.dir) == target ||
        s.origin.exists(o => q(o) == target) ||
        (q(s.dir).getParent == target && resolveGeneration(spark, dir).isDefined)
      require(ok,
        s"snapshot handle is pinned on index ${s.dir} but was passed to an " +
          s"operation on $dir — a cross-index handle would silently answer " +
          "from the wrong index")
    }
    at.orElse(if (snapshot) Some(openSnapshot(spark, dir)) else None)
  }

  // ---------------------------------------------------------------
  // Generation pointer
  // ---------------------------------------------------------------
  // Every whole-index rewrite — compact, recluster, the generation-
  // copy append/delete — builds a NEW directory and commits it with
  // the ordinary batch protocol; until r14 the CUTOVER (pointing
  // readers at the new generation, retiring the old one) was the
  // operator's problem, out-of-band — the one step of the maintenance
  // story a crash could leave ambiguous (new generation committed,
  // readers on the old one forever). The pointer makes the swap a
  // library guarantee: `root/_generation` holds the current
  // generation's child-directory name and is replaced by ONE atomic
  // rename, so a reader resolves the old generation or the new one,
  // never a torn pointer; a crash between the generation's commit and
  // the swap leaves the OLD generation authoritative (the new one is
  // just an unreferenced directory, re-publishable or deletable).

  private val GenPointer = "_generation"

  /** The current generation's directory under `root`, if `root`
    * carries a pointer.
    *
    * Bounded re-read on transient anomalies: the pointer swap is ONE
    * atomic rename of the data file, but on a checksummed local
    * filesystem the `.crc` sidecar moves in a separate step — a read
    * landing in that microsecond window sees new data with the old
    * checksum (ChecksumException), or no file between the sidecar
    * shuffles. Both are mid-swap states, not corruption: re-read
    * (the [[committedBids]] bounded-re-list discipline; found by the
    * live appender-vs-publisher race spec). Persistent failure is a
    * genuine FS fault and rethrows. */
  def resolveGeneration(spark: SparkSession, root: String): Option[String] = {
    val p = new Path(new Path(root), GenPointer)
    val fs = fsOf(spark, p)
    var attempt = 0
    while (true) {
      try {
        if (!fs.exists(p)) return None
        val in = fs.open(p)
        val name = try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
          finally in.close()
        return if (name.isEmpty) None else Some(new Path(new Path(root), name).toString)
      } catch {
        case e @ (_: org.apache.hadoop.fs.ChecksumException |
                  _: java.io.EOFException |
                  _: java.io.FileNotFoundException) =>
          attempt += 1
          if (attempt >= 5) throw e
          Thread.sleep(20L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Follow a generation pointer ONE hop: a pointer-bearing root
    * resolves to its current generation directory; any other path is
    * itself. Every index entry point resolves through this, so a
    * caller can address a rooted index by its root forever and
    * compact/recluster swaps stay invisible. One hop by design — a
    * generation directory carrying its own pointer is a layout error,
    * not a chain to follow. */
  def resolveDir(spark: SparkSession, path: String): String =
    resolveGeneration(spark, path).getOrElse(path)

  /** Publish `genName` (a child directory of `root`) as the current
    * generation: write-temp + ATOMIC overwrite-rename of the pointer
    * file. Fails loud if the generation holds no committed batch —
    * publishing a torn build would point every reader at an index the
    * protocol considers nonexistent. Callers publish only AFTER the
    * generation's commit marker lands (the [[commitBatch]] return), so
    * the crash window between commit and swap is one-sided: the old
    * generation stays authoritative. */
  def publishGeneration(spark: SparkSession, root: String, genName: String): Unit = {
    require(genName.nonEmpty && !genName.contains("/") && !genName.startsWith("_") &&
        !genName.startsWith("."),
      s"generation name '$genName' must be a plain child-directory name")
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    val genDir = new Path(rootP, genName)
    require(fs.exists(genDir), s"generation directory $genDir does not exist")
    require(anyCommitted(spark, genDir.toString),
      s"generation $genDir holds no committed batch — publishing it would point " +
        "readers at a torn index")
    val tmp = new Path(rootP,
      s"$GenPointer.tmp.${java.util.UUID.randomUUID().toString.replace("-", "")}")
    val out = fs.create(tmp, false)
    out.write(genName.getBytes("UTF-8"))
    out.close()
    // FileContext.rename(OVERWRITE) is the one Hadoop API with atomic
    // replace-existing semantics (HDFS implements it as a single
    // namenode op; plain FileSystem.rename refuses an existing dest)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.getUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(fc.makeQualified(tmp), fc.makeQualified(new Path(rootP, GenPointer)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Pointer-level [[fsck]] findings of a generation ROOT (empty for a
    * plain index directory) — the states the swap protocol leaves
    * enumerable rather than ambiguous:
    *
    *  - `dangling-pointer`: the pointer names a missing directory, or
    *    one with no committed batch (manual damage — [[publishGeneration]]
    *    refuses to create this, and readers fail loud on it);
    *  - `unpublished-generation`: a sibling generation directory the
    *    pointer does not name — EITHER a publisher crashed between the
    *    new generation's commit and the swap (re-publish or delete it)
    *    OR a superseded generation awaiting [[retireGeneration]]. The
    *    operator disambiguates by age; the tool's job is that neither
    *    state is silent disk growth.
    *
    * The index-level fsck entry points prepend these, so auditing a
    * rooted index by its root covers both layers in one call. */
  def rootFindings(spark: SparkSession, path: String): Seq[FsckFinding] =
    resolveGeneration(spark, path) match {
      case None => Seq.empty
      case Some(cur) =>
        val out = Seq.newBuilder[FsckFinding]
        val rootP = new Path(path)
        val fs = fsOf(spark, rootP)
        val curP = fs.makeQualified(new Path(cur))
        if (!fs.exists(curP))
          out += FsckFinding("dangling-pointer", s"$cur does not exist")
        else if (!anyCommitted(spark, cur))
          out += FsckFinding("dangling-pointer", s"$cur holds no committed batch")
        for (d <- fs.listStatus(rootP)) {
          val nm = d.getPath.getName
          if (d.isDirectory && !nm.startsWith("_") && !nm.startsWith(".") &&
              fs.makeQualified(d.getPath) != curP)
            out += FsckFinding("unpublished-generation", nm)
          // a publisher that crashed between its temp write and the
          // atomic rename leaves `_generation.tmp.*` — inert (never
          // read) but silent disk growth nothing else lists
          if (d.isFile && nm.startsWith(s"$GenPointer.tmp."))
            out += FsckFinding("pointer-tmp", nm)
        }
        out.result()
    }

  /** Age-gated sweep of a generation root — the retirement half of the
    * swap made an OPS PRIMITIVE instead of a manual loop: deletes (a)
    * sibling generation directories the pointer does not name and (b)
    * crashed publishers' `_generation.tmp.*` files, both only when
    * their newest contained file is older than `graceMs`. The grace
    * window is the snapshot-retention policy for UNREGISTERED readers
    * (the Delta-VACUUM posture — a filesystem cannot enumerate them);
    * readers that REGISTER a [[pinSnapshot]] pin are first-class:
    * their generation is untouchable while the pin is live, no matter
    * its age, and an expired pin (crashed reader) is swept here by the
    * same age gate. The CURRENT generation is never touched (same
    * guard as [[retireGeneration]]); a committed-but-unpublished
    * successor younger than the grace is left for its publisher to
    * finish. Returns what was deleted. */
  def vacuumGenerations(spark: SparkSession, root: String, graceMs: Long): Seq[String] = {
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    val cur = resolveGeneration(spark, root).getOrElse(
      throw new IllegalStateException(
        s"$root carries no _generation pointer — vacuumGenerations only operates on " +
          "pointer-rooted indexes (a plain directory has no superseded generations)"))
    val curQ = fs.makeQualified(new Path(cur))
    val cutoff = System.currentTimeMillis() - graceMs
    // generations with UNEXPIRED reader pins are untouchable no matter
    // their age — "retire only after readers drain" as a checked
    // invariant, not an operator contract (see the reader-pin section)
    val pinned = livePinnedGenerations(fs, root)
    val deleted = Seq.newBuilder[String]
    for (d <- fs.listStatus(rootP)) {
      val nm = d.getPath.getName
      val isStaleDir = d.isDirectory && !nm.startsWith("_") && !nm.startsWith(".") &&
        fs.makeQualified(d.getPath) != curQ && !pinned.contains(nm) &&
        (d.getModificationTime +: listFilesRec(fs, d.getPath).map(_.getModificationTime))
          .max < cutoff
      val isStaleTmp = d.isFile && nm.startsWith(s"$GenPointer.tmp.") &&
        d.getModificationTime < cutoff
      if (isStaleDir || isStaleTmp) {
        fs.delete(d.getPath, true)
        if (d.isDirectory) purgeCachesUnder(fs, d.getPath)
        deleted += nm
      }
    }
    // EXPIRED pin files (crashed readers that never released) are
    // stale protocol files like pointer-tmps: swept by the same age
    // gate, so `_pins` stays bounded by the live-reader count
    val pd = pinsDir(root)
    if (fs.exists(pd)) {
      val now = System.currentTimeMillis()
      for (s <- fs.listStatus(pd)
           if s.isFile && !s.getPath.getName.startsWith(".") &&
             s.getModificationTime < cutoff &&
             !readLease(fs, s.getPath).exists(_._2 >= now)) {
        fs.delete(s.getPath, false)
        deleted += s"_pins/${s.getPath.getName}"
      }
    }
    deleted.result()
  }

  /** Delete a SUPERSEDED generation's directory — the retirement half
    * of the swap, guarded so the current generation (the one the
    * pointer names) can never be retired: readers resolving the
    * pointer right now would lose their files mid-read. Pinned
    * snapshot handles on the retired generation become invalid — the
    * operator contract is retire only after in-flight readers drain
    * (the lease-less analog of every snapshot-retention policy). */
  def retireGeneration(spark: SparkSession, root: String, genName: String): Unit = {
    val target = new Path(new Path(root), genName)
    val fs = fsOf(spark, target)
    val current = resolveGeneration(spark, root)
    require(!current.exists(c => fsOf(spark, new Path(c)).makeQualified(new Path(c)) ==
        fs.makeQualified(target)),
      s"cannot retire the CURRENT generation $genName of $root — publish a successor first")
    require(!livePinnedGenerations(fs, root).contains(genName),
      s"cannot retire generation $genName of $root — live reader pins hold it " +
        "(release them, or let them expire); retirement must wait for readers to drain")
    if (fs.exists(target)) { fs.delete(target, true); purgeCachesUnder(fs, target) }
    ()
  }

  // ---------------------------------------------------------------
  // Reader pins — retirement that can SEE its readers
  // ---------------------------------------------------------------
  // The grace window of vacuumGenerations is the Delta-VACUUM posture:
  // a filesystem cannot enumerate live readers, so "retire only after
  // readers drain" was an operator CONTRACT, checked by nothing. A
  // reader pin turns it into a checked invariant: a long-running
  // reader registers `root/_pins/<uuid>` (content: the pinned
  // generation's name + a heartbeat-renewed expiry — the lease file
  // format) and vacuum/retire REFUSE a generation with an unexpired
  // pin. Expired pins (crashed readers) are swept by vacuum like any
  // other stale protocol file, so the age-based fallback survives.
  //
  // OPT-IN by design, not wired into openSnapshot: a pin is one file
  // create + a heartbeat thread, which is nothing for a session-long
  // analytical reader but would be a write amplification disaster on
  // the probe path (thousands of openSnapshot calls per second at
  // production shard cadence, against a read path that is otherwise
  // one listing). Short reads stay safe through the grace window,
  // exactly as before.

  private def pinsDir(root: String) = new Path(new Path(root), "_pins")

  /** A registered reader pin: the pinned [[Snapshot]] plus the pin
    * file's lifecycle. `close()` releases the pin (stops the heartbeat
    * and deletes the file); an unreleased pin of a crashed reader
    * expires and is swept by [[vacuumGenerations]]. */
  final class ReaderPin private[util] (val snapshot: Snapshot,
                                       releaseBody: () => Unit) extends AutoCloseable {
    override def close(): Unit = releaseBody()
  }

  /** [[openSnapshot]] plus a REGISTERED pin on the resolved
    * generation: while the pin is live (heartbeat-renewed `leaseMs`
    * expiry), [[vacuumGenerations]] and [[retireGeneration]] refuse to
    * delete that generation — the handle's files cannot vanish
    * mid-read no matter how long the read runs or how short the
    * vacuum grace is. On a PLAIN (pointer-less) directory this is just
    * [[openSnapshot]] (nothing retires plain directories; close() is a
    * no-op). Use for session-length readers; per-probe reads should
    * keep using [[openSnapshot]] (see the section comment). */
  def pinSnapshot(spark: SparkSession, dirOrRoot: String,
                  leaseMs: Long = LeaseMs): ReaderPin = {
    val snap = openSnapshot(spark, dirOrRoot)
    snap.origin match {
      case None => new ReaderPin(snap, () => ())
      case Some(root) =>
        val genName = new Path(snap.dir).getName
        val fs = fsOf(spark, new Path(root))
        val p = new Path(pinsDir(root),
          "p" + java.util.UUID.randomUUID().toString.replace("-", ""))
        // the pin file IS a lease file whose token is the generation
        // name — readLease/renewLease work unchanged, and vacuum reads
        // (generation, expiry) in one parse
        val out = fs.create(p, false)
        out.write(s"$genName ${System.currentTimeMillis() + leaseMs}".getBytes("UTF-8"))
        out.close()
        val hb = startHeartbeatAt(fs, p, genName, leaseMs)
        new ReaderPin(snap, () => {
          try hb.close() catch { case _: Throwable => () }
          try { fs.delete(p, false); () } catch { case _: java.io.IOException => () }
        })
    }
  }

  /** The generation names held by UNEXPIRED reader pins under `root` —
    * one `_pins` listing plus one small read per pin (readers are
    * humans and sessions, not shards: the dir holds units, not
    * thousands). */
  private def livePinnedGenerations(fs: FileSystem, root: String): Set[String] = {
    val pd = pinsDir(root)
    if (!fs.exists(pd)) return Set.empty
    val now = System.currentTimeMillis()
    fs.listStatus(pd).iterator
      .filter(s => s.isFile && !s.getPath.getName.startsWith("."))
      .flatMap(s => readLease(fs, s.getPath))
      .filter(_._2 >= now).map(_._1).toSet
  }

  // ---------------------------------------------------------------
  // Generation swap vs concurrent writers — the linearized cutover
  // ---------------------------------------------------------------
  // The pointer alone (r14 first half) left two silent-loss races
  // open between a publisher and a root-addressed writer:
  //  (1) publisher-side: a batch committed to the OLD generation
  //      after the rewrite read its tables but before the swap is
  //      simply absent from the new generation — lost at cutover;
  //  (2) appender-side: a writer that resolved the pointer just
  //      before a swap commits into the now-superseded directory —
  //      invisible to every post-swap root reader.
  // Both close on the same axis the protocol already has: the source
  // generation's WRITER LEASE. The publisher holds it from the
  // late-bid listing through the pointer rename (catch-up copies any
  // late batch into the new generation first), and every
  // root-addressed commit re-validates the pointer UNDER that same
  // lease — so a commit either lands before the publisher's listing
  // (and is carried over, same bid) or fails loud and retries against
  // the new generation. A third, quieter hazard closes with
  // [[seedCommittedHistory]]: the new generation re-files every
  // source row under its own batch id, so WITHOUT carrying the
  // source's bid history a stream replaying a pre-swap micro-batch
  // against the root would find no marker and re-append — duplicates
  // with no error, the first crash after the first compact.

  /** Thrown when a ROOT-addressed mutation loses the race with a
    * concurrent generation swap: the directory it resolved is no
    * longer the one the pointer names. The batch was NOT committed —
    * re-resolving the root and retrying is always safe (batch ids
    * make the retry idempotent); [[mutateCurrent]] does exactly that. */
  final class GenerationSupersededException(msg: String) extends IllegalStateException(msg)

  /** Thrown by a contended lease acquire: a LIVE writer holds the
    * directory's writer lease. The fail-fast contract for concurrent
    * production writers — but a typed exception, so callers whose
    * retry IS safe (idempotent batch-id mutations: streaming sinks
    * waiting out a publisher's catch-up window) can wait via
    * [[awaitingLease]] without string-matching messages. */
  final class LeaseContentionException(msg: String) extends IllegalStateException(msg)

  /** Retry `body` while it fails on writer-lease contention, bounded
    * by `waitMs` — for STREAMING micro-batch sinks: a maintenance
    * publish holds the source generation's lease for its catch-up
    * window (seconds-to-minutes), and without this a micro-batch
    * firing inside that window would FAIL THE QUERY (the restart
    * replays exactly-once, but a routine compaction must not be an
    * operational event). Only for idempotent bodies (batch-id-guarded
    * mutations); two genuinely concurrent writers still surface as
    * the timeout rethrow. */
  def awaitingLease[A](waitMs: Long = LeaseWaitMs)(body: => A): A = {
    val deadline = System.currentTimeMillis() + waitMs
    while (true) {
      try return body
      catch {
        case e: LeaseContentionException =>
          if (System.currentTimeMillis() >= deadline) throw e
          Thread.sleep(200)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Run a mutation against the CURRENT generation of `dirOrRoot`,
    * retrying (bounded) when a concurrent generation swap supersedes
    * the resolved directory mid-mutation. The body receives
    * `(resolvedDir, requireCurrentOf)` and must pass the second value
    * to [[commitBatch]], which re-validates the pointer under the
    * writer lease — the swap also runs under that lease
    * ([[catchUpAndPublish]]), so the check linearizes the race instead
    * of narrowing it. A plain (pointer-less) directory passes straight
    * through. Retries are bounded: back-to-back swaps are a
    * maintenance misconfiguration, not a state to spin against. */
  def mutateCurrent[A](spark: SparkSession, dirOrRoot: String)
                      (body: (String, Option[String]) => A): A = {
    if (resolveGeneration(spark, dirOrRoot).isEmpty) return body(dirOrRoot, None)
    var attempt = 0
    while (true) {
      val dir = resolveDir(spark, dirOrRoot)
      try return body(dir, Some(dirOrRoot))
      catch {
        case e: GenerationSupersededException =>
          attempt += 1
          if (attempt >= 3) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Seed a new generation's committed-bid HISTORY with `bids`
    * (markers-only — no data files move): the replay bridge across a
    * generation swap. A compacted/reclustered generation re-files
    * every source row under its own single batch id, so the source's
    * markers do not exist in it — and a stream replaying an already-
    * applied micro-batch against the ROOT after the swap would find no
    * marker, re-append, and silently double every row it ever wrote.
    * Folded bids are committed FACTS (their rows are present,
    * re-filed), so they are recorded in the new generation's `_base`
    * checkpoint (plus the [[FoldedSentinel]]), making [[isCommitted]]
    * answer true forever — the exactly-once replay window stays closed
    * across cutovers. Additive and idempotent (unions with any
    * existing base). Requires the generation to hold its own committed
    * batch first, so the seeded history can never make a TORN build
    * pass [[publishGeneration]]'s committed-batch guard. */
  def seedCommittedHistory(spark: SparkSession, dir: String, bids: Set[String]): Unit = {
    if (bids.isEmpty) return
    bids.foreach(requireValidBid)
    require(anyCommitted(spark, dir),
      s"seedCommittedHistory($dir): the generation holds no committed batch of its own — " +
        "seeding history into a torn build would let it pass the publish guard")
    withLease(spark, dir) {
      val c = commitsDir(dir)
      val fs = fsOf(spark, c)
      fs.mkdirs(c)
      val bases = fs.listStatus(c).map(_.getPath.getName).filter(_.startsWith(BasePrefix)).sorted
      val ver = bases.lastOption.map(_.stripPrefix(BasePrefix).toLong).getOrElse(0L)
      val all = bases.lastOption.map(b => readBaseBids(fs, new Path(c, b)))
        .getOrElse(Set.empty) ++ bids
      val tmp = new Path(c, s"_tmp.${java.util.UUID.randomUUID().toString.replace("-", "")}")
      val out = fs.create(tmp, false)
      out.write(all.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
      out.close()
      val next = new Path(c, f"$BasePrefix${ver + 1}%019d")
      if (!fs.rename(tmp, next))
        throw new java.io.IOException(s"seedCommittedHistory: could not publish $next")
      // sentinel AFTER the base lands: isCommitted's slow path only
      // consults the base when the sentinel exists
      fs.create(new Path(c, FoldedSentinel), true).close()
    }
  }

  /** The rows ONE committed batch contributed to `table` — strictly
    * the files carrying its `b_<bid>__` prefix (unlike
    * [[snapshotTable]], non-protocol base files are NOT included).
    * None when the batch touched no file of this table. Partition
    * directories are recovered via `basePath` as everywhere else. */
  def batchRows(spark: SparkSession, dir: String, table: String, bid: String): Option[DataFrame] = {
    requireValidBid(bid)
    val t = new Path(new Path(dir), table)
    val fs = fsOf(spark, t)
    if (!fs.exists(t)) return None
    val pfx = prefix(bid)
    val files = listFilesRec(fs, t).map(_.getPath).filter(_.getName.startsWith(pfx))
    if (files.isEmpty) None
    else Some(spark.read.option("basePath", fs.makeQualified(t).toString)
      .parquet(files.map(_.toString): _*))
  }

  /** Copy committed batches from `srcDir` into `dstDir`
    * BIT-IDENTICALLY — file-level copy routed through the ordinary
    * staging protocol (stage → checked renames → one atomic marker per
    * batch), each batch keeping its ID: replay semantics carry over,
    * and a crash mid-copy is a torn batch the next [[repair]] rolls
    * back like any other. Batches already committed in `dstDir` skip
    * (idempotent). The SOURCE is never modified — it may still be
    * serving pinned snapshot readers. Sound only when the rows are
    * valid in the destination as-is (compact: nothing is
    * model-relative); a RECLUSTERED generation must re-encode instead
    * (see [[graft.ml.IvfIndex.reclusterPublish]]). */
  def copyBatches(spark: SparkSession, srcDir: String, dstDir: String,
                  bids: Seq[String]): Unit = {
    if (bids.isEmpty) return
    bids.foreach(requireValidBid)
    val srcP = new Path(srcDir)
    val fsS = fsOf(spark, srcP)
    val conf = spark.sparkContext.hadoopConfiguration
    withLease(spark, dstDir) {
      val fsD = fsOf(spark, new Path(dstDir))
      repair(spark, dstDir)
      val tableDirs = fsS.listStatus(srcP).filter(s => s.isDirectory &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith(".")).map(_.getPath)
      for (bid <- bids.sorted if !isCommitted(spark, dstDir, bid)) {
        val pfx = prefix(bid)
        val stage = new Path(stagingDir(dstDir), bid)
        // stage lease here too (the commitBatch discipline): the copy
        // runs under the DST writer lease, but a plain READER's
        // un-leased repair() must still see this stage as live, not
        // roll it back mid-copy
        val stageTok = claimLeaseFile(fsD, stageLeasePath(stage), LeaseMs,
          s"staging of batch $bid under $dstDir")
        val stageHb = startHeartbeatAt(fsD, stageLeasePath(stage), stageTok, LeaseMs)
        try {
          val staged = Seq.newBuilder[String]
          for (t <- tableDirs) {
            val tq = fsS.makeQualified(t).toString
            val files = listFilesRec(fsS, t).map(_.getPath).filter(_.getName.startsWith(pfx))
            if (files.nonEmpty) {
              staged += t.getName
              for (f <- files) {
                val rel = f.toString.stripPrefix(tq).stripPrefix("/")
                val relParent = rel.lastIndexOf('/') match {
                  case -1 => ""
                  case i  => rel.substring(0, i)
                }
                val destDir = if (relParent.isEmpty) new Path(stage, t.getName)
                              else new Path(new Path(stage, t.getName), relParent)
                fsD.mkdirs(destDir)
                // staged WITHOUT the bid prefix — movePairs re-applies it,
                // so the live name ends identical to the source's
                org.apache.hadoop.fs.FileUtil.copy(
                  fsS, f, fsD, new Path(destDir, f.getName.stripPrefix(pfx)), false, conf)
              }
            }
          }
          renameAll(fsD, staged.result().flatMap(t => movePairs(fsD, dstDir, bid, stage, t)))
          val c = commitsDir(dstDir)
          fsD.mkdirs(c)
          fsD.create(new Path(c, bid), true).close()
          maybeAutoFold(spark, dstDir)
          fsD.delete(stage, true)
        } catch {
          case e: Throwable =>
            // a failure mid-move leaves live-but-unmarked files — keep
            // the stage dir (repair's rollback needs it) but kill its
            // lease so it reads as DEAD immediately, not after expiry
            try { fsD.delete(stageLeasePath(stage), false); () }
            catch { case _: java.io.IOException => () }
            throw e
        } finally {
          try stageHb.close() catch { case _: Throwable => () }
        }
      }
    }
  }

  /** Linearize a generation swap against concurrent root-addressed
    * writers, then publish — the missing half of the r14 pointer.
    * Under the SOURCE generation's writer lease (the same lease every
    * [[commitBatch]] on it holds): (1) `carry` folds any batch
    * committed to the source AFTER `pinned` — the bid set the new
    * generation was built from — into the new generation; (2) the
    * pointer swaps. Because the lease is held from the late-bid
    * listing through the rename, no commit can land in the source in
    * between: a root-addressed writer either committed BEFORE the
    * listing (and is carried over, same bid) or acquires the lease
    * AFTER the swap and fails its pointer re-validation
    * ([[GenerationSupersededException]] → [[mutateCurrent]] retries
    * against the new generation). The pinned bids are seeded into the
    * new generation's history first ([[seedCommittedHistory]]) so
    * replayed pre-swap micro-batches skip there too. The under-lease
    * window is proportional to LATE data (appends racing the rewrite),
    * not to the rewrite itself — the rewrite ran un-leased from its
    * pinned snapshot. Returns the late bids carried over. */
  def catchUpAndPublishWith(spark: SparkSession, root: String, srcDir: String,
                            genName: String, pinned: Set[String],
                            leaseWaitMs: Long = LeaseWaitMs)
                           (carry: Seq[String] => Unit): Seq[String] = {
    seedCommittedHistory(spark, s"$root/$genName", pinned)
    // POLLING acquire, publisher-side only: a live appender's held
    // lease (seconds per shard) must not abort a publish that already
    // invested the full rewrite — appends keep their fail-fast
    withLeaseAwait(spark, srcDir, leaseWaitMs) {
      // the pointer must still name the generation this publish was
      // BUILT from: two concurrent publishers both pinning g0 would
      // otherwise double-swap — and an append landing on the FIRST
      // winner's generation between the two swaps would be silently
      // absent from the second's (its catch-up lists only g0). The
      // loser fails loud and re-runs against the current generation.
      def q(x: String) = { val p = new Path(x); fsOf(spark, p).makeQualified(p).toString }
      val cur = resolveGeneration(spark, root)
      if (!cur.exists(c => q(c) == q(srcDir)))
        throw new GenerationSupersededException(
          s"cannot publish $genName: it was built from $srcDir but $root now points at " +
            s"${cur.getOrElse("<none>")} — a concurrent publish won; re-run against the " +
            "current generation")
      val late = (committedBids(spark, srcDir) -- pinned).toSeq.sorted
      carry(late)
      publishGeneration(spark, root, genName)
      late
    }
  }

  /** [[catchUpAndPublishWith]] with the default bit-identical
    * file-copy carry — correct whenever late rows are valid in the new
    * generation as-is (compaction; anything that does not retrain a
    * model the rows are relative to). */
  def catchUpAndPublish(spark: SparkSession, root: String, srcDir: String,
                        genName: String, pinned: Set[String]): Seq[String] =
    catchUpAndPublishWith(spark, root, srcDir, genName, pinned)(
      late => copyBatches(spark, srcDir, s"$root/$genName", late))

  // ---------------------------------------------------------------
  // Writer lease
  // ---------------------------------------------------------------

  /** Lease duration: a crashed writer's lease is stealable after this
    * long. Generous — a steal from a LIVE writer (stalled, not dead)
    * turns the fail-fast back into a race, and the protocol's
    * crash-consistency already bounds the damage of a genuine crash
    * to one torn (rolled-back) batch. */
  val LeaseMs: Long = 15L * 60 * 1000

  /** Default bound for lease-polling waits ([[awaitingLease]], the
    * publisher side of [[catchUpAndPublishWith]], bounded-wait
    * commits). STRICTLY LONGER than [[LeaseMs]] plus an allowance: the
    * operational event these waits exist to ride out is a CRASHED
    * writer's orphaned lease, which only becomes stealable after
    * LeaseMs — a wait bound shorter than that (the pre-r15 10 min
    * default) would rethrow and fail a streaming query moments before
    * the lease expired on its own. */
  val LeaseWaitMs: Long = LeaseMs + 5L * 60 * 1000

  private def leasePath(dir: String) = new Path(s"$dir/_writer.lease")

  private def readLease(fs: FileSystem, p: Path): Option[(String, Long)] =
    try {
      val in = fs.open(p)
      val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
      new String(bytes, "UTF-8").trim.split(" ") match {
        case Array(tok, exp) => Some((tok, exp.toLong))
        case _               => None
      }
    } catch { case _: java.io.IOException => None }

  /** Acquire the single-writer lease on `dir`, or THROW if a live
    * writer holds it — the fail-fast that turns the documented
    * single-writer assumption into an enforced invariant (two
    * appenders interleaving staged batches and repairs would
    * otherwise corrupt silently). An expired lease (crashed writer)
    * is stolen. Returns the owner token for [[releaseLease]]. */
  private[graft] def acquireLease(spark: SparkSession, dir: String,
                                  leaseMs: Long = LeaseMs): String = {
    fsOf(spark, new Path(dir)).mkdirs(new Path(dir))
    claimLeaseFile(fsOf(spark, leasePath(dir)), leasePath(dir), leaseMs, s"index $dir")
  }

  /** Claim the lease FILE at `p` — atomic create-no-overwrite, expired
    * leases stolen, read-back so two racing stealers resolve to one
    * owner. Shared by the index writer lease and the per-batch STAGING
    * lease ([[commitBatch]]'s stage-outside-the-lease shape): same
    * file format, same steal discipline, same advisory caveat (a steal
    * decided during a long GC pause of a live holder can race; the
    * batch protocol stays crash-consistent — the loser's work is torn
    * and rolls back — the lease makes the overlap LOUD). */
  private def claimLeaseFile(fs: FileSystem, p: Path, leaseMs: Long, what: String): String = {
    val token = java.util.UUID.randomUUID().toString.replace("-", "")
    def tryCreate(): Boolean =
      try {
        val out = fs.create(p, false) // no-overwrite: the atomic claim
        out.write(s"$token ${System.currentTimeMillis() + leaseMs}".getBytes("UTF-8"))
        out.close()
        true
      } catch { case _: java.io.IOException => false }
    def holderError(holder: Option[(String, Long)]): Nothing =
      throw new LeaseContentionException(
        s"another writer holds the lease on $what" +
          holder.map { case (t, e) => s" (owner ${t.take(8)}…, expires in ${e - System.currentTimeMillis()} ms)" }.getOrElse("") +
          " — the lease is single-holder; serialize mutations or wait for it to expire")
    if (!tryCreate()) {
      // an unparseable/empty lease is usually a writer caught mid-
      // create or mid-renewal, not a corpse — re-read before treating
      // it as expired, or a microsecond write window would let a
      // contender delete a LIVE owner's lease
      def readStable(): Option[(String, Long)] = {
        var r = readLease(fs, p)
        var tries = 0
        while (r.isEmpty && tries < 5 && fs.exists(p)) {
          Thread.sleep(20L * (tries + 1)); r = readLease(fs, p); tries += 1
        }
        r
      }
      val holder = readStable()
      val expired = holder.forall(_._2 < System.currentTimeMillis())
      if (!expired) holderError(holder)
      // crashed writer: steal (delete + re-claim). Two stealers can
      // race the delete; the read-back below makes exactly one win.
      try fs.delete(p, false) catch { case _: java.io.IOException => () }
      if (!tryCreate()) holderError(readLease(fs, p))
    }
    // read-back: a concurrent steal may have replaced our file between
    // create and now — only the token the file actually holds owns it
    readLease(fs, p) match {
      case Some((t, _)) if t == token => token
      case other                      => holderError(other)
    }
  }

  private[graft] def releaseLease(spark: SparkSession, dir: String, token: String): Unit = {
    val p = leasePath(dir)
    val fs = fsOf(spark, p)
    // delete only OUR lease — releasing after an expiry-steal must not
    // drop the new owner's claim
    if (readLease(fs, p).exists(_._1 == token)) { fs.delete(p, false); () }
  }

  /** Renew our own lease's expiry; false (and stop renewing) if the
    * file no longer carries our token — someone stole it, and
    * rewriting would clobber the new owner. */
  private def renewLease(fs: FileSystem, p: Path, token: String, leaseMs: Long): Boolean =
    readLease(fs, p) match {
      case Some((t, _)) if t == token =>
        val out = fs.create(p, true)
        out.write(s"$token ${System.currentTimeMillis() + leaseMs}".getBytes("UTF-8"))
        out.close()
        true
      case _ => false
    }

  /** Keep a held lease alive for the duration of a LONG mutation: a
    * 100 TB compaction's staged writes can exceed any fixed expiry,
    * and without renewal a second writer would legitimately "steal"
    * the lease from a LIVE writer mid-commit — the exact overlap the
    * lease exists to prevent. A daemon thread rewrites the expiry
    * every leaseMs/3 while held (and stops itself if the token ever
    * changes — a stolen lease is the new owner's). Returns a closer
    * that stops the thread. */
  private[graft] def startLeaseHeartbeat(spark: SparkSession, dir: String, token: String,
                                         leaseMs: Long = LeaseMs): AutoCloseable = {
    val p = leasePath(dir)
    startHeartbeatAt(fsOf(spark, p), p, token, leaseMs)
  }

  /** The heartbeat body, generic over the lease FILE — shared by the
    * writer lease, the staging lease, and reader pins. */
  private def startHeartbeatAt(fs: FileSystem, p: Path, token: String,
                               leaseMs: Long): AutoCloseable = {
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => {
      while (!stop.get()) {
        try Thread.sleep(math.max(50L, leaseMs / 3))
        catch { case _: InterruptedException => () }
        if (!stop.get()) {
          try { if (!renewLease(fs, p, token, leaseMs)) stop.set(true) }
          catch { case _: Throwable => () } // transient FS error: retry next tick
        }
      }
    })
    t.setDaemon(true)
    t.setName(s"graft-lease-heartbeat-${token.take(8)}")
    t.start()
    () => { stop.set(true); t.interrupt() }
  }

  private def withLease[A](spark: SparkSession, dir: String)(body: => A): A = {
    val token = acquireLease(spark, dir)
    val hb = startLeaseHeartbeat(spark, dir, token)
    try body finally {
      try hb.close() catch { case _: Throwable => () }
      releaseLease(spark, dir, token)
    }
  }

  /** [[withLease]] with a POLLING acquire — for the PUBLISHER side of
    * a generation swap only. Production appends keep the fail-fast
    * contract (cheap to retry at the caller); a publisher that already
    * invested a full rewrite must not abort because one shard append
    * holds the source lease for a few seconds. Polls until `waitMs`,
    * then rethrows the contention error. */
  private def withLeaseAwait[A](spark: SparkSession, dir: String, waitMs: Long)(body: => A): A = {
    val deadline = System.currentTimeMillis() + waitMs
    var token: String = null
    while (token == null) {
      try token = acquireLease(spark, dir)
      catch {
        case e: LeaseContentionException =>
          if (System.currentTimeMillis() >= deadline) throw e
          Thread.sleep(200)
      }
    }
    val hb = startLeaseHeartbeat(spark, dir, token)
    try body finally {
      try hb.close() catch { case _: Throwable => () }
      releaseLease(spark, dir, token)
    }
  }

  /** Delete `dir` entirely — build-time overwrite semantics (a fresh
    * build must not inherit torn files it cannot attribute to a batch). */
  def wipe(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = fsOf(spark, p)
    if (fs.exists(p)) { fs.delete(p, true); () }
    // purge cached base bid sets under the wiped dir: a rebuild at the
    // same path restarts base versioning, and a same-JVM rebuild can
    // land within the local FS's modification-time granularity — the
    // FileStatus-keyed cache alone could then serve the dead
    // generation's bids (see readBaseBids). Same for the dim cache.
    purgeCachesUnder(fs, p)
  }

  /** Drop every session-cached base-bid set and collected dim table
    * keyed under `p` — run whenever a directory tree is DELETED
    * ([[wipe]], [[vacuumGenerations]], [[retireGeneration]]): the
    * entries can never be served again (their files are gone), and on
    * a local FS a same-path rebuild within mtime granularity could
    * even collide with them. Dim-cache keys are
    * "tag|qualifiedTablePath|files" — match on the path segment. */
  private def purgeCachesUnder(fs: FileSystem, p: Path): Unit = {
    val prefix = fs.makeQualified(p).toString + "/"
    baseBidsCache.keySet.removeIf(_.startsWith(prefix))
    dimRowsCache.keySet.removeIf(_.split("\\|", 3).lift(1).exists(_.startsWith(prefix)))
    ()
  }

  /** Recursive file listing via per-directory `listStatus` — NOT
    * `fs.listFiles(p, recursive)`: the latter materializes
    * LocatedFileStatus (block locations) per file, which on a local
    * filesystem costs ~4 ms/file (measured, dev/ListProbe: 8.2 s vs
    * 0.04 s for 2,048 files — 170×) and on HDFS pulls location data
    * none of the protocol needs. Per-dir listStatus is one RPC per
    * partition directory — the standard Hive-layout listing shape. */
  private def listFilesRec(fs: FileSystem, p: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    if (!fs.exists(p)) return Seq.empty
    val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
    def rec(q: Path): Unit = fs.listStatus(q).foreach { s =>
      if (s.isDirectory) rec(s.getPath) else out += s
    }
    rec(p)
    out.result()
  }

  /** The per-batch STAGING lease: `_staging/<bid>/_stage.lease`, the
    * liveness marker that lets [[commitBatch]] stage its parquet
    * OUTSIDE the index writer lease. A stage whose lease is LIVE
    * (unexpired, heartbeat-renewed by its writer) is an in-progress
    * commit — [[repair]] must skip it, or a concurrent writer's repair
    * would roll back a batch that is still being written. A stage with
    * an expired or absent lease is DEAD (the pre-r15 protocol staged
    * under the index lease and wrote no stage lease, so legacy torn
    * stages read as dead too) and repairs exactly as before. */
  private def stageLeasePath(stage: Path) = new Path(stage, "_stage.lease")

  private def stageIsLive(fs: FileSystem, stage: Path): Boolean =
    readLease(fs, stageLeasePath(stage)).exists(_._2 >= System.currentTimeMillis())

  /** Restore "live dirs == committed batches": finish the cleanup of
    * committed batches, roll back torn ones. Idempotent; cheap when
    * `_staging` is absent. Skips LIVE stages (see [[stageLeasePath]]):
    * a writer staging outside the index lease is in progress, not
    * torn — its files are invisible to readers until its own move
    * phase, and if it dies its stage lease expires and the next repair
    * sweeps it. This also closes (for the staging phase) the old
    * documented hazard of a PLAIN reader's repair racing a live
    * writer: the stage it would have rolled back now identifies
    * itself as live. */
  def repair(spark: SparkSession, dir: String): Unit = {
    val st = stagingDir(dir)
    val fs = fsOf(spark, st)
    if (!fs.exists(st)) return
    var skippedLive = false
    for (s <- fs.listStatus(st)
         if { val live = s.isDirectory && stageIsLive(fs, s.getPath)
              if (live) skippedLive = true; !live }) {
      val bid = s.getPath.getName
      // an INVALID-named staging entry (leading '_'/'.', a '__', a
      // foreign charset) cannot have been created by commitBatch —
      // requireValidBid gates every entry point — so it is restore
      // damage or a foreign writer's junk. Tolerate it: delete the
      // staged rows WITHOUT the live-file rollback (an invalid id's
      // `b_<bid>__` prefix could alias another batch's files, and no
      // live files can exist for an id no commit ever accepted). The
      // pre-r14 path passed it to isCommitted, whose validation threw
      // from every default-posture read — exactly the incident states
      // fsck says the system should tolerate.
      val valid =
        try { requireValidBid(bid); true }
        catch { case _: IllegalArgumentException => false }
      if (valid && !isCommitted(spark, dir, bid)) {
        // torn batch: every moved file carries the bid in its name —
        // delete them wherever they landed, then the staged rows
        rollbackLiveFiles(fs, dir, bid)
      }
      fs.delete(s.getPath, true)
    }
    if (!skippedLive) fs.delete(st, true)
    ()
  }

  /** Delete every live `b_<bid>__` file of one batch — the rollback
    * half of [[repair]], also run by [[commitBatch]]'s move phase
    * directly: a torn EARLIER attempt of the same bid leaves live
    * files whose staging dir is now OURS (live, so repair skips it) —
    * without the explicit rollback the new marker would retroactively
    * commit the torn attempt's files alongside the fresh ones. */
  private def rollbackLiveFiles(fs: FileSystem, dir: String, bid: String): Unit = {
    val p = prefix(bid)
    for (t <- fs.listStatus(new Path(dir))
         if t.isDirectory && !t.getPath.getName.startsWith("_")) {
      for (f <- listFilesRec(fs, t.getPath) if f.getPath.getName.startsWith(p))
        fs.delete(f.getPath, false)
    }
  }

  /** The staged→live (src, dst) rename pairs of one table: partition
    * subpaths preserved, data files bid-prefixed. */
  private def movePairs(fs: FileSystem, dir: String, bid: String,
                        stage: Path, table: String): Seq[(Path, Path)] = {
    val src = fs.makeQualified(new Path(stage, table))
    val dst = new Path(dir, table)
    for (f <- listFilesRec(fs, src)
         if !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith(".")) yield {
      val rel = f.getPath.toString.stripPrefix(src.toString).stripPrefix("/")
      val relParent = rel.lastIndexOf('/') match {
        case -1 => ""
        case i  => rel.substring(0, i)
      }
      val destDir = if (relParent.isEmpty) dst else new Path(dst, relParent)
      (f.getPath, new Path(destDir, prefix(bid) + f.getPath.getName))
    }
  }

  /** Execute a batch's renames, CHECKED and parallel.
    *
    * Checked: `FileSystem.rename` reports some failures as a `false`
    * return instead of throwing (HDFS's posture) — ignoring it would
    * let a batch reach its commit marker with a staged file silently
    * dropped, breaking the protocol's "committed == complete"
    * invariant everything rests on. A failed rename THROWS before the
    * marker is written, so the batch stays torn and [[repair]] rolls
    * it back.
    *
    * Parallel: renames are metadata RPCs (~ms each on HDFS) issued
    * from the driver; a bulk build or compaction moves 10⁴–10⁵ files
    * and a sequential loop prices that at minutes of idle driver time.
    * A bounded thread pool issues them concurrently (rename is a
    * namespace op — no data moves; `FileSystem` handles are
    * thread-safe for it). Destination partition dirs are created
    * serially first: concurrent `mkdirs` of one dir is racy on some
    * local filesystems. dev/ProtocolProbe measures both shapes at 10⁴
    * files; SCALE.md records the numbers. */
  private[graft] def renameAll(fs: FileSystem, pairs: Seq[(Path, Path)],
                               threads: Int = 16): Unit = {
    if (pairs.isEmpty) return
    pairs.iterator.map(_._2.getParent).toSet.foreach((d: Path) => fs.mkdirs(d))
    def one(src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(
          s"rename failed: $src -> $dst — aborting before the commit marker; " +
            "the torn batch rolls back on the next repair()")
    val n = math.min(threads, pairs.size)
    if (n <= 1) { pairs.foreach { case (s, d) => one(s, d) }; return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val fut = pairs.map { case (s, d) =>
        pool.submit(new java.util.concurrent.Callable[Unit] { def call(): Unit = one(s, d) })
      }
      // get() rethrows the worker's IOException (wrapped) — the commit aborts
      fut.foreach(f => try f.get() catch {
        case e: java.util.concurrent.ExecutionException => throw e.getCause
      })
    } finally { pool.shutdown(); () }
  }

  /** The root-addressed pointer re-validation shared by [[commitBatch]]
    * and [[replaceTable]] — run UNDER the writer lease. The publisher
    * ([[catchUpAndPublishWith]]) holds this same lease for its final
    * late-bid listing + pointer rename, so the check LINEARIZES the
    * swap-vs-append race: this mutation either lands before the
    * publisher's listing (and is carried into the new generation, same
    * bid) or throws here — never silently into a superseded directory
    * no post-swap root reader will open. */
  private def requireCurrent(spark: SparkSession, root: String, dir: String): Unit = {
    def q(x: String) = { val p = new Path(x); fsOf(spark, p).makeQualified(p).toString }
    val cur = resolveGeneration(spark, root)
    if (!cur.exists(c => q(c) == q(dir)))
      throw new GenerationSupersededException(
        s"generation $dir of root $root was superseded (current: ${cur.getOrElse("<none>")}) " +
          "before this mutation acquired the writer lease — nothing was committed; " +
          "re-resolve the root and retry (mutateCurrent does this automatically)")
  }

  /** Atomically commit one batch of rows across several tables.
    * `tables`: (tableName, rows, partitionColumns). Returns false (and
    * writes nothing) when `bid` is already committed — the replayed-
    * micro-batch case. Data files are only ever ADDED to the live
    * dirs; existing files are untouched (the O(shard) in-place-append
    * contract).
    *
    * STAGING RUNS OUTSIDE THE WRITER LEASE. The staged parquet write
    * is the data-proportional part of a commit — minutes for a real
    * shard, hours for a compaction — and the pre-r15 shape held the
    * index's single write token for all of it, so concurrent shard
    * producers serialized on data-write duration and the loser re-paid
    * its ENTIRE write (the ingest-concurrency ceiling). Now each
    * writer stages under its own per-batch STAGING lease
    * ([[stageLeasePath]] — claimed atomically, heartbeat-renewed, so
    * [[repair]] can tell a live stage from a torn one) and the index
    * lease covers only the MOVE PHASE: repair + renames + marker +
    * fold — metadata RPCs, independent of data volume. Two producers
    * appending different batches overlap their writes fully and
    * serialize only on the cheap move; the same-bid race (a replayed
    * micro-batch fired twice concurrently) is caught by the staging
    * lease claim itself.
    *
    * `requireCurrentOf`: the generation ROOT this mutation resolved
    * `dir` from, when root-addressed — re-validated under the lease
    * ([[requireCurrent]]; [[GenerationSupersededException]]).
    * `leaseWaitMs` > 0 opts a BATCH caller into the polling acquire
    * for the move phase (the [[awaitingLease]] posture, now cheap
    * enough for batch writers because only the move waits): a shard
    * producer racing a publisher's catch-up window retries the move
    * instead of failing the job and re-paying the staged write. 0
    * keeps the fail-fast contract — unless the session conf
    * `spark.graft.commit.leaseWaitMs` is set, the opt-in for callers
    * reaching commitBatch through the index APIs
    * (`updateIndexInPlace`/`appendInPlace`) whose signatures don't
    * thread a wait. */
  def commitBatch(spark: SparkSession, dir: String, bid: String,
                  tables: Seq[(String, DataFrame, Seq[String])],
                  requireCurrentOf: Option[String] = None,
                  leaseWaitMs: Long = 0L): Boolean = {
    requireValidBid(bid)
    if (isCommitted(spark, dir, bid)) return false
    val fs = fsOf(spark, new Path(dir))
    val stage = new Path(stagingDir(dir), bid)
    // claim the stage FIRST: the lease file (atomic create-no-
    // overwrite) is what stops a concurrent repair from sweeping the
    // half-written stage, and what makes a concurrent same-bid commit
    // fail loud instead of interleaving staged files
    val stageTok = claimLeaseFile(fs, stageLeasePath(stage), LeaseMs,
      s"staging of batch $bid under $dir")
    val stageHb = startHeartbeatAt(fs, stageLeasePath(stage), stageTok, LeaseMs)
    var moveStarted = false
    var completed = false
    try {
      for ((table, df, parts) <- tables) {
        val w = df.write.mode("overwrite")
        (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
          .parquet(new Path(stage, table).toString)
      }
      // the index lease covers ONLY the move phase from here
      def moveBody(): Boolean = {
        requireCurrentOf.foreach(requireCurrent(spark, _, dir))
        if (isCommitted(spark, dir, bid)) false // re-check under the lease
        else {
          repair(spark, dir) // dead stages roll back; live ones (incl. ours) skip
          // a torn earlier attempt of THIS bid left files repair cannot
          // attribute (its stage is ours now, live, skipped) — roll
          // them back before moving the fresh ones, or the marker would
          // commit both attempts' files
          rollbackLiveFiles(fs, dir, bid)
          moveStarted = true
          renameAll(fs, tables.flatMap { case (table, _, _) => movePairs(fs, dir, bid, stage, table) })
          val c = commitsDir(dir)
          fs.mkdirs(c)
          fs.create(new Path(c, bid), true).close() // the one atomic commit point
          maybeAutoFold(spark, dir) // still under the lease
          true
        }
      }
      val waitMs =
        if (leaseWaitMs > 0L) leaseWaitMs
        else spark.conf.getOption("spark.graft.commit.leaseWaitMs").map(_.toLong).getOrElse(0L)
      val landed =
        if (waitMs > 0L) withLeaseAwait(spark, dir, waitMs)(moveBody())
        else withLease(spark, dir)(moveBody())
      completed = true
      landed
    } finally {
      try stageHb.close() catch { case _: Throwable => () }
      try {
        if (completed || !moveStarted) {
          // committed (cleanup), lost a same-bid race (redundant), or
          // failed before any rename (nothing live to roll back): the
          // whole stage goes
          fs.delete(stage, true)
        } else {
          // failed MID-MOVE: some files are live-but-unmarked — the
          // stage dir must SURVIVE so repair() can roll them back, but
          // it must read as DEAD now, not after the lease expires:
          // delete only the stage lease
          fs.delete(stageLeasePath(stage), false)
        }
        ()
      } catch { case _: java.io.IOException => () } // expiry + repair is the backstop
    }
  }

  /** Fold AUTOMATICALLY every [[AutoFoldEvery]]-th commit on a
    * directory (the Delta-checkpoint cadence) — at streaming cadence
    * nobody should have to remember a maintenance op to keep
    * `_commits` bounded. The counter is PERSISTED protocol state
    * (`_commits/_fold_count`, written under the commit's already-held
    * lease): the realistic production cadence is one shard append per
    * short-lived JVM, hourly for months, and an in-process counter
    * never reaches the threshold there — `_commits` would grow
    * unbounded, the exact failure the auto-fold exists to prevent. A
    * read + a small create per commit, against a commit that already
    * pays tens of namespace RPCs.
    *
    * The fold itself is best-effort AT THIS CALL SITE: by the time it
    * runs, the batch's marker has landed — the commit succeeded — so a
    * fold failure (transient FS error, the fail-loud base read) must
    * not surface as a failed commit to a streaming caller that would
    * then abort and replay. It is logged, the persisted counter stays
    * ≥ the threshold, and the NEXT commit (or a manual
    * [[checkpointCommits]]) retries. */
  private[graft] val AutoFoldEvery = 32
  private def foldCountPath(dir: String) = new Path(commitsDir(dir), "_fold_count")

  private def readFoldCount(fs: FileSystem, dir: String): Long =
    try {
      val in = fs.open(foldCountPath(dir))
      val s = try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        finally in.close()
      s.toLong
    } catch { case _: Exception => 0L } // absent/unreadable: re-earn the cadence

  private def writeFoldCount(fs: FileSystem, dir: String, n: Long): Unit = {
    val out = fs.create(foldCountPath(dir), true)
    out.write(n.toString.getBytes("UTF-8"))
    out.close()
  }

  private def maybeAutoFold(spark: SparkSession, dir: String): Unit = {
    val fs = fsOf(spark, commitsDir(dir))
    val n = readFoldCount(fs, dir) + 1
    writeFoldCount(fs, dir, n) // BEFORE the fold: a thrown fold keeps the cadence armed
    if (n >= AutoFoldEvery) {
      try checkpointCommitsLocked(spark, dir) // resets the count on success
      catch {
        case scala.util.control.NonFatal(e) =>
          Console.err.println(
            s"graft: auto-fold failed on $dir (commit unaffected; the next commit retries): $e")
      }
    }
  }

  /** Replace a table's contents wholesale (the geometry-refresh
    * primitive): stage the new rows, DELETE the live files, move the
    * staged files in, commit. NOT atomic end-to-end — callers must be
    * tables whose partial states are one-sided safe (cell radii: any
    * crash leaves a subset of old ∪ new rows per cell, and readers
    * treat a missing radius as π — correct, just unpruned).
    *
    * Staging stays INSIDE the lease here, unlike [[commitBatch]]: the
    * contract restricts this op to dim-table-sized payloads (radii),
    * so the write adds milliseconds to the hold — and the delete-then-
    * move sequence must not interleave with another writer anyway.
    * `requireCurrentOf`: same root re-validation as [[commitBatch]] —
    * a root-addressed refresh racing a generation swap must throw and
    * retry ([[mutateCurrent]]) instead of committing into the
    * superseded directory and being silently lost at cutover. */
  def replaceTable(spark: SparkSession, dir: String, bid: String,
                   table: String, df: DataFrame,
                   requireCurrentOf: Option[String] = None): Boolean = {
    requireValidBid(bid)
    if (isCommitted(spark, dir, bid)) return false
    withLease(spark, dir) {
      requireCurrentOf.foreach(requireCurrent(spark, _, dir))
      if (isCommitted(spark, dir, bid)) false
      else {
        repair(spark, dir)
        val fs = fsOf(spark, new Path(dir))
        val stage = new Path(stagingDir(dir), bid)
        df.write.mode("overwrite").parquet(new Path(stage, table).toString)
        val dst = new Path(dir, table)
        for (f <- listFilesRec(fs, dst)) fs.delete(f.getPath, false)
        renameAll(fs, movePairs(fs, dir, bid, stage, table))
        val c = commitsDir(dir)
        fs.mkdirs(c)
        fs.create(new Path(c, bid), true).close()
        fs.delete(stage, true)
        // replaceTable commits a marker per call like commitBatch does —
        // a geometry-refresh-heavy maintenance cadence must feed the
        // same fold cadence or `_commits` grows unbounded between
        // manual folds (still under the lease)
        maybeAutoFold(spark, dir)
        true
      }
    }
  }

  /** True iff the table dir holds at least one DATA file — early-exit
    * iteration, never a full listing: a corpus-sized table holds 10³–
    * 10⁵ files and materializing LocatedFileStatus for all of them
    * costs ~1.3 ms/file even on local FS (measured, dev/V8Probe — the
    * full-list form priced every band-table open at seconds; on a
    * namenode it would be worse). The iterator usually terminates on
    * its first element. */
  private def hasDataFile(fs: FileSystem, p: Path): Boolean = {
    if (!fs.exists(p)) return false
    def rec(q: Path): Boolean = fs.listStatus(q).exists { s =>
      if (s.isDirectory) rec(s.getPath)
      else {
        val nm = s.getPath.getName
        !nm.startsWith("_") && !nm.startsWith(".")
      }
    }
    rec(p)
  }

  /** Read a table if its directory exists AND holds at least one data
    * file (an all-deleted [[replaceTable]] crash window leaves an
    * empty dir parquet cannot infer a schema from). */
  def readTableIfExists(spark: SparkSession, dir: String, table: String): Option[DataFrame] = {
    val p = new Path(dir, table)
    val fs = fsOf(spark, p)
    if (hasDataFile(fs, p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** SNAPSHOT-ISOLATED read of a table: only data files whose batch id
    * is COMMITTED are visible. The listing the protocol already pays
    * for readability doubles as a manifest — every data file is named
    * `b_<bid>__…` and `_commits` lists the sealed bids, so filtering
    * the file list to committed bids yields a consistent cross-table
    * view with NO serialization against a writer: an in-flight batch's
    * moved files are invisible until its marker lands (one atomic
    * create), and this path never runs [[repair]], so it can never
    * roll back a live writer's batch (the two hazards of the plain
    * read path). Un-prefixed files (data from outside the protocol)
    * are treated as always-visible base data. Partition directories
    * (`cell=…`, `bp=…`) are recovered via `basePath`, so partition
    * pruning on the returned frame works exactly as on a plain read.
    *
    * Not covered: [[replaceTable]] deletes the old files before the
    * new batch commits — by contract it is only used for tables whose
    * partial states are one-sided safe (cell radii; readers π-default
    * a missing row), so a snapshot reader racing it sees a correct,
    * merely less-pruned view. */
  def snapshotTable(spark: SparkSession, snap: Snapshot, table: String): Option[DataFrame] = {
    val t = new Path(snap.dir, table)
    val fs = fsOf(spark, t)
    if (!fs.exists(t)) return None
    val files = listFilesRec(fs, t).map(_.getPath).filter { p =>
      val nm = p.getName
      if (nm.startsWith("_") || nm.startsWith(".")) false
      else if (nm.startsWith("b_")) {
        val i = nm.indexOf("__")
        i > 2 && snap.bids.contains(nm.substring(2, i))
      } else true // legacy non-protocol data: always visible
    }
    if (files.isEmpty) None
    else Some(spark.read.option("basePath", fs.makeQualified(t).toString)
      .parquet(files.map(_.toString): _*))
  }

  /** Single-table snapshot read with a fresh pin — only for reads that
    * genuinely touch ONE table; a multi-table read must [[openSnapshot]]
    * once and pass the handle, or commits landing between its table
    * opens tear the cross-table view (see [[Snapshot]]). */
  def snapshotTable(spark: SparkSession, dir: String, table: String): Option[DataFrame] =
    snapshotTable(spark, openSnapshot(spark, dir), table)

  /** [[readTableIfExists]] (plain) or [[snapshotTable]] under the
    * caller's pinned handle, by posture. */
  def readTable(spark: SparkSession, dir: String, table: String,
                snap: Option[Snapshot]): Option[DataFrame] =
    snap match {
      case Some(s) => snapshotTable(spark, s, table)
      case None    => readTableIfExists(spark, dir, table)
    }

  /** The tombstone table, if any deletions were recorded. */
  def tombstones(spark: SparkSession, dir: String, keyCol: String,
                 snap: Option[Snapshot] = None): Option[DataFrame] =
    readTable(spark, dir, "tombstones.parquet", snap)
      .map(_.select(col(keyCol)).distinct())

  /** A stored table with tombstones applied (anti-join by key — AQE
    * broadcasts small deletion lists; partition filters stacked on top
    * still push to the scan). */
  def liveTable(spark: SparkSession, dir: String, df: DataFrame, keyCol: String,
                snap: Option[Snapshot] = None): DataFrame =
    tombstones(spark, dir, keyCol, snap).fold(df)(t => df.join(t, Seq(keyCol), "left_anti"))

  /** Enforce the "a tombstoned id must never be re-appended before a
    * compact" contract — violated, the stale tombstone would silently
    * suppress the new row from every search with no error. One
    * semi-join count against the tombstone table (no broadcast hint —
    * deletion lists can be corpus-scale, the [[liveTable]] rule; AQE
    * broadcasts small ones); a no-op when no tombstones exist. */
  def assertNotTombstoned(spark: SparkSession, dir: String, ids: DataFrame, keyCol: String): Unit =
    tombstones(spark, dir, keyCol).foreach { t =>
      val clash = ids.select(col(keyCol)).join(t, Seq(keyCol), "left_semi").limit(1).count()
      require(clash == 0L,
        s"append re-uses tombstoned ids (index $dir): compact the index first, " +
          "or the stale tombstone would silently suppress the re-appended rows")
    }

  /** Persist small build parameters (banding config, shingle size …)
    * the index's probe side must agree with — a probe banding with a
    * different parameter than the build silently loses candidates. */
  def writeMeta(spark: SparkSession, dir: String, kv: Map[String, String]): Unit = {
    val p = new Path(s"$dir/_meta.properties")
    val fs = fsOf(spark, p)
    val out = fs.create(p, true)
    out.write(kv.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("\n").getBytes("UTF-8"))
    out.close()
  }

  def readMeta(spark: SparkSession, dir: String): Map[String, String] = {
    val p = new Path(s"$dir/_meta.properties")
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    new String(bytes, "UTF-8").split("\n").iterator
      .map(_.trim).filter(_.nonEmpty)
      .map { l => val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1) }
      .toMap
  }

  /** One [[fsck]] finding: `kind` is a stable machine-checkable tag,
    * `detail` names the offending path/bid/count. */
  final case class FsckFinding(kind: String, detail: String)

  /** OFFLINE invariant check of one index directory — the tool an
    * operator runs before trusting an index after an incident (a
    * repair gone wrong, a manual copy, a filesystem restore). Pure
    * namespace inspection (no table contents read; the index-level
    * row-parity checks live with each index):
    *
    *  - `orphan-file`: a live `b_<bid>__` data file whose bid is
    *    neither committed nor staged — unreachable by [[repair]]
    *    (repair keys off staging dirs) yet VISIBLE to plain reads;
    *    the one state that silently corrupts a non-snapshot reader.
    *  - `live-stage`: a staged batch whose staging lease is LIVE — a
    *    writer is staging it right now, outside the index lease (the
    *    r15 commit shape); normal operation, listed for forensics.
    *  - `torn-batch`: a DEAD staged batch without a marker (repairable
    *    — [[repair]] rolls it back; listed so the operator knows a
    *    writer died).
    *  - `unfinished-clean`: a staged batch WITH its marker (repair
    *    finishes the cleanup; benign).
    *  - `stale-lease`: an expired writer lease (crashed writer; the
    *    next writer steals it — benign, listed for forensics).
    *  - `unparseable-lease`: a lease file no writer can read — a
    *    contender would steal it after the bounded re-read; loud here.
    *  - `tmp-leftover`: a `_commits/_tmp.*` from a crashed fold
    *    (inert; swept by the next [[checkpointCommits]]).
    *
    * A FULL recursive listing of the index — an offline maintenance
    * scan by design (the read path never pays this; at 10⁵ files it
    * is one listing pass, the same cost as the compaction sizing). */
  def fsck(spark: SparkSession, dir: String): Seq[FsckFinding] = {
    val p = new Path(dir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return Seq.empty
    val out = Seq.newBuilder[FsckFinding]
    val committed = committedBids(spark, dir)
    val stagedStatus: Seq[org.apache.hadoop.fs.FileStatus] = {
      val st = stagingDir(dir)
      if (!fs.exists(st)) Seq.empty
      else fs.listStatus(st).toSeq
    }
    val staged: Set[String] = stagedStatus.map(_.getPath.getName).toSet
    for (t <- fs.listStatus(p)
         if t.isDirectory && !t.getPath.getName.startsWith("_")) {
      for (f <- listFilesRec(fs, t.getPath)) {
        val nm = f.getPath.getName
        if (nm.startsWith("b_")) {
          val i = nm.indexOf("__")
          if (i > 2) {
            val bid = nm.substring(2, i)
            if (!committed.contains(bid) && !staged.contains(bid))
              out += FsckFinding("orphan-file", f.getPath.toString)
          }
        }
      }
    }
    for (s <- stagedStatus) {
      val bid = s.getPath.getName
      out += (if (s.isDirectory && stageIsLive(fs, s.getPath))
        // a writer is staging this batch RIGHT NOW, outside the index
        // lease (the r15 commit shape) — normal operation, listed for
        // forensics only; repair skips it
        FsckFinding("live-stage", bid)
      else try {
        requireValidBid(bid)
        FsckFinding(if (committed.contains(bid)) "unfinished-clean" else "torn-batch", bid)
      } catch {
        // a staging entry no commit ever accepted (restore damage or a
        // foreign writer) — repair deletes it without a live rollback
        case _: IllegalArgumentException => FsckFinding("invalid-bid", bid)
      })
    }
    val lp = leasePath(dir)
    if (fs.exists(lp)) readLease(fs, lp) match {
      case Some((tok, exp)) if exp < System.currentTimeMillis() =>
        out += FsckFinding("stale-lease", s"owner ${tok.take(8)}… expired ${exp}")
      case None => out += FsckFinding("unparseable-lease", lp.toString)
      case _    => () // live lease: a writer is (legitimately) active
    }
    val c = commitsDir(dir)
    if (fs.exists(c))
      for (s <- fs.listStatus(c) if s.getPath.getName.startsWith("_tmp."))
        out += FsckFinding("tmp-leftover", s.getPath.toString)
    out.result()
  }

  /** [[fsck]] (plus [[rootFindings]] when `dirOrRoot` carries a
    * generation pointer) with the documented remedy APPLIED per
    * finding kind — the incident loop the diagnostic opened, closed:
    *
    *  - `orphan-file` → QUARANTINED (moved under `_quarantine/`, never
    *    deleted — the file may be the only copy of rows an operator
    *    wants back; quarantining removes it from every reader's view,
    *    which is the correctness fix);
    *  - `torn-batch` / `unfinished-clean` / `invalid-bid` → [[repair]]
    *    (rollback / finish cleanup / sweep — the existing remedies);
    *  - `tmp-leftover` / `pointer-tmp` → swept (inert temps);
    *  - `stale-lease` → resolved by this tool's own lease acquire
    *    (the expired lease is stolen and released on exit);
    *  - `live-stage` → SKIPPED (a writer is staging it right now);
    *  - `unpublished-generation` → SKIPPED (age-gated by design —
    *    [[vacuumGenerations]] retires it after the grace window; a
    *    young one may be a publisher about to finish);
    *  - `dangling-pointer` → SKIPPED (republish-or-restore is an
    *    operator decision the tool must not guess).
    *
    * Runs under the writer lease — repairing an index under a LIVE
    * writer throws contention rather than racing it. Returns each
    * finding with the action taken; a second [[fsck]] after this call
    * reports only the skipped kinds. */
  def fsckRepair(spark: SparkSession, dirOrRoot: String): Seq[(FsckFinding, String)] = {
    val resolved = resolveDir(spark, dirOrRoot)
    val fs = fsOf(spark, new Path(resolved))
    // snapshot the lease state BEFORE acquiring: our own acquire is the
    // remedy for an expired lease (steal + release-on-exit), but it
    // happens before the in-lease fsck runs — without the pre-read the
    // report would silently lose the finding it fixed
    val preLease: Seq[FsckFinding] = {
      val lp = leasePath(resolved)
      if (!fs.exists(lp)) Seq.empty
      else readLease(fs, lp) match {
        case Some((tok, exp)) if exp < System.currentTimeMillis() =>
          Seq(FsckFinding("stale-lease", s"owner ${tok.take(8)}… expired $exp"))
        case _ => Seq.empty
      }
    }
    withLease(spark, resolved) {
      val findings = preLease ++ rootFindings(spark, dirOrRoot) ++ fsck(spark, resolved)
      lazy val quarantine = new Path(new Path(resolved),
        s"_quarantine/q${java.util.UUID.randomUUID().toString.replace("-", "").take(8)}")
      var repaired = false
      findings.map { f =>
        f -> (f.kind match {
          case "orphan-file" =>
            val src = new Path(f.detail)
            if (!fs.exists(src)) "already gone"
            else {
              fs.mkdirs(quarantine)
              val dst = new Path(quarantine, src.getName)
              if (fs.rename(src, dst)) s"quarantined to $dst"
              else "quarantine rename FAILED — file left in place"
            }
          case "torn-batch" | "unfinished-clean" | "invalid-bid" =>
            if (!repaired) { repair(spark, resolved); repaired = true }
            "repaired (rolled back / cleaned / swept)"
          case "tmp-leftover" =>
            fs.delete(new Path(f.detail), false); "swept"
          case "pointer-tmp" =>
            fs.delete(new Path(new Path(dirOrRoot), f.detail), false); "swept"
          case "stale-lease" =>
            "resolved (stolen by this repair's own lease acquire, released on exit)"
          case "live-stage" =>
            "skipped (a writer is staging this batch right now)"
          case "unpublished-generation" =>
            "skipped (age-gated: vacuumGenerations retires it after the grace window)"
          case "dangling-pointer" =>
            "skipped (operator decision: republish the generation or restore the pointer)"
          case _ => "skipped (no automatic remedy)"
        })
      }
    }
  }

  /** Size-targeted output partitioning for a compaction rewrite:
    * enough partitions to keep files near `targetBytes`, floored at
    * the cluster's parallelism so the rewrite is never a single task
    * (a corpus-sized table funneled through one writer cannot complete
    * at 100 TB). Input bytes are the table's current on-disk size — an
    * upper bound on the live rows, which only over-splits, never
    * bottlenecks. */
  def compactionPartitions(spark: SparkSession, dir: String, table: String,
                           targetBytes: Long = 128L << 20): Int = {
    val p = new Path(dir, table)
    val fs = fsOf(spark, p)
    val bytes = listFilesRec(fs, p).map(_.getLen).sum
    math.max(spark.sparkContext.defaultParallelism,
      math.ceil(bytes.toDouble / targetBytes).toInt)
  }

  /** On-disk bytes per partition VALUE of a Hive-layout table — read
    * from the directory listing a compaction already pays, zero data
    * passes. Keys are the `key=` directory values as written. */
  private def partitionBytes(fs: FileSystem, dir: String, table: String,
                             key: String): Map[String, Long] = {
    val p = new Path(dir, table)
    if (!fs.exists(p)) return Map.empty
    fs.listStatus(p).iterator
      .filter(d => d.isDirectory && d.getPath.getName.startsWith(key + "="))
      .map(d => d.getPath.getName.stripPrefix(key + "=") ->
        listFilesRec(fs, d.getPath).map(_.getLen).sum)
      .toMap
  }

  /** Size-targeted rewrite parallelism WITHIN partition values, for
    * compacting a PARTITIONED table — SINGLE-PASS: each key's salt
    * width is derived from its on-disk byte share (the listing above,
    * driver-side), salt = hash(tiebreaks) mod width, then one hash
    * repartition on (key, salt) and the usual `partitionBy(key)`
    * write. A HOT key — a skewed semantic cluster in `cell`, a heavy
    * band bucket in `bp` — gets a proportionally wide salt: multiple
    * write tasks and multiple ~target-sized files under its partition
    * directory; total files ≈ Σ widths ≈ table bytes / target;
    * directory-level pruning untouched. On-disk bytes include
    * tombstoned rows the rewrite drops — an upper bound, which only
    * over-splits, never funnels.
    *
    * Why not `repartitionByRange`: the range partitioner's SAMPLING
    * job executes the child plan a second time, and a compaction's
    * child is the corpus-sized table behind a tombstone anti-join —
    * a 2× read at 100 TB. The salt widths come from metadata the
    * fold already lists, so the data is read exactly once. A table
    * with no partition directories (nothing staged under `key=`)
    * falls back to the range form — without stats the salt cannot
    * size itself, and a sampling pass on an unknown layout beats a
    * single-task funnel.
    *
    * The pre-r14 shape — `repartition(col(key))` — bounded the
    * rewrite at ONE task and one file per key value regardless of
    * cluster size: with 64 band partitions, a corpus-sized table
    * funneled through ≤64 writers forever; one hot cell serialized
    * the fold — the `coalesce(1)` failure class surviving on the
    * partitioned tables. */
  def sizedKeyedRepartition(spark: SparkSession, dir: String, table: String,
                            df: DataFrame, key: String, tiebreaks: String*): DataFrame = {
    val fs = fsOf(spark, new Path(dir, table))
    val bytes = partitionBytes(fs, dir, table, key)
    val n = compactionPartitions(spark, dir, table)
    if (bytes.isEmpty || bytes.values.sum == 0L)
      return df.repartitionByRange(n, (key +: tiebreaks).map(col): _*)
    val total = bytes.values.sum.toDouble
    // proportional widths floored at 1: at test scale the cluster
    // parallelism dominates n and a 90%-share key gets ~0.9·n salts;
    // at 100 TB the bytes/target term dominates and width_k ≈
    // ceil(bytes_k / targetBytes)
    val widths = bytes.map { case (k, b) =>
      k -> math.max(1, math.ceil(b / total * n).toInt)
    }
    // widths as a BROADCAST-joined dim frame, not a literal map() over
    // every key value: the literal form built one expression-node pair
    // per partition value, which at a production nlist of 30k–100k
    // cells is a 100k+-node expression tree per compaction — analysis
    // cost and codegen-size risk on exactly the 100× path this
    // operator exists for. The widths frame is one driver-side row per
    // partition value and the join stays map-side (broadcast), so the
    // salt is still computed in the scan stage with no extra shuffle.
    import spark.implicits._
    val widthsDf = broadcast(
      widths.toSeq.map { case (k, w) => (k, w.toLong) }.toDF("__graft_wkey", "__graft_width"))
    df.join(widthsDf, col(key).cast("string") === col("__graft_wkey"), "left")
      .withColumn("__graft_salt",
        pmod(xxhash64(tiebreaks.map(col): _*), coalesce(col("__graft_width"), lit(1L))))
      .repartition(math.max(n, widths.values.sum), col(key), col("__graft_salt"))
      .drop("__graft_wkey", "__graft_width", "__graft_salt")
  }
}
