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
  * Single-writer discipline (one appender per index directory) is
  * assumed, as everywhere in the index family. Readers must not
  * overlap an IN-FLIGHT commit either: moved files become visible to
  * plain parquet reads before the marker seals the batch, so a read
  * racing the move phase can observe a cross-table torn prefix (and a
  * concurrent [[repair]] would roll the writer's live batch back).
  * Serialize reads behind the writer — the posture of every
  * non-transactional Hive-layout table; full MVCC would need
  * manifest-based file listing, which plain-parquet readers cannot
  * apply.
  */
object TableIndex {

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitsDir(dir: String) = new Path(s"$dir/_commits")
  private def stagingDir(dir: String) = new Path(s"$dir/_staging")
  private def prefix(bid: String) = s"b_${bid}__"

  /** A fresh batch id for a manual (non-stream) append. Stream callers
    * pass their own deterministic id (checkpoint-salted micro-batch
    * number) so a replayed batch resolves to the SAME id and is
    * skipped; manual ids only need uniqueness. */
  def newBatchId(tag: String = "a"): String =
    tag + java.util.UUID.randomUUID().toString.replace("-", "")

  def isCommitted(spark: SparkSession, dir: String, bid: String): Boolean = {
    val m = new Path(commitsDir(dir), bid)
    fsOf(spark, m).exists(m)
  }

  /** True iff the index at `dir` has at least one committed batch —
    * the build-memoization guard: a build that died partway leaves
    * staged or torn files but no marker, so the guard re-runs it
    * (the pre-r12 guards keyed on the FIRST-written table and could
    * skip a rebuild over a half-written index). */
  def anyCommitted(spark: SparkSession, dir: String): Boolean = {
    val c = commitsDir(dir)
    val fs = fsOf(spark, c)
    fs.exists(c) && fs.listStatus(c).nonEmpty
  }

  /** Delete `dir` entirely — build-time overwrite semantics (a fresh
    * build must not inherit torn files it cannot attribute to a batch). */
  def wipe(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = fsOf(spark, p)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  private def listFilesRec(fs: FileSystem, p: Path): Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
    if (!fs.exists(p)) return Seq.empty
    val out = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
    val it = fs.listFiles(p, true)
    while (it.hasNext) out += it.next()
    out.result()
  }

  /** Restore "live dirs == committed batches": finish the cleanup of
    * committed batches, roll back torn ones. Idempotent; cheap when
    * `_staging` is absent. */
  def repair(spark: SparkSession, dir: String): Unit = {
    val st = stagingDir(dir)
    val fs = fsOf(spark, st)
    if (!fs.exists(st)) return
    for (s <- fs.listStatus(st)) {
      val bid = s.getPath.getName
      if (!isCommitted(spark, dir, bid)) {
        // torn batch: every moved file carries the bid in its name —
        // delete them wherever they landed, then the staged rows
        val p = prefix(bid)
        for (t <- fs.listStatus(new Path(dir))
             if t.isDirectory && !t.getPath.getName.startsWith("_")) {
          for (f <- listFilesRec(fs, t.getPath) if f.getPath.getName.startsWith(p))
            fs.delete(f.getPath, false)
        }
      }
      fs.delete(s.getPath, true)
    }
    fs.delete(st, true)
    ()
  }

  /** Atomically commit one batch of rows across several tables.
    * `tables`: (tableName, rows, partitionColumns). Returns false (and
    * writes nothing) when `bid` is already committed — the replayed-
    * micro-batch case. Data files are only ever ADDED to the live
    * dirs; existing files are untouched (the O(shard) in-place-append
    * contract). */
  def commitBatch(spark: SparkSession, dir: String, bid: String,
                  tables: Seq[(String, DataFrame, Seq[String])]): Boolean = {
    if (isCommitted(spark, dir, bid)) return false
    repair(spark, dir) // roll back a torn earlier attempt of this (or any) batch
    val fs = fsOf(spark, new Path(dir))
    val stage = new Path(stagingDir(dir), bid)
    for ((table, df, parts) <- tables) {
      val w = df.write.mode("overwrite")
      (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
        .parquet(new Path(stage, table).toString)
    }
    for ((table, _, _) <- tables) {
      val src = fs.makeQualified(new Path(stage, table))
      val dst = new Path(dir, table)
      for (f <- listFilesRec(fs, src)
           if !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith(".")) {
        val rel = f.getPath.toString.stripPrefix(src.toString).stripPrefix("/")
        val relParent = rel.lastIndexOf('/') match {
          case -1 => ""
          case i  => rel.substring(0, i)
        }
        val destDir = if (relParent.isEmpty) dst else new Path(dst, relParent)
        fs.mkdirs(destDir)
        fs.rename(f.getPath, new Path(destDir, prefix(bid) + f.getPath.getName))
      }
    }
    val c = commitsDir(dir)
    fs.mkdirs(c)
    fs.create(new Path(c, bid), true).close() // the one atomic commit point
    fs.delete(stage, true)
    true
  }

  /** Replace a table's contents wholesale (the geometry-refresh
    * primitive): stage the new rows, DELETE the live files, move the
    * staged files in, commit. NOT atomic end-to-end — callers must be
    * tables whose partial states are one-sided safe (cell radii: any
    * crash leaves a subset of old ∪ new rows per cell, and readers
    * treat a missing radius as π — correct, just unpruned). */
  def replaceTable(spark: SparkSession, dir: String, bid: String,
                   table: String, df: DataFrame): Boolean = {
    if (isCommitted(spark, dir, bid)) return false
    repair(spark, dir)
    val fs = fsOf(spark, new Path(dir))
    val stage = new Path(stagingDir(dir), bid)
    df.write.mode("overwrite").parquet(new Path(stage, table).toString)
    val dst = new Path(dir, table)
    for (f <- listFilesRec(fs, dst)) fs.delete(f.getPath, false)
    for (f <- listFilesRec(fs, new Path(stage, table))
         if !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith(".")) {
      fs.mkdirs(dst)
      fs.rename(f.getPath, new Path(dst, prefix(bid) + f.getPath.getName))
    }
    val c = commitsDir(dir)
    fs.mkdirs(c)
    fs.create(new Path(c, bid), true).close()
    fs.delete(stage, true)
    true
  }

  /** Read a table if its directory exists AND holds at least one data
    * file (an all-deleted [[replaceTable]] crash window leaves an
    * empty dir parquet cannot infer a schema from). */
  def readTableIfExists(spark: SparkSession, dir: String, table: String): Option[DataFrame] = {
    val p = new Path(dir, table)
    val fs = fsOf(spark, p)
    if (fs.exists(p) && listFilesRec(fs, p).exists(f =>
        !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith(".")))
      Some(spark.read.parquet(p.toString))
    else None
  }

  /** The tombstone table, if any deletions were recorded. */
  def tombstones(spark: SparkSession, dir: String, keyCol: String): Option[DataFrame] =
    readTableIfExists(spark, dir, "tombstones.parquet")
      .map(_.select(col(keyCol)).distinct())

  /** A stored table with tombstones applied (anti-join by key — AQE
    * broadcasts small deletion lists; partition filters stacked on top
    * still push to the scan). */
  def liveTable(spark: SparkSession, dir: String, df: DataFrame, keyCol: String): DataFrame =
    tombstones(spark, dir, keyCol).fold(df)(t => df.join(t, Seq(keyCol), "left_anti"))

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
}
