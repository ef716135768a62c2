package graft.dev

import graft.text.IncrementalDedup
import graft.util.TableIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what the TableIndex commit protocol costs on top of the
  * writes it wraps: per-append wall (stage + move + marker for the
  * four dedup-index tables), files moved per batch, and the read-side
  * repair() tax (one FS existence check when nothing is staged) —
  * the numbers behind SCALE.md's "fast path costs one existence
  * check" claim. */
object ProtocolProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .appName("protocol-probe")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val gen1 = d.filter(pmod(col("doc_id"), lit(5)) === 0)
    val idx = graft.util.TempDirs.scratch("protocol_probe").toString
    IncrementalDedup.buildIndex(gen1, "doc_id", "text", idx)
    def files(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(idx)).count(_.getName.endsWith(".parquet"))
    }
    var prev = files()
    for (k <- 1 to 4) {
      val shard = d.filter(pmod(col("doc_id"), lit(5)) === k)
      val t0 = System.nanoTime()
      IncrementalDedup.updateIndexInPlace(spark, idx, shard, "doc_id", "text",
        batchId = Some(f"probe_$k%02d"))
      val wall = (System.nanoTime() - t0) / 1e6
      val now = files()
      println(f"append $k: wall=$wall%8.1f ms  filesMoved=${now - prev}%4d")
      prev = now
    }
    // read-side tax: repair() with nothing staged, amortized
    val reps = 2000
    val t0 = System.nanoTime()
    var i = 0
    while (i < reps) { TableIndex.repair(spark, idx); i += 1 }
    println(f"repair (no-op): ${(System.nanoTime() - t0) / 1e3 / reps}%8.1f us/call over $reps calls")

    // writer-lease tax (r13): acquire + heartbeat start/stop + release
    // per protocol mutation — the price of the fail-fast
    {
      val reps2 = 200
      val ld = graft.util.TempDirs.scratch("protocol_probe_lease").toString
      val t1 = System.nanoTime()
      var j = 0
      while (j < reps2) {
        val tok = TableIndex.acquireLease(spark, ld)
        val hb = TableIndex.startLeaseHeartbeat(spark, ld, tok)
        hb.close()
        TableIndex.releaseLease(spark, ld, tok)
        j += 1
      }
      println(f"lease acquire+hb+release: ${(System.nanoTime() - t1) / 1e3 / reps2}%8.1f us/mutation over $reps2 cycles")
    }

    // MOVE-PHASE scaling (r13): a bulk build or compaction of a 100 TB
    // index moves 10^4-10^5 staged files; the per-append numbers above
    // are 10-100 files. Plant N tiny staged files, time the checked
    // rename wave serial vs pooled — if the sequential driver loop
    // dominates at bulk shape, the pool is the fix (renames are
    // namespace RPCs; nothing else about the protocol changes).
    val base = graft.util.TempDirs.scratch("protocol_probe_bulk").toString
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (n <- Seq(1000, 10000); threads <- Seq(1, 16)) {
      val dir = s"$base/n${n}_t$threads"
      val stageDir = new java.io.File(s"$dir/_staging/bulk/t")
      stageDir.mkdirs()
      val pairs = (0 until n).map { j =>
        val f = new java.io.File(stageDir, f"part-$j%05d.parquet")
        java.nio.file.Files.write(f.toPath, Array[Byte](80, 65, 82, 49))
        (new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          new org.apache.hadoop.fs.Path(s"$dir/t/b_bulk__part-$j%05d.parquet"))
      }
      val m0 = System.nanoTime()
      TableIndex.renameAll(fs, pairs, threads = threads)
      val ms = (System.nanoTime() - m0) / 1e6
      println(f"move phase: n=$n%6d threads=$threads%2d  wall=$ms%8.1f ms  (${ms * 1000 / n}%6.1f us/file)")
    }

    // MARKER-FOLD benefit (r13): every open (snapshot pin, replay
    // check, memoization guard) lists _commits; at streaming cadence
    // that directory holds 10^4+ one-per-batch markers. Plant N
    // markers, time committedBids before and after checkpointCommits.
    {
      val md = graft.util.TempDirs.scratch("protocol_probe_markers").toString
      val cdir = new java.io.File(s"$md/_commits"); cdir.mkdirs()
      val n = 20000
      for (j <- 0 until n)
        new java.io.File(cdir, f"s0123456789abcdef_$j%010d").createNewFile()
      def timeBids(reps: Int): Double = {
        val t = System.nanoTime()
        var j = 0
        var sz = 0
        while (j < reps) { sz = TableIndex.committedBids(spark, md).size; j += 1 }
        require(sz == n, s"bid set lost entries: $sz != $n")
        (System.nanoTime() - t) / 1e6 / reps
      }
      // the write path's replay pre-check: an isCommitted MISS (a new
      // batch id) — pre-fold it must stay at two exists() calls (the
      // _folded sentinel's absence is authoritative), never the full
      // listing; post-fold it pays the tiny listing + cached base
      def timeMiss(reps: Int): Double = {
        val t = System.nanoTime()
        var j = 0
        while (j < reps) {
          require(!TableIndex.isCommitted(spark, md, f"s0000000000000000_$j%010d-x"))
          j += 1
        }
        (System.nanoTime() - t) / 1e3 / reps
      }
      val missBefore = timeMiss(200)
      val beforeMs = timeBids(20)
      val f0 = System.nanoTime()
      TableIndex.checkpointCommits(spark, md)
      val foldMs = (System.nanoTime() - f0) / 1e6
      val afterMs = timeBids(20)
      val missAfter = timeMiss(200)
      println(f"marker fold: n=$n  committedBids before=$beforeMs%8.2f ms  " +
        f"fold=$foldMs%8.1f ms  after=$afterMs%8.2f ms/open  " +
        f"isCommitted-miss before=$missBefore%7.1f us  after=$missAfter%7.1f us")
    }
    spark.stop()
  }
}
