package graft

import graft.ml.{AnnSearch, IvfIndex}
import graft.text.IncrementalDedup
import graft.util.TableIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The `_generation` pointer publish primitive
  * ([[graft.util.TableIndex.publishGeneration]]): before r14 every
  * whole-index rewrite (compact/recluster/generation-copy) built a new
  * directory and left the CUTOVER to the operator — the one step of
  * the maintenance story a crash could leave ambiguous. These specs
  * pin the swap's contract:
  *  - a fresh open of the root follows the pointer (and entry points
  *    resolve it, so callers address the root forever);
  *  - a snapshot handle pinned BEFORE a swap keeps answering from its
  *    generation afterwards ((generation, bids) pins);
  *  - a crash between the new generation's commit and the pointer
  *    swap leaves the OLD generation authoritative;
  *  - publishing an uncommitted (torn) generation fails loud;
  *  - the current generation cannot be retired.
  */
class GenerationSpec extends SparkSpec {

  private def docsDf: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def embsDf = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), expr("transform(embedding, x -> cast(x as double))").as("vec"))

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("publish + resolveDir: a fresh open follows the pointer; one hop only") {
    val root = graft.util.TempDirs.scratch("gen_resolve").toString
    val d = docsDf.limit(50)
    IncrementalDedup.buildIndex(d, "doc_id", "text", s"$root/g0")
    // no pointer yet: the root resolves to itself
    assert(TableIndex.resolveDir(spark, root) == root)
    TableIndex.publishGeneration(spark, root, "g0")
    assert(TableIndex.resolveDir(spark, root) == s"$root/g0")
    // the generation dir itself resolves to itself (no nested hop)
    assert(TableIndex.resolveDir(spark, s"$root/g0") == s"$root/g0")
    // entry points accept the root: a probe addressed by root answers
    // from the current generation
    val probe = IncrementalDedup.processShard(spark, root, d.limit(5), "doc_id", "text", tau = 0.8)
    assert(probe.count() == 5)
  }

  test("publishing a generation with no committed batch fails loud") {
    val root = graft.util.TempDirs.scratch("gen_torn").toString
    new java.io.File(s"$root/gtorn").mkdirs()
    intercept[IllegalArgumentException] {
      TableIndex.publishGeneration(spark, root, "gtorn")
    }
    intercept[IllegalArgumentException] { // absent dir
      TableIndex.publishGeneration(spark, root, "gmissing")
    }
    intercept[IllegalArgumentException] { // not a plain child name
      TableIndex.publishGeneration(spark, root, "_sneaky")
    }
  }

  test("crash between the new generation's commit and the swap leaves the OLD authoritative") {
    val root = graft.util.TempDirs.scratch("gen_crash").toString
    val d = docsDf.limit(60)
    IncrementalDedup.buildIndex(d, "doc_id", "text", s"$root/g0")
    TableIndex.publishGeneration(spark, root, "g0")
    // a fully COMMITTED successor generation exists on disk — but the
    // publisher crashed before the pointer swap
    IncrementalDedup.compactIndex(spark, s"$root/g0", s"$root/g1")
    assert(TableIndex.anyCommitted(spark, s"$root/g1"),
      "test setup: the successor generation should be committed")
    assert(TableIndex.resolveDir(spark, root) == s"$root/g0",
      "an unpublished generation must not capture readers")
    // recovery is a plain re-publish — idempotent and atomic
    TableIndex.publishGeneration(spark, root, "g1")
    assert(TableIndex.resolveDir(spark, root) == s"$root/g1")
  }

  test("dedup compactPublish: root-addressed probes are swap-invisible; pinned handles survive") {
    val root = graft.util.TempDirs.scratch("gen_dedup_pub").toString
    val d = docsDf.limit(120)
    val shard = docsDf.limit(160).filter(pmod(col("doc_id"), lit(4)) === 0)
    IncrementalDedup.buildIndex(d, "doc_id", "text", s"$root/g0")
    TableIndex.publishGeneration(spark, root, "g0")
    IncrementalDedup.deleteInPlace(spark, root, d.limit(7).select(col("doc_id").as("id")))
    val before = rowsOf(
      IncrementalDedup.processShard(spark, root, shard, "doc_id", "text", tau = 0.8))
    // pin a snapshot handle THROUGH the root before the swap
    val pinned = TableIndex.openSnapshot(spark, root)
    assert(pinned.dir == s"$root/g0" && pinned.origin.contains(root),
      "a root-opened snapshot must record (generation, origin)")
    val g1 = IncrementalDedup.compactPublish(spark, root)
    assert(TableIndex.resolveDir(spark, root) == g1)
    // fresh probe through the root: answers from the NEW generation,
    // decisions unchanged (compaction folds tombstones, changes nothing
    // semantic)
    val after = rowsOf(
      IncrementalDedup.processShard(spark, root, shard, "doc_id", "text", tau = 0.8))
    assert(after == before, "the published compaction changed probe decisions")
    // the pre-swap handle still answers — from the OLD generation,
    // whose tombstone table is still visible through it
    val viaPin = rowsOf(IncrementalDedup.processShard(spark, root, shard, "doc_id", "text",
      tau = 0.8, at = Some(pinned)))
    assert(viaPin == before, "a pre-swap pinned handle diverged after the swap")
    assert(TableIndex.snapshotTable(spark, pinned, "tombstones.parquet").isDefined,
      "the pinned handle should still see the OLD generation's tombstone table")
    // the new generation carries no tombstones (folded)
    assert(TableIndex.readTableIfExists(spark, g1, "tombstones.parquet").isEmpty)
    // retirement: the CURRENT generation refuses; the superseded one goes
    intercept[IllegalArgumentException] {
      TableIndex.retireGeneration(spark, root, new java.io.File(g1).getName)
    }
    TableIndex.retireGeneration(spark, root, "g0")
    assert(!new java.io.File(s"$root/g0").exists())
    // root-addressed probes are unaffected by the retirement
    assert(rowsOf(IncrementalDedup.processShard(spark, root, shard, "doc_id", "text",
      tau = 0.8)) == before)
  }

  test("ivf compactPublish + reclusterPublish: search via root stays ≡ across swaps") {
    val all = embsDf.limit(300)
    val old = all.filter(pmod(col("id"), lit(7)) =!= 0)
    val queries = all.filter(pmod(col("id"), lit(50)) === 0)
    val centroids = AnnSearch.kmeansCentroidsExact(old, 15, iters = 2)
    val book = AnnSearch.pqBook(old, m = 32, stride = 10)
    val root = graft.util.TempDirs.scratch("gen_ivf_pub").toString
    IvfIndex.build(old, centroids, book, s"$root/g0", storeFloats = true)
    TableIndex.publishGeneration(spark, root, "g0")
    val before = rowsOf(IvfIndex.search(spark, root, queries, k = 5, nprobe = 15, shortlist = 40))
    val pinned = TableIndex.openSnapshot(spark, root)
    val g1 = IvfIndex.compactPublish(spark, root)
    assert(TableIndex.resolveDir(spark, root) == g1)
    assert(rowsOf(IvfIndex.search(spark, root, queries, k = 5, nprobe = 15, shortlist = 40))
      == before, "search through the root changed across a published compaction")
    assert(rowsOf(IvfIndex.search(spark, root, queries, k = 5, nprobe = 15, shortlist = 40,
      snapshot = true, at = Some(pinned))) == before,
      "a pre-swap pinned handle's search diverged after the swap")
    // recluster into a third generation: exactness is unconditional,
    // so root-addressed nearDups stay ≡ brute force regardless of the
    // retrained centroid placement
    // stride must be coprime with the %7 split (14 is not: every 14th
    // id is a multiple of 7 and absent from the live corpus)
    val g2 = IvfIndex.reclusterPublish(spark, root, all, stride = 15, iters = 1)
    assert(TableIndex.resolveDir(spark, root) == g2)
    val shard = all.filter(pmod(col("id"), lit(50)) === 0)
    val viaRoot = IvfIndex.nearDupsExact(spark, root, shard, tau = 0.9)
    val brute = old.select(col("id").as("n_id"), col("vec").as("n_vec"))
      .crossJoin(shard.select(col("id").as("q_id"), col("vec").as("q_vec")))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        try_divide(AnnSearch.dot(col("q_vec"), col("n_vec")),
          AnnSearch.norm(col("q_vec")) * AnnSearch.norm(col("n_vec"))).as("sim"))
      .filter(col("sim") >= 0.9)
      .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("sim"))
    assert(rowsOf(viaRoot) == rowsOf(brute),
      "root-addressed nearDupsExact diverged from brute force after recluster swap")
  }

  test("rootFindings: unpublished generations and dangling pointers are named; a clean root is silent") {
    val root = graft.util.TempDirs.scratch("gen_fsck_root").toString
    val d = docsDf.limit(40)
    IncrementalDedup.buildIndex(d, "doc_id", "text", s"$root/g0")
    TableIndex.publishGeneration(spark, root, "g0")
    assert(TableIndex.rootFindings(spark, root).isEmpty, "clean root flagged")
    // the crash-between-commit-and-swap artifact: a committed successor
    // generation the pointer does not name
    IncrementalDedup.compactIndex(spark, s"$root/g0", s"$root/g1")
    assert(TableIndex.rootFindings(spark, root) ==
      Seq(TableIndex.FsckFinding("unpublished-generation", "g1")))
    // the index-level fsck via the root prepends the pointer layer
    assert(IncrementalDedup.fsckIndex(spark, root)
      .exists(f => f.kind == "unpublished-generation" && f.detail == "g1"))
    TableIndex.publishGeneration(spark, root, "g1")
    // now g0 is the superseded generation awaiting retirement
    assert(TableIndex.rootFindings(spark, root).map(_.detail) == Seq("g0"))
    TableIndex.retireGeneration(spark, root, "g0")
    assert(TableIndex.rootFindings(spark, root).isEmpty)
    // manual damage: the pointed-at generation vanishes out-of-band
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmRf)
      f.delete(); ()
    }
    rmRf(new java.io.File(s"$root/g1"))
    assert(TableIndex.rootFindings(spark, root).exists(_.kind == "dangling-pointer"))
    // a plain (non-rooted) index directory yields no pointer findings
    val plain = graft.util.TempDirs.scratch("gen_fsck_plain").toString
    IncrementalDedup.buildIndex(d, "doc_id", "text", plain)
    assert(TableIndex.rootFindings(spark, plain).isEmpty)
  }

  test("reader pins: a pinned generation survives vacuum and refuses retirement; release frees it") {
    val root = graft.util.TempDirs.scratch("gen_pins").toString
    val d = docsDf.limit(80)
    val shard = d.filter(pmod(col("doc_id"), lit(4)) === 0)
    IncrementalDedup.buildIndex(d, "doc_id", "text", s"$root/g0")
    TableIndex.publishGeneration(spark, root, "g0")
    val before = rowsOf(
      IncrementalDedup.processShard(spark, root, shard, "doc_id", "text", tau = 0.8))
    // a session-length reader REGISTERS its pin before the swap
    val pin = TableIndex.pinSnapshot(spark, root)
    assert(pin.snapshot.dir == s"$root/g0")
    IncrementalDedup.compactPublish(spark, root)
    // g0 is superseded and OLD (negative grace puts the cutoff in the
    // future) — but the live pin must hold it against vacuum AND retire
    val d1 = TableIndex.vacuumGenerations(spark, root, graceMs = -60000L)
    assert(!d1.contains("g0") && new java.io.File(s"$root/g0").exists(),
      s"vacuum deleted a generation with a LIVE reader pin (deleted=$d1)")
    val e = intercept[IllegalArgumentException] {
      TableIndex.retireGeneration(spark, root, "g0")
    }
    assert(e.getMessage.contains("reader pins"), e.getMessage)
    // the pinned handle keeps answering from its generation throughout
    assert(rowsOf(IncrementalDedup.processShard(spark, root, shard, "doc_id", "text",
      tau = 0.8, at = Some(pin.snapshot))) == before,
      "the pinned reader's probe diverged while its generation was pin-protected")
    // release: the generation becomes retirable, and vacuum takes it
    pin.close()
    val d2 = TableIndex.vacuumGenerations(spark, root, graceMs = -60000L)
    assert(d2.contains("g0") && !new java.io.File(s"$root/g0").exists(),
      s"vacuum skipped an unpinned superseded generation (deleted=$d2)")
    // a CRASHED reader's pin (expired, never released) does not hold
    // the generation and is itself swept by the age gate
    val pins = new java.io.File(s"$root/_pins"); pins.mkdirs()
    java.nio.file.Files.write(new java.io.File(pins, "pforged").toPath,
      s"gX ${System.currentTimeMillis() - 60000}".getBytes("UTF-8"))
    val d3 = TableIndex.vacuumGenerations(spark, root, graceMs = -60000L)
    assert(d3.contains("_pins/pforged"), s"expired pin not swept (deleted=$d3)")
    // a pin on a PLAIN (pointer-less) directory is a no-op handle
    val plain = graft.util.TempDirs.scratch("gen_pins_plain").toString
    IncrementalDedup.buildIndex(d, "doc_id", "text", plain)
    val plainPin = TableIndex.pinSnapshot(spark, plain)
    assert(plainPin.snapshot.origin.isEmpty)
    plainPin.close() // must not throw
  }

  test("resolvePin: cross-index handles still throw; root/generation mixed addressing resolves") {
    val rootA = graft.util.TempDirs.scratch("gen_pin_a").toString
    val rootB = graft.util.TempDirs.scratch("gen_pin_b").toString
    val d = docsDf.limit(30)
    IncrementalDedup.buildIndex(d, "doc_id", "text", s"$rootA/g0")
    TableIndex.publishGeneration(spark, rootA, "g0")
    IncrementalDedup.buildIndex(d, "doc_id", "text", rootB)
    val pinA = TableIndex.openSnapshot(spark, rootA)
    // mixed addressing: handle pinned via the root, operation addressed
    // by the generation dir directly
    assert(TableIndex.resolvePin(spark, s"$rootA/g0", snapshot = false, Some(pinA)).isDefined)
    // and the reverse: pinned on the generation, addressed by the root
    val pinG = TableIndex.openSnapshot(spark, s"$rootA/g0")
    assert(TableIndex.resolvePin(spark, rootA, snapshot = false, Some(pinG)).isDefined)
    // a different index remains a hard error
    intercept[IllegalArgumentException] {
      TableIndex.resolvePin(spark, rootB, snapshot = false, Some(pinA))
    }
  }
}
