package graft

import graft.ml.{AnnSearch, IvfIndex}
import graft.text.IncrementalDedup
import graft.util.TableIndex
import org.apache.spark.sql.functions._

/** The offline invariant checker: a healthy index yields no findings;
  * each planted violation — states the commit protocol cannot produce
  * but a manual copy, partial restore, or foreign writer can — is
  * named by its stable kind tag. */
class FsckSpec extends SparkSpec {

  private def docsDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("dedup index: healthy is clean; orphan files, parity breaks, torn batches are named") {
    import spark.implicits._
    val idx = graft.util.TempDirs.scratch("fsck_dedup").toString
    IncrementalDedup.buildIndex(docsDf.limit(120), "doc_id", "text", idx)
    assert(IncrementalDedup.fsckIndex(spark, idx).isEmpty,
      s"healthy index flagged: ${IncrementalDedup.fsckIndex(spark, idx)}")

    // a half-shaped foreign write: hashes rows without sigs/shingles/bands
    TableIndex.commitBatch(spark, idx, "fsck-half",
      Seq(("hashes.parquet", Seq((999001L, 42L)).toDF("id", "h"), Seq.empty)))
    val parity = IncrementalDedup.fsckIndex(spark, idx).filter(_.kind == "id-parity")
    assert(parity.size == 3, s"expected 3 id-parity findings (sigs/shingles/bands): $parity")

    // an orphan bid-prefixed file repair can never reach
    val orphan = new java.io.File(s"$idx/hashes.parquet/b_fsck-ghost__part-0.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](80, 65, 82, 49))
    // a torn staged batch (writer died mid-stage)
    new java.io.File(s"$idx/_staging/fsck-torn").mkdirs()
    // a crashed fold's temp file
    val tmp = new java.io.File(s"$idx/_commits/_tmp.deadbeef")
    java.nio.file.Files.write(tmp.toPath, "x".getBytes)
    val kinds = TableIndex.fsck(spark, idx).map(_.kind).toSet
    assert(kinds == Set("orphan-file", "torn-batch", "tmp-leftover"),
      s"planted violations not all named: $kinds")
    // the orphan is invisible to a snapshot read (uncommitted bid) —
    // fsck exists because PLAIN reads would see it
    orphan.delete()
    TableIndex.repair(spark, idx) // rolls the torn batch back
    assert(!new java.io.File(s"$idx/_staging").exists())

    // a WHOLLY-dropped table (the partial-restore case) must be a
    // named finding, not a silent skip that leaves the survivors
    // "in parity" with each other
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmRf)
      f.delete(); ()
    }
    rmRf(new java.io.File(s"$idx/sigs.parquet"))
    val dropped = IncrementalDedup.fsckIndex(spark, idx)
    assert(dropped.exists(f => f.kind == "missing-table" && f.detail.contains("sigs")),
      s"dropped table not named: $dropped")

    // an INVALID-named staging entry (no commit ever accepted such an
    // id — restore damage or a foreign writer): named, and tolerated
    // by repair rather than thrown from every read (r13 ADVICE)
    new java.io.File(s"$idx/_staging/__bogus").mkdirs()
    val invalid = TableIndex.fsck(spark, idx)
    assert(invalid.exists(f => f.kind == "invalid-bid" && f.detail == "__bogus"),
      s"invalid staging name not named: $invalid")
    TableIndex.repair(spark, idx) // must not throw
    assert(!new java.io.File(s"$idx/_staging/__bogus").exists())
  }

  test("fsckRepair applies the documented remedy per kind; the repaired index audits clean") {
    import spark.implicits._
    val idx = graft.util.TempDirs.scratch("fsck_repair").toString
    IncrementalDedup.buildIndex(docsDf.limit(100), "doc_id", "text", idx)
    val shard = docsDf.limit(140).filter(pmod(col("doc_id"), lit(4)) === 0)
    val healthyProbe = IncrementalDedup
      .processShard(spark, idx, shard, "doc_id", "text", tau = 0.8)
      .collect().map(_.toString).sorted.toSeq

    // plant one of each repairable kind:
    //  - orphan bid-file (quarantined, not deleted)
    val orphan = new java.io.File(s"$idx/hashes.parquet/b_rep-ghost__part-0.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](80, 65, 82, 49))
    //  - torn staged batch (rolled back)
    new java.io.File(s"$idx/_staging/rep-torn").mkdirs()
    //  - invalid-named staging entry (swept)
    new java.io.File(s"$idx/_staging/__rep-bogus").mkdirs()
    //  - crashed fold's temp (swept)
    java.nio.file.Files.write(new java.io.File(s"$idx/_commits/_tmp.rep").toPath, "x".getBytes)
    //  - expired writer lease (resolved by the repair's own acquire)
    java.nio.file.Files.write(new java.io.File(s"$idx/_writer.lease").toPath,
      s"deadtoken ${System.currentTimeMillis() - 60000}".getBytes("UTF-8"))

    val actions = TableIndex.fsckRepair(spark, idx)
    val byKind = actions.map { case (f, a) => f.kind -> a }.toMap
    assert(byKind("orphan-file").startsWith("quarantined"), s"$byKind")
    assert(byKind.contains("torn-batch") && byKind.contains("invalid-bid") &&
      byKind.contains("tmp-leftover") && byKind.contains("stale-lease"), s"$byKind")

    // repaired index audits clean...
    val after = TableIndex.fsck(spark, idx)
    assert(after.isEmpty, s"repaired index still flags: $after")
    // ...the orphan survives in quarantine (moved aside, never deleted)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).map(_.toSeq).getOrElse(Nil).flatMap(walk) else Seq(f)
    assert(walk(new java.io.File(s"$idx/_quarantine"))
      .exists(_.getName == "b_rep-ghost__part-0.parquet"),
      "the orphan was not preserved under _quarantine")
    // ...and probe decisions equal the healthy index's (the quarantined
    // orphan is out of every reader's view)
    val probeAfter = IncrementalDedup
      .processShard(spark, idx, shard, "doc_id", "text", tau = 0.8)
      .collect().map(_.toString).sorted.toSeq
    assert(probeAfter == healthyProbe, "repair changed probe decisions")

    // root-addressed: a crashed publisher's pointer-tmp is swept; the
    // unpublished sibling generation is named but SKIPPED (age-gated)
    val root = graft.util.TempDirs.scratch("fsck_repair_root").toString
    IncrementalDedup.buildIndex(docsDf.limit(40), "doc_id", "text", s"$root/g0")
    TableIndex.publishGeneration(spark, root, "g0")
    IncrementalDedup.compactIndex(spark, s"$root/g0", s"$root/g1")
    java.nio.file.Files.write(new java.io.File(s"$root/_generation.tmp.crashed").toPath,
      "g1".getBytes("UTF-8"))
    val rootActions = TableIndex.fsckRepair(spark, root)
    val rootByKind = rootActions.map { case (f, a) => f.kind -> a }.toMap
    assert(rootByKind("pointer-tmp") == "swept", s"$rootByKind")
    assert(rootByKind("unpublished-generation").startsWith("skipped"), s"$rootByKind")
    assert(!new java.io.File(s"$root/_generation.tmp.crashed").exists())
    assert(new java.io.File(s"$root/g1").exists(),
      "fsckRepair must not delete an unpublished generation (vacuum's age-gated job)")
  }

  test("ivf index: cell orphans and floats parity breaks are named") {
    import spark.implicits._
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), expr("transform(embedding, x -> cast(x as double))").as("vec"))
      .limit(80)
    val idx = graft.util.TempDirs.scratch("fsck_ivf").toString
    IvfIndex.build(all, AnnSearch.kmeansCentroidsExact(all, 15, iters = 1),
      AnnSearch.pqBook(all, m = 32, stride = 10), idx, storeFloats = true)
    assert(IvfIndex.fsckIndex(spark, idx).isEmpty,
      s"healthy index flagged: ${IvfIndex.fsckIndex(spark, idx)}")

    // a float row with no encoded row (and a nonexistent cell)
    TableIndex.commitBatch(spark, idx, "fsck-floats",
      Seq(("floats.parquet",
        Seq((9999L, 888001L, Array(0.1, 0.2))).toDF("cell", "n_id", "vec"), Seq("cell"))))
    val f1 = IvfIndex.fsckIndex(spark, idx)
    assert(f1.exists(f => f.kind == "floats-parity" && f.detail.contains("no encoded row")), s"$f1")

    // an encoded row keyed to a cell no centroid defines
    TableIndex.commitBatch(spark, idx, "fsck-cell",
      Seq(("encoded.parquet",
        Seq((8888L, 888002L, Array[Byte](0, 0), 1.0)).toDF("cell", "n_id", "codes", "n_norm"),
        Seq("cell"))))
    val f2 = IvfIndex.fsckIndex(spark, idx)
    assert(f2.exists(f => f.kind == "cell-orphan" && f.detail.contains("encoded.parquet")), s"$f2")
    assert(f2.exists(f => f.kind == "floats-parity" && f.detail.contains("no float row")), s"$f2")

    // the diagnostic must NAME missing mandatory tables (wrong path,
    // damaged restore), never crash on them
    val ghost = IvfIndex.fsckIndex(spark,
      graft.util.TempDirs.scratch("fsck_ivf_ghost").toString)
    assert(ghost.count(_.kind == "missing-table") == 3,
      s"empty dir should name all three mandatory tables: $ghost")
  }
}
