package graft

import graft.text.IncrementalDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental dedup: shard decisions match a from-scratch derivation,
  * and the append-only index update is bit-identical to re-indexing
  * the union — the property that makes the generation loop sound. */
class IncrementalDedupSpec extends SparkSpec {

  private def docsDf: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def tableSorted(path: String): Seq[String] =
    spark.read.parquet(path).collect().map(_.toString).sorted.toSeq

  test("processShard decisions: exact dups vs index and shard, near dups at tau=0.8, survivors kept") {
    import spark.implicits._
    val old = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different content about spark query planning internals"),
      (3L, "short")
    ).toDF("doc_id", "text")
    val shard = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 1
      (104L, "  THE  quick brown fox jumps over the lazy dog tonight "), // exact dup of 1 after norm
      (108L, "the quick brown fox jumps over the lazy dog today"), // near dup of 1 (J>=0.8? verify)
      (112L, "an entirely novel document that matches nothing else at all"),
      (116L, "an entirely novel document that matches nothing else at all"), // exact dup of 112 (earlier in shard)
      (120L, "short") // exact dup of 3 (no shingles — exact path must catch it)
    ).toDF("doc_id", "text")
    val idx = graft.util.TempDirs.scratch("incr_spec_idx").toString
    IncrementalDedup.buildIndex(old, "doc_id", "text", idx)
    val got = IncrementalDedup.processShard(spark, idx, shard, "doc_id", "text", tau = 0.8)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(got(100L)._1, "100 is an exact dup of index doc 1")
    assert(got(104L)._1, "104 normalizes to index doc 1's text")
    assert(got(116L)._1, "116 duplicates the earlier shard doc 112")
    assert(got(120L)._1, "120 duplicates short index doc 3 (exact path, no shingles)")
    assert(got(112L)._3, s"112 is novel and must be kept: ${got(112L)}")
    // 108 vs 1: 10-token docs differing in the last word share 7 of 8
    // 3-shingles each → J = 7/9 = 0.778 < 0.8 → kept. Re-derive here
    // so the pin is the ARITHMETIC, not a guessed constant.
    def shingles(t: String) = t.toLowerCase.trim.replaceAll("\\s+", " ").split(" ")
      .sliding(3).map(_.mkString(" ")).toSet
    val j = {
      val (a, b) = (shingles("the quick brown fox jumps over the lazy dog tonight"),
        shingles("the quick brown fox jumps over the lazy dog today"))
      a.intersect(b).size.toDouble / a.union(b).size
    }
    assert(got(108L)._2 == (j >= 0.8),
      s"108's near-dup decision ${got(108L)._2} disagrees with exact Jaccard $j vs tau 0.8")
  }

  test("shard-touched bucket filter: decisions match the full-union window cap, index side never shuffles") {
    import spark.implicits._
    import graft.text.MinHashLsh
    import org.apache.spark.sql.expressions.Window
    // a duplicate clique big enough to trip an itty-small maxBucket cap,
    // plus genuine near-dups that must still be caught
    val mk = (i: Long, t: String) => (i, t)
    val old = (1L to 6L).map(i => mk(i, "common boilerplate header repeated across the whole corpus body"))
      .toDF("doc_id", "text")
    val shard = Seq(
      mk(100L, "common boilerplate header repeated across the whole corpus body"),
      mk(101L, "common boilerplate header repeated across the whole corpus form"),
      mk(102L, "a genuinely fresh document with no relative anywhere in sight")
    ).toDF("doc_id", "text")
    val idx = graft.util.TempDirs.scratch("incr_spec_cap").toString
    IncrementalDedup.buildIndex(old, "doc_id", "text", idx)
    val got = IncrementalDedup.processShard(spark, idx, shard, "doc_id", "text",
      tau = 0.8, maxBucket = 4)
    // REFERENCE derivation: the cap counted over ALL band rows (the
    // pre-r11 full-window form). Touched-bucket filtering must not
    // change any decision, because untouched buckets produce no
    // candidates and touched buckets keep every member.
    val newDocs = shard.select(col("doc_id").as("id"), col("text"))
    val idxSigs = spark.read.parquet(s"$idx/sigs.parquet")
    val newSets = MinHashLsh.shingleSets(newDocs, "id", "text", 3)
    val newSigs = MinHashLsh.signaturesFromSets(newSets, "id", 32)
    val allBands = MinHashLsh.bandBuckets(idxSigs, "id", 8).withColumn("is_new", lit(false))
      .unionByName(MinHashLsh.bandBuckets(newSigs, "id", 8).withColumn("is_new", lit(true)))
    val capped = allBands
      .withColumn("bn", count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("bn") <= 4)
    val refCand = capped.select(col("id").as("a"), col("band"), col("bucket"), col("is_new").as("a_new"))
      .join(capped.filter(col("is_new")).select(col("id").as("b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(!col("a_new") || col("a") < col("b"))
      .select("a", "b").distinct()
    val refNearIds = refCand
      .join(newSets.select(col("id").as("b"), col("sh").as("shb")), Seq("b"))
      .join(old.select(col("doc_id").as("id"), col("text"))
        .unionByName(newDocs).transform(d => MinHashLsh.shingleSets(d, "id", "text", 3))
        .select(col("id").as("a"), col("sh").as("sha")), Seq("a"))
      .filter(size(array_intersect(col("sha"), col("shb"))).cast("double")
        / size(array_union(col("sha"), col("shb"))) >= 0.8)
      .select("b").distinct().as[Long].collect().toSet
    val gotNear = got.filter(col("dup_near")).select("id").as[Long].collect().toSet
    assert(gotNear == refNearIds,
      s"touched-bucket cap diverged from the full-window reference: $gotNear vs $refNearIds")
    // the clique exceeds the cap, so its bucket must have been dropped
    // (101 survives the near check); the fresh doc is kept
    val kept = got.filter(col("kept")).select("id").as[Long].collect().toSet
    assert(kept.contains(102L), "fresh doc must be kept")

    // plan shape: the ONLY corpus-sized input (index band rows) reaches
    // the cap through a broadcast LEFT SEMI join on the shard's bucket
    // keys — a map-side filter — so no full-index exchange exists.
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi, BuildRight") || plan.contains("BuildRight, LeftSemi"),
      s"index band rows lost the broadcast semi filter:\n$plan")
  }

  test("membership-check shard: band scan is partition-pruned to the shard's bucket partitions") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import spark.implicits._
    val d = docsDf
    val idx = graft.util.TempDirs.scratch("incr_prune").toString
    IncrementalDedup.buildIndex(d, "doc_id", "text", idx)
    // one-document shard — the online "is this already indexed" probe;
    // its `bands` buckets hash into ≤ bands of the BandParts partitions
    val one = d.orderBy("doc_id").limit(1)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val got = IncrementalDedup.processShard(spark, idx, one, "doc_id", "text", tau = 0.8)
    got.collect()
    assert(got.count() == 1)
    // descend through AQE stage wrappers (leaf nodes holding a plan)
    // and reused exchanges — the band scan sits under the semi-join's
    // broadcast/shuffle stages
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
      case s: FileSourceScanExec    => Seq(s)
      case other                    => other.children.flatMap(scans)
    }
    val bandScans = scans(got.queryExecution.executedPlan)
      .filter(_.metadata.getOrElse("Location", "").contains("bands.parquet"))
    assert(bandScans.nonEmpty, "probe no longer reads the persisted band table")
    assert(bandScans.forall(_.metadata.getOrElse("PartitionFilters", "").contains("bp")),
      s"band scan lost its partition filter: ${bandScans.map(_.metadata)}")
    val readRows = bandScans.map(_.metrics("numOutputRows").value).sum
    val totalRows = spark.read.parquet(s"$idx/bands.parquet").count()
    assert(readRows < totalRows,
      s"membership probe read the whole band table ($readRows of $totalRows rows)")
  }

  test("deleteInPlace: a removed document stops rejecting, files untouched, compactIndex folds the tombstones") {
    import spark.implicits._
    val old = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different content about spark query planning internals"),
      (3L, "yet another unrelated document regarding histogram binning rules")
    ).toDF("doc_id", "text")
    val idx = graft.util.TempDirs.scratch("incr_tomb").toString
    IncrementalDedup.buildIndex(old, "doc_id", "text", idx)
    def dataFiles(path: String, but: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path)).filter(_.getName.endsWith(".parquet"))
        .filterNot(_.getPath.contains(but))
        .map(f => f.getPath + ":" + f.lastModified() + ":" + f.length()).toSet
    }
    val before = dataFiles(idx, but = "tombstones")
    IncrementalDedup.deleteInPlace(spark, idx, Seq(1L).toDF("id"))
    assert(dataFiles(idx, but = "tombstones") == before,
      "deleteInPlace rewrote the index tables")
    // an exact duplicate of the DELETED doc must now be KEPT; a near
    // duplicate of it must also be kept (its rows are invisible)
    val shard = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "completely different content about spark query planning internals")
    ).toDF("doc_id", "text")
    val got = IncrementalDedup.processShard(spark, idx, shard, "doc_id", "text", tau = 0.8)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(got(100L)._3, s"dup of the deleted doc must be kept after the takedown: ${got(100L)}")
    assert(got(101L)._1, "dup of a live doc must still be rejected")
    // decisions equal a from-scratch rebuild over the remaining docs
    val rebuilt = graft.util.TempDirs.scratch("incr_tomb_rebuilt").toString
    IncrementalDedup.buildIndex(old.filter(col("doc_id") =!= 1L), "doc_id", "text", rebuilt)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).sorted.toSeq
    assert(rows(IncrementalDedup.processShard(spark, idx, shard, "doc_id", "text", tau = 0.8)) ==
      rows(IncrementalDedup.processShard(spark, rebuilt, shard, "doc_id", "text", tau = 0.8)),
      "tombstoned decisions diverged from the rebuilt-over-remaining index")
    // compaction folds: tables == rebuild-over-remaining, no tombstone carry-over
    val folded = graft.util.TempDirs.scratch("incr_tomb_folded").toString
    IncrementalDedup.compactIndex(spark, idx, folded)
    for (t <- Seq("hashes", "sigs", "bands", "shingles")) {
      assert(tableSorted(s"$folded/$t.parquet") == tableSorted(s"$rebuilt/$t.parquet"),
        s"compacted table $t diverged from the rebuild over remaining docs")
    }
    assert(!new java.io.File(s"$folded/tombstones.parquet").exists(),
      "compaction carried the tombstone table over")
  }

  test("updateIndexInPlace: pre-append files byte-untouched, rows identical to the generation rebuild") {
    val d = docsDf
    val old = d.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val shard = d.filter(pmod(col("doc_id"), lit(4)) === 0)
    val idx = graft.util.TempDirs.scratch("incr_inplace").toString
    IncrementalDedup.buildIndex(old, "doc_id", "text", idx)
    def dataFiles(path: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath + ":" + f.lastModified() + ":" + f.length()).toSet
    }
    val before = dataFiles(idx)
    IncrementalDedup.updateIndexInPlace(spark, idx, shard, "doc_id", "text")
    assert(before.subsetOf(dataFiles(idx)),
      "updateIndexInPlace rewrote or removed existing index files")
    val rebuilt = graft.util.TempDirs.scratch("incr_inplace_rebuilt").toString
    IncrementalDedup.buildIndex(old.unionByName(shard), "doc_id", "text", rebuilt)
    for (t <- Seq("hashes", "sigs", "bands", "shingles")) {
      assert(tableSorted(s"$idx/$t.parquet") == tableSorted(s"$rebuilt/$t.parquet"),
        s"in-place-appended table $t diverged from the from-scratch rebuild")
    }
  }

  test("dedupStream equals the manual shard loop; final index equals a rebuild over the survivors") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = docsDf
    val initial = d.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val arriving = d.filter(pmod(col("doc_id"), lit(4)) === 0)
      .select(col("doc_id").cast("long"), col("text"))
      .orderBy("doc_id")
      .as[(Long, String)].collect()
    val idxStream = graft.util.TempDirs.scratch("incr_stream_idx").toString
    val idxManual = graft.util.TempDirs.scratch("incr_manual_idx").toString
    IncrementalDedup.buildIndex(initial, "doc_id", "text", idxStream)
    IncrementalDedup.buildIndex(initial, "doc_id", "text", idxManual)
    val batches = arriving.grouped(math.max(1, arriving.length / 3 + 1)).toSeq
    // stream side
    val mem = MemoryStream[(Long, String)]
    val decDir = graft.util.TempDirs.scratch("incr_stream_dec").toString
    val q = IncrementalDedup.dedupStream(idxStream, mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", decDir, graft.util.TempDirs.scratch("incr_stream_ckpt").toString, tau = 0.8)
    try {
      batches.foreach { b => mem.addData(b.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()
    // manual loop over the SAME batches
    val manualDecisions = batches.map { b =>
      val batchDf = b.toIndexedSeq.toDF("doc_id", "text")
      val dec = IncrementalDedup.processShard(spark, idxManual, batchDf, "doc_id", "text", tau = 0.8)
        .localCheckpoint(true)
      val survivors = batchDf.join(dec.filter(col("kept")).select(col("id").as("doc_id")), Seq("doc_id"))
      IncrementalDedup.updateIndexInPlace(spark, idxManual, survivors, "doc_id", "text")
      dec
    }.reduce(_ unionByName _)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(spark.read.parquet(s"$decDir/decisions.parquet")) == rows(manualDecisions),
      "streamed decisions diverged from the manual shard loop")
    for (t <- Seq("hashes", "sigs", "bands", "shingles")) {
      assert(tableSorted(s"$idxStream/$t.parquet") == tableSorted(s"$idxManual/$t.parquet"),
        s"streamed index table $t diverged from the manual loop")
    }
    // and the loop's output state is replayable from scratch
    val survivorIds = spark.read.parquet(s"$decDir/decisions.parquet").filter(col("kept")).select(col("id").as("doc_id"))
    val survivors = arriving.toIndexedSeq.toDF("doc_id", "text").join(survivorIds, Seq("doc_id"))
    val rebuilt = graft.util.TempDirs.scratch("incr_stream_rebuilt").toString
    IncrementalDedup.buildIndex(
      initial.select(col("doc_id"), col("text")).unionByName(survivors), "doc_id", "text", rebuilt)
    for (t <- Seq("hashes", "sigs", "bands", "shingles")) {
      assert(tableSorted(s"$idxStream/$t.parquet") == tableSorted(s"$rebuilt/$t.parquet"),
        s"streamed index table $t is not replayable from scratch")
    }
  }

  test("updateIndex is a tombstone fold point: a deleted doc does not resurrect in the next generation") {
    import spark.implicits._
    val old = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different content about spark query planning internals")
    ).toDF("doc_id", "text")
    val gen1 = graft.util.TempDirs.scratch("incr_fold_gen1").toString
    IncrementalDedup.buildIndex(old, "doc_id", "text", gen1)
    IncrementalDedup.deleteInPlace(spark, gen1, Seq(1L).toDF("id"))
    val survivors = Seq((50L, "a fresh survivor document from the shard just processed"))
      .toDF("doc_id", "text")
    val gen2 = graft.util.TempDirs.scratch("incr_fold_gen2").toString
    IncrementalDedup.updateIndex(spark, gen1, survivors, "doc_id", "text", gen2)
    // the copied generation holds only LIVE rows and no tombstone table
    assert(!new java.io.File(s"$gen2/tombstones.parquet").exists(),
      "generation copy carried the tombstone table forward")
    assert(spark.read.parquet(s"$gen2/hashes.parquet").filter(col("id") === 1L).count() == 0,
      "generation copy resurrected a tombstoned document's rows")
    // and a dup of the deleted doc is KEPT against the new generation
    val probe = Seq((100L, "the quick brown fox jumps over the lazy dog tonight")).toDF("doc_id", "text")
    val got = IncrementalDedup.processShard(spark, gen2, probe, "doc_id", "text", tau = 0.8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got(100L), "a dup of the deleted doc was rejected by the copied generation")
    // equality: gen2 == a from-scratch build over (live old ∪ survivors)
    val rebuilt = graft.util.TempDirs.scratch("incr_fold_rebuilt").toString
    IncrementalDedup.buildIndex(
      old.filter(col("doc_id") =!= 1L).unionByName(survivors), "doc_id", "text", rebuilt)
    for (t <- Seq("hashes", "sigs", "bands", "shingles"))
      assert(tableSorted(s"$gen2/$t.parquet") == tableSorted(s"$rebuilt/$t.parquet"),
        s"folded generation table $t diverged from the rebuild over live docs")
  }

  test("updateIndex(survivors) is bit-identical to rebuilding the index from the union") {
    val d = docsDf
    val old = d.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val shard = d.filter(pmod(col("doc_id"), lit(4)) === 0)
    val gen1 = graft.util.TempDirs.scratch("incr_gen1").toString
    IncrementalDedup.buildIndex(old, "doc_id", "text", gen1)
    val decisions = IncrementalDedup.processShard(spark, gen1, shard, "doc_id", "text", tau = 0.8)
    val survivors = shard.join(
      decisions.filter(col("kept")).select(col("id").as("doc_id")), Seq("doc_id"))
    val gen2 = graft.util.TempDirs.scratch("incr_gen2").toString
    IncrementalDedup.updateIndex(spark, gen1, survivors, "doc_id", "text", gen2)
    val rebuilt = graft.util.TempDirs.scratch("incr_rebuilt").toString
    IncrementalDedup.buildIndex(old.unionByName(survivors), "doc_id", "text", rebuilt)
    for (t <- Seq("hashes", "sigs", "bands", "shingles")) {
      assert(tableSorted(s"$gen2/$t.parquet") == tableSorted(s"$rebuilt/$t.parquet"),
        s"updated index table $t diverged from the from-scratch rebuild")
    }
    // and the survivors are a meaningful subset (not all, not none)
    val (nShard, nKept) = (shard.count(), survivors.count())
    assert(nKept > 0 && nKept < nShard,
      s"degenerate fixture split: kept $nKept of $nShard shard docs")
  }
}
