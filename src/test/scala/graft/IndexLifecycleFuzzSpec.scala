package graft

import graft.ml.{AnnSearch, IvfIndex}
import graft.text.IncrementalDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seeded random LIFECYCLE fuzzing of the two persisted indexes: a
  * deterministic op sequence (append / tombstone delete / torn-append-
  * then-replay / geometry refresh / compact / recluster, with a
  * marker FOLD + replay-after-fold action every even step) drives each
  * index through states no single-purpose spec enumerates, and after
  * EVERY step the index must answer its probe exactly like a
  * from-scratch derivation over the model's live set — through BOTH
  * read postures (plain and snapshot). The fixed seeds make it
  * CI-deterministic (the RandomizedPropertySpec discipline); the
  * torn-append op plants the literal crash state (bid-prefixed live
  * files + staging record, no marker), probes it through the SNAPSHOT
  * path (must see the pre-batch model, must not repair) and only then
  * replays, so protocol rollback AND snapshot isolation run under
  * every surrounding state the walk reaches, not just the one in
  * TableIndexSpec. */
class IndexLifecycleFuzzSpec extends SparkSpec {

  private def parquetFiles(path: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val root = new java.io.File(path)
    if (!root.exists()) Seq.empty else walk(root).filter(_.getName.endsWith(".parquet"))
  }

  /** Plant a mid-append crash: one table's slice moved live under the
    * bid prefix, staging record present, no commit marker. */
  private def tearBatch(indexDir: String, bid: String, table: String, rows: DataFrame): Unit = {
    val tmp = graft.util.TempDirs.scratch("fuzz_torn").toString + "/t"
    rows.write.mode("overwrite").parquet(tmp)
    new java.io.File(s"$indexDir/_staging/$bid").mkdirs()
    val part = parquetFiles(tmp).head
    val dst = new java.io.File(s"$indexDir/$table/b_${bid}__${part.getName}")
    dst.getParentFile.mkdirs()
    assert(part.renameTo(dst), "fuzz setup: could not plant the torn file")
  }

  // ---------------------------------------------------------------
  // Dedup index walk
  // ---------------------------------------------------------------

  /** 300-word vocabulary, 25–60-token docs — long enough that banded
    * LSH recall at the planted J values is effectively certain (the
    * fuzzer tests LIFECYCLE state, not banding probability; see the
    * miss-probability arithmetic in the near-dup plant below). */
  private def mkDoc(rng: scala.util.Random): String = {
    val n = 25 + rng.nextInt(36)
    (0 until n).map(_ => s"word${rng.nextInt(300)}").mkString(" ")
  }

  private def shingles(t: String): Set[String] =
    t.toLowerCase.trim.replaceAll("\\s+", " ").split(" ")
      .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty || b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / a.union(b).size

  test("dedup index: random append/delete/tear/compact walks keep processShard == brute force (3 seeds)") {
    import spark.implicits._
    for (seed <- 1L to 3L) {
      val rng = new scala.util.Random(seed)
      // universe of appendable docs, ids unique across the walk
      val universe = (0 until 60).map(i => (seed * 1000 + i, mkDoc(rng)))
      var nextSlice = 0
      var live = Map.empty[Long, String]
      // every id whose rows should be ON DISK (tombstoned rows stay
      // until a compact folds them) — the torn-leftover detector:
      // a failed rollback leaves duplicate rows for a replayed id
      var tableIds = Set.empty[Long]
      var dir = graft.util.TempDirs.scratch(s"fuzz_dedup_$seed").toString
      // probe shard: exact copies of three universe docs, a one-token
      // near-dup of a fourth (J ≈ 0.93+ on 25+-token docs → banded
      // miss probability < 1e-4 with k=32/8 bands), and two novel docs
      val probeBase = Seq(
        (90001L, universe(0)._2),
        (90002L, universe(7)._2),
        (90003L, universe(13)._2),
        (90004L, universe(21)._2.split(" ").dropRight(1).mkString(" ") + " zzz"),
        (90005L, mkDoc(rng)),
        (90006L, mkDoc(rng)))
      val probeDf = probeBase.toDF("doc_id", "text")
      // seed generation: first 10 docs
      val first = universe.slice(0, 10)
      IncrementalDedup.buildIndex(first.toDF("doc_id", "text"), "doc_id", "text", dir)
      live ++= first
      tableIds ++= first.map(_._1)
      nextSlice = 10

      def bruteDecisions(): Map[Long, (Boolean, Boolean, Boolean)] = {
        def norm(t: String) = t.toLowerCase.trim.replaceAll("\\s+", " ")
        val liveNorms = live.values.map(norm).toSet
        val liveSh = live.values.map(shingles).toSeq
        probeBase.sortBy(_._1).foldLeft(Map.empty[Long, (Boolean, Boolean, Boolean)]) {
          case (acc, (id, text)) =>
            val earlier = probeBase.filter(_._1 < id)
            val de = liveNorms.contains(norm(text)) ||
              earlier.exists(e => norm(e._2) == norm(text))
            val sh = shingles(text)
            val dn = liveSh.exists(s => jaccard(s, sh) >= 0.8) ||
              earlier.exists(e => jaccard(shingles(e._2), sh) >= 0.8)
            acc + (id -> ((de, dn, !de && !dn)))
        }
      }
      def engineDecisions(snapshot: Boolean = false): Map[Long, (Boolean, Boolean, Boolean)] =
        IncrementalDedup.processShard(spark, dir, probeDf, "doc_id", "text", tau = 0.8,
            snapshot = snapshot)
          .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))))
          .toMap

      // the last batch committed into the CURRENT dir, for the
      // fold-then-replay action (reset when a compact switches dirs)
      var lastReplay: Option[(String, Seq[(Long, String)])] = None
      for (step <- 1 to 6) {
        val op = rng.nextInt(10)
        if (op < 4 && nextSlice < universe.length) { // append
          val batch = universe.slice(nextSlice, nextSlice + 5)
          nextSlice += 5
          IncrementalDedup.updateIndexInPlace(spark, dir, batch.toDF("doc_id", "text"),
            "doc_id", "text", batchId = Some(s"fz_${seed}_$step"))
          live ++= batch
          tableIds ++= batch.map(_._1)
          lastReplay = Some((s"fz_${seed}_$step", batch))
        } else if (op < 6 && live.size > 3) { // tombstone delete
          val victims = rng.shuffle(live.keys.toSeq.sorted).take(1 + rng.nextInt(3))
          IncrementalDedup.deleteInPlace(spark, dir, victims.toDF("id"))
          live --= victims
        } else if (op < 8 && nextSlice < universe.length) { // torn append, then replay
          val batch = universe.slice(nextSlice, nextSlice + 4)
          nextSlice += 4
          val bid = s"fz_torn_${seed}_$step"
          // the crash can land mid-write of ANY table: rotate which one
          // carries the torn slice (rollback must find it wherever it is)
          val slice = batch.take(2).toDF("doc_id", "text")
          rng.nextInt(3) match {
            case 0 => tearBatch(dir, bid, "hashes.parquet",
              slice.select(col("doc_id").cast("long").as("id"),
                xxhash64(graft.text.TextOps.normText(col("text"))).as("h")))
            case 1 => tearBatch(dir, bid, "shingles.parquet",
              slice.select(col("doc_id").cast("long").as("id"),
                expr("array(xxhash64(text))").as("shh")))
            case _ => tearBatch(dir, bid, s"bands.parquet/bp=${rng.nextInt(64)}",
              slice.select(col("doc_id").cast("long").as("id"),
                lit(rng.nextInt(8).toLong).as("band"), lit(rng.nextLong()).as("bucket")))
          }
          // a SNAPSHOT probe interleaved mid-crash (torn files live, no
          // marker) must see the pre-batch model and must NOT repair
          assert(engineDecisions(snapshot = true) == bruteDecisions(),
            s"seed $seed step $step: snapshot probe observed the torn (uncommitted) batch")
          assert(parquetFiles(dir).exists(_.getName.startsWith(s"b_${bid}__")),
            s"seed $seed step $step: snapshot probe repaired the in-flight batch away")
          IncrementalDedup.updateIndexInPlace(spark, dir, batch.toDF("doc_id", "text"),
            "doc_id", "text", batchId = Some(bid))
          live ++= batch
          tableIds ++= batch.map(_._1)
          lastReplay = Some((bid, batch))
        } else if (op == 8 && nextSlice + 6 <= universe.length) {
          // CONCURRENT PRODUCERS (r15: staging runs outside the index
          // lease) — two threads append different batches at once with
          // the bounded move-phase wait; both must land, neither may
          // roll the other back, under whatever state the walk reached
          val b1 = universe.slice(nextSlice, nextSlice + 3)
          val b2 = universe.slice(nextSlice + 3, nextSlice + 6)
          nextSlice += 6
          val dfs = Seq((s"fz_ca_${seed}_$step", b1.toDF("doc_id", "text")),
                        (s"fz_cb_${seed}_$step", b2.toDF("doc_id", "text")))
          spark.conf.set("spark.graft.commit.leaseWaitMs", "60000")
          try {
            val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
            val threads = dfs.map { case (bid, df) =>
              val t = new Thread(() => {
                try IncrementalDedup.updateIndexInPlace(spark, dir, df,
                  "doc_id", "text", batchId = Some(bid))
                catch { case e: Throwable => errs.add(e) }
              })
              t.setDaemon(true); t.start(); t
            }
            threads.foreach(_.join(120000))
            assert(errs.isEmpty,
              s"seed $seed step $step: concurrent producers failed: ${errs.toArray.toList}")
          } finally spark.conf.unset("spark.graft.commit.leaseWaitMs")
          live ++= b1 ++ b2
          tableIds ++= (b1 ++ b2).map(_._1)
          lastReplay = Some((s"fz_cb_${seed}_$step", b2))
        } else { // compact into a fresh generation
          val out = graft.util.TempDirs.scratch(s"fuzz_dedup_${seed}_c$step").toString
          IncrementalDedup.compactIndex(spark, dir, out)
          dir = out
          tableIds = live.keySet
          lastReplay = None
        }
        // marker FOLD every even step (composes with whatever state the
        // walk reached), then replay the last committed bid: it must
        // still skip via the base-file lookup — a miss re-appends its
        // rows and the hashes-id check below catches the duplicates
        if (step % 2 == 0) {
          graft.util.TableIndex.checkpointCommits(spark, dir)
          lastReplay.foreach { case (bid, batch) =>
            IncrementalDedup.updateIndexInPlace(spark, dir, batch.toDF("doc_id", "text"),
              "doc_id", "text", batchId = Some(bid))
          }
        }
        // torn-leftover detector: one hashes row per on-disk id, no
        // duplicates (a failed rollback leaves the torn slice BESIDE
        // the replay's rows — invisible to the set-semantics decision
        // checks, visible as a row-count excess here)
        val hids = spark.read.parquet(s"$dir/hashes.parquet")
          .select("id").collect().map(_.getLong(0)).toSeq
        assert(hids.sorted == tableIds.toSeq.sorted,
          s"seed $seed step $step: hashes table ids diverged from the model " +
            s"(${hids.length} rows vs ${tableIds.size} expected) — torn rollback leftovers?")
        val (got, want) = (engineDecisions(), bruteDecisions())
        assert(got == want,
          s"seed $seed step $step: engine decisions diverged from brute force\n" +
            s"engine: ${got.toSeq.sortBy(_._1)}\nbrute:  ${want.toSeq.sortBy(_._1)}")
        // quiescent index: the snapshot posture answers identically
        assert(engineDecisions(snapshot = true) == want,
          s"seed $seed step $step: snapshot decisions diverged on a quiescent index")
      }
      assert(live.nonEmpty)
    }
  }

  // ---------------------------------------------------------------
  // IVF index walk
  // ---------------------------------------------------------------

  /** Two clusters 45° apart in dim 8 (the TableIndexSpec geometry),
    * universe vectors keyed by id with deterministic trig noise. */
  private def mkVec(id: Long): Array[Double] = {
    val dim = 8
    val inv = 1.0 / math.sqrt(2.0)
    val c = if (id % 2 == 0) Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
    else Array.tabulate(dim)(i => if (i == 0 || i == 1) inv else 0.0)
    c.indices.map(i => c(i) + 0.06 * math.sin(id * 13.7 + i * 2.1)).toArray
  }

  test("ivf index: random append/delete/refresh/tear/compact walks keep nearDupsExact == brute force (3 seeds)") {
    import spark.implicits._
    for (seed <- 11L to 13L) {
      val rng = new scala.util.Random(seed)
      val universe = (0 until 80).map(i => (seed * 10000 + i, mkVec(seed * 10000 + i)))
      val shard = (0 until 12).map(i => (95000L + i, mkVec(95000L + i)))
      val shardDf = shard.toDF("id", "vec")
      var nextSlice = 0
      var live = Map.empty[Long, Array[Double]]
      var tableIds = Set.empty[Long]
      var dir = graft.util.TempDirs.scratch(s"fuzz_ivf_$seed").toString
      val first = universe.slice(0, 20)
      val cents = Seq(
        (0L, Seq(1.0, 0, 0, 0, 0, 0, 0, 0)),
        (1L, Seq(1.0 / math.sqrt(2), 1.0 / math.sqrt(2), 0, 0, 0, 0, 0, 0))
      ).toDF("c_id", "c_vec")
      val book = AnnSearch.pqBook(first.toDF("id", "vec"), m = 8, stride = 2)
      IvfIndex.build(first.toDF("id", "vec"), cents, book, dir)
      live ++= first
      tableIds ++= first.map(_._1)
      nextSlice = 20

      def brute(): Set[(Long, Long)] =
        (for {
          (qid, qv) <- shard; (nid, nv) <- live if qid != nid
          d = qv.indices.map(i => qv(i) * nv(i)).sum
          s = d / (math.sqrt(qv.map(x => x * x).sum) * math.sqrt(nv.map(x => x * x).sum))
          if s >= 0.9
        } yield (qid, nid)).toSet
      def engine(snapshot: Boolean = false): Set[(Long, Long)] =
        IvfIndex.nearDupsExact(spark, dir, live.toSeq.toDF("id", "vec"), shardDf, tau = 0.9,
            snapshot = snapshot)
          .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      var lastReplay: Option[(String, Seq[(Long, Array[Double])])] = None
      for (step <- 1 to 6) {
        val op = rng.nextInt(10)
        if (op < 3 && nextSlice < universe.length) { // append
          val batch = universe.slice(nextSlice, nextSlice + 8)
          nextSlice += 8
          IvfIndex.appendInPlace(spark, dir, batch.toDF("id", "vec"),
            batchId = Some(s"fz_${seed}_$step"))
          live ++= batch
          tableIds ++= batch.map(_._1)
          lastReplay = Some((s"fz_${seed}_$step", batch))
        } else if (op < 5 && live.size > 5) { // tombstone delete
          val victims = rng.shuffle(live.keys.toSeq.sorted).take(1 + rng.nextInt(4))
          IvfIndex.deleteInPlace(spark, dir, victims.toDF("id"))
          live --= victims
        } else if (op < 7) { // geometry refresh over the live corpus
          IvfIndex.refreshGeometry(spark, dir, live.toSeq.toDF("id", "vec"))
        } else if (op < 9 && nextSlice < universe.length) { // torn append, then replay
          val batch = universe.slice(nextSlice, nextSlice + 5)
          nextSlice += 5
          val bid = s"fz_torn_${seed}_$step"
          // rotate the torn table: encoded (the corpus table) or
          // geometry (whose torn absence the batch commit must prevent
          // — visible encoded-without-geometry would break the bound)
          if (rng.nextBoolean())
            tearBatch(dir, bid, "encoded.parquet/cell=0",
              batch.take(2).toDF("id", "vec")
                .select(col("id").as("n_id"), lit(Array[Byte](0)).as("codes"), lit(1.0).as("n_norm")))
          else
            tearBatch(dir, bid, "geometry.parquet",
              batch.take(1).toDF("id", "vec")
                .select(lit(0L).as("cell"), lit(0.0).as("r")))
          // snapshot probe mid-crash: pre-batch answers, no repair
          assert(engine(snapshot = true) == brute(),
            s"seed $seed step $step: snapshot probe observed the torn (uncommitted) batch")
          assert(parquetFiles(dir).exists(_.getName.startsWith(s"b_${bid}__")),
            s"seed $seed step $step: snapshot probe repaired the in-flight batch away")
          IvfIndex.appendInPlace(spark, dir, batch.toDF("id", "vec"), batchId = Some(bid))
          live ++= batch
          tableIds ++= batch.map(_._1)
          lastReplay = Some((bid, batch))
        } else if (rng.nextBoolean()) { // compact into a fresh generation
          val out = graft.util.TempDirs.scratch(s"fuzz_ivf_${seed}_c$step").toString
          IvfIndex.compact(spark, dir, out)
          dir = out
          tableIds = live.keySet
          lastReplay = None
        } else { // RECLUSTER into a fresh generation (retrained cells)
          val out = graft.util.TempDirs.scratch(s"fuzz_ivf_${seed}_r$step").toString
          IvfIndex.recluster(spark, dir, live.toSeq.toDF("id", "vec"), out,
            stride = 7, iters = 1)
          dir = out
          tableIds = live.keySet
          lastReplay = None
        }
        // marker fold + replay-after-fold (the dedup walk's action):
        // a replayed bid must resolve through the base file; a miss
        // re-appends and the encoded-id check below catches it
        if (step % 2 == 0) {
          graft.util.TableIndex.checkpointCommits(spark, dir)
          lastReplay.foreach { case (bid, batch) =>
            IvfIndex.appendInPlace(spark, dir, batch.toDF("id", "vec"), batchId = Some(bid))
          }
        }
        val nids = spark.read.parquet(s"$dir/encoded.parquet")
          .select("n_id").collect().map(_.getLong(0)).toSeq
        assert(nids.sorted == tableIds.toSeq.sorted,
          s"seed $seed step $step: encoded table ids diverged from the model " +
            s"(${nids.length} rows vs ${tableIds.size} expected) — torn rollback leftovers?")
        val (got, want) = (engine(), brute())
        assert(got == want,
          s"seed $seed step $step: nearDupsExact diverged from brute force " +
            s"(engine ${got.size} pairs, brute ${want.size})")
        assert(engine(snapshot = true) == want,
          s"seed $seed step $step: snapshot probe diverged on a quiescent index")
        assert(want.nonEmpty, s"seed $seed step $step: degenerate walk — no true pairs left")
      }
    }
  }

  // ---------------------------------------------------------------
  // Root-addressed walks: the GENERATION lifecycle under fuzz
  // ---------------------------------------------------------------
  // Same universes and brute-force models, but every operation
  // addresses the POINTER ROOT, the compact/recluster actions run the
  // full pinned-publish cycle with a randomly INJECTED late append
  // (committed between the rewrite's pin and the swap — the lost-batch
  // race catchUpAndPublish closes), replays cross generation swaps
  // (the seeded history must answer them), and superseded generations
  // are randomly vacuumed. The dir-addressed walks above stay as the
  // plain-protocol baseline.

  test("dedup index: ROOT-addressed walks with publish/catch-up/vacuum keep processShard == brute force (2 seeds)") {
    import spark.implicits._
    for (seed <- 21L to 22L) {
      val rng = new scala.util.Random(seed)
      val universe = (0 until 60).map(i => (seed * 1000 + i, mkDoc(rng)))
      var nextSlice = 0
      var live = Map.empty[Long, String]
      var tableIds = Set.empty[Long]
      val root = graft.util.TempDirs.scratch(s"fuzz_dedup_root_$seed").toString
      val probeBase = Seq(
        (90001L, universe(0)._2),
        (90002L, universe(7)._2),
        (90003L, universe(13)._2),
        (90004L, universe(21)._2.split(" ").dropRight(1).mkString(" ") + " zzz"),
        (90005L, mkDoc(rng)),
        (90006L, mkDoc(rng)))
      val probeDf = probeBase.toDF("doc_id", "text")
      val first = universe.slice(0, 10)
      IncrementalDedup.buildIndex(first.toDF("doc_id", "text"), "doc_id", "text", s"$root/g0")
      graft.util.TableIndex.publishGeneration(spark, root, "g0")
      live ++= first
      tableIds ++= first.map(_._1)
      nextSlice = 10

      def bruteDecisions(): Map[Long, (Boolean, Boolean, Boolean)] = {
        def norm(t: String) = t.toLowerCase.trim.replaceAll("\\s+", " ")
        val liveNorms = live.values.map(norm).toSet
        val liveSh = live.values.map(shingles).toSeq
        probeBase.sortBy(_._1).foldLeft(Map.empty[Long, (Boolean, Boolean, Boolean)]) {
          case (acc, (id, text)) =>
            val earlier = probeBase.filter(_._1 < id)
            val de = liveNorms.contains(norm(text)) ||
              earlier.exists(e => norm(e._2) == norm(text))
            val sh = shingles(text)
            val dn = liveSh.exists(s => jaccard(s, sh) >= 0.8) ||
              earlier.exists(e => jaccard(shingles(e._2), sh) >= 0.8)
            acc + (id -> ((de, dn, !de && !dn)))
        }
      }
      def engineDecisions(snapshot: Boolean = false): Map[Long, (Boolean, Boolean, Boolean)] =
        IncrementalDedup.processShard(spark, root, probeDf, "doc_id", "text", tau = 0.8,
            snapshot = snapshot)
          .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))))
          .toMap

      // replays survive generation swaps now (seeded history), so the
      // last committed bid is NOT reset at a compact — the even-step
      // replay exercises the cross-swap skip
      var lastReplay: Option[(String, Seq[(Long, String)])] = None
      var genN = 0
      for (step <- 1 to 6) {
        val op = rng.nextInt(10)
        if (op < 4 && nextSlice < universe.length) { // append via root
          val batch = universe.slice(nextSlice, nextSlice + 5)
          nextSlice += 5
          IncrementalDedup.updateIndexInPlace(spark, root, batch.toDF("doc_id", "text"),
            "doc_id", "text", batchId = Some(s"fzr_${seed}_$step"))
          live ++= batch
          tableIds ++= batch.map(_._1)
          lastReplay = Some((s"fzr_${seed}_$step", batch))
        } else if (op < 6 && live.size > 3) { // tombstone delete via root
          val victims = rng.shuffle(live.keys.toSeq.sorted).take(1 + rng.nextInt(3))
          IncrementalDedup.deleteInPlace(spark, root, victims.toDF("id"))
          live --= victims
        } else { // pinned compact-publish, RACED by a late append half the time
          val cur = graft.util.TableIndex.resolveDir(spark, root)
          val snap = graft.util.TableIndex.openSnapshot(spark, cur)
          genN += 1
          val gen = s"g$genN"
          IncrementalDedup.compactIndex(spark, cur, s"$root/$gen", at = Some(snap))
          if (rng.nextBoolean() && nextSlice < universe.length) {
            // the race: a shard commits to the (still-current) old
            // generation AFTER the rewrite read its tables
            val late = universe.slice(nextSlice, nextSlice + 4)
            nextSlice += 4
            IncrementalDedup.updateIndexInPlace(spark, root, late.toDF("doc_id", "text"),
              "doc_id", "text", batchId = Some(s"fzr_late_${seed}_$step"))
            live ++= late
            lastReplay = Some((s"fzr_late_${seed}_$step", late))
          }
          graft.util.TableIndex.catchUpAndPublish(spark, root, cur, gen, snap.bids)
          tableIds = live.keySet // tombstones folded; late rows carried
          if (rng.nextBoolean()) { // retire superseded generations
            val swept = graft.util.TableIndex.vacuumGenerations(spark, root, graceMs = -1000L)
            assert(!swept.contains(gen), "vacuum touched the current generation")
          }
        }
        if (step % 2 == 0) {
          graft.util.TableIndex.checkpointCommits(spark,
            graft.util.TableIndex.resolveDir(spark, root))
          lastReplay.foreach { case (bid, batch) =>
            // may replay ACROSS a swap: the carried marker or the
            // seeded history must answer it — a miss re-appends and
            // the hashes-id check below catches the duplicates
            IncrementalDedup.updateIndexInPlace(spark, root, batch.toDF("doc_id", "text"),
              "doc_id", "text", batchId = Some(bid))
          }
        }
        val curDir = graft.util.TableIndex.resolveDir(spark, root)
        val hids = spark.read.parquet(s"$curDir/hashes.parquet")
          .select("id").collect().map(_.getLong(0)).toSeq
        assert(hids.sorted == tableIds.toSeq.sorted,
          s"seed $seed step $step: hashes ids diverged from the model " +
            s"(${hids.length} rows vs ${tableIds.size}) — lost or duplicated across a swap?")
        val (got, want) = (engineDecisions(), bruteDecisions())
        assert(got == want,
          s"seed $seed step $step: root-addressed decisions diverged from brute force")
        assert(engineDecisions(snapshot = true) == want,
          s"seed $seed step $step: root-pinned snapshot decisions diverged")
      }
    }
  }

  test("ivf index: ROOT-addressed walks with compact/recluster publish + late appends keep nearDupsExact == brute force (2 seeds)") {
    import spark.implicits._
    for (seed <- 31L to 32L) {
      val rng = new scala.util.Random(seed)
      val universe = (0 until 80).map(i => (seed * 10000 + i, mkVec(seed * 10000 + i)))
      val shard = (0 until 12).map(i => (96000L + i, mkVec(96000L + i)))
      val shardDf = shard.toDF("id", "vec")
      var nextSlice = 0
      var live = Map.empty[Long, Array[Double]]
      var tableIds = Set.empty[Long]
      val root = graft.util.TempDirs.scratch(s"fuzz_ivf_root_$seed").toString
      val first = universe.slice(0, 20)
      val cents = Seq(
        (0L, Seq(1.0, 0, 0, 0, 0, 0, 0, 0)),
        (1L, Seq(1.0 / math.sqrt(2), 1.0 / math.sqrt(2), 0, 0, 0, 0, 0, 0))
      ).toDF("c_id", "c_vec")
      val book = AnnSearch.pqBook(first.toDF("id", "vec"), m = 8, stride = 2)
      // floats-bearing: the recluster catch-up re-encodes late appends
      IvfIndex.build(first.toDF("id", "vec"), cents, book, s"$root/g0", storeFloats = true)
      graft.util.TableIndex.publishGeneration(spark, root, "g0")
      live ++= first
      tableIds ++= first.map(_._1)
      nextSlice = 20

      def brute(): Set[(Long, Long)] =
        (for {
          (qid, qv) <- shard; (nid, nv) <- live if qid != nid
          d = qv.indices.map(i => qv(i) * nv(i)).sum
          s = d / (math.sqrt(qv.map(x => x * x).sum) * math.sqrt(nv.map(x => x * x).sum))
          if s >= 0.9
        } yield (qid, nid)).toSet
      def engine(snapshot: Boolean = false): Set[(Long, Long)] =
        IvfIndex.nearDupsExact(spark, root, shardDf, tau = 0.9, snapshot = snapshot,
            at = None)
          .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      var lastReplay: Option[(String, Seq[(Long, Array[Double])])] = None
      var genN = 0
      for (step <- 1 to 6) {
        val op = rng.nextInt(10)
        if (op < 3 && nextSlice < universe.length) { // append via root
          val batch = universe.slice(nextSlice, nextSlice + 8)
          nextSlice += 8
          IvfIndex.appendInPlace(spark, root, batch.toDF("id", "vec"),
            batchId = Some(s"fzr_${seed}_$step"))
          live ++= batch
          tableIds ++= batch.map(_._1)
          lastReplay = Some((s"fzr_${seed}_$step", batch))
        } else if (op < 5 && live.size > 5) { // tombstone delete via root
          val victims = rng.shuffle(live.keys.toSeq.sorted).take(1 + rng.nextInt(4))
          IvfIndex.deleteInPlace(spark, root, victims.toDF("id"))
          live --= victims
        } else if (op < 7) { // geometry refresh via root (floats-bearing: own table)
          IvfIndex.refreshGeometry(spark, root, spark.emptyDataFrame)
        } else {
          // pinned publish — compact (file-copy carry) or recluster
          // (re-encode carry), raced by a late append half the time
          val cur = graft.util.TableIndex.resolveDir(spark, root)
          val snap = graft.util.TableIndex.openSnapshot(spark, cur)
          genN += 1
          val gen = s"g$genN"
          val reclustered = rng.nextBoolean()
          if (reclustered)
            IvfIndex.recluster(spark, cur, spark.emptyDataFrame, s"$root/$gen",
              stride = 7, iters = 1, at = Some(snap))
          else
            IvfIndex.compact(spark, cur, s"$root/$gen", at = Some(snap))
          if (rng.nextBoolean() && nextSlice < universe.length) {
            val late = universe.slice(nextSlice, nextSlice + 5)
            nextSlice += 5
            IvfIndex.appendInPlace(spark, root, late.toDF("id", "vec"),
              batchId = Some(s"fzr_late_${seed}_$step"))
            live ++= late
            lastReplay = Some((s"fzr_late_${seed}_$step", late))
          }
          if (reclustered)
            graft.util.TableIndex.catchUpAndPublishWith(spark, root, cur, gen, snap.bids)(
              bids => IvfIndex.carryReencoded(spark, cur, s"$root/$gen", bids))
          else
            graft.util.TableIndex.catchUpAndPublish(spark, root, cur, gen, snap.bids)
          tableIds = live.keySet
          if (rng.nextBoolean()) {
            val swept = graft.util.TableIndex.vacuumGenerations(spark, root, graceMs = -1000L)
            assert(!swept.contains(gen), "vacuum touched the current generation")
          }
        }
        if (step % 2 == 0) {
          graft.util.TableIndex.checkpointCommits(spark,
            graft.util.TableIndex.resolveDir(spark, root))
          lastReplay.foreach { case (bid, batch) =>
            IvfIndex.appendInPlace(spark, root, batch.toDF("id", "vec"), batchId = Some(bid))
          }
        }
        val curDir = graft.util.TableIndex.resolveDir(spark, root)
        val nids = spark.read.parquet(s"$curDir/encoded.parquet")
          .select("n_id").collect().map(_.getLong(0)).toSeq
        assert(nids.sorted == tableIds.toSeq.sorted,
          s"seed $seed step $step: encoded ids diverged from the model " +
            s"(${nids.length} rows vs ${tableIds.size}) — lost or duplicated across a swap?")
        val (got, want) = (engine(), brute())
        assert(got == want,
          s"seed $seed step $step: root-addressed nearDupsExact diverged from brute force " +
            s"(engine ${got.size} pairs, brute ${want.size})")
        assert(engine(snapshot = true) == want,
          s"seed $seed step $step: root-pinned snapshot probe diverged")
        assert(want.nonEmpty, s"seed $seed step $step: degenerate walk — no true pairs left")
      }
    }
  }
}
