package graft.ml

import graft.functions.PqBook
import graft.util.TableIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED IVF+PQ retrieval index — the "encode once, materialize,
  * reuse per query batch" contract of [[AnnSearch.ivfPqTopK]] turned
  * into an on-disk artifact, mirroring
  * [[graft.text.IncrementalDedup]]'s persistence discipline for the
  * ANN family: at 100 TB nobody re-encodes the corpus per session —
  * the index is built once, APPENDED to as new vectors arrive, and
  * every query session reads only the probed cells' code rows.
  *
  * Four parquet tables under one directory:
  *  - `centroids` (c_id, c_vec): the (possibly Lloyd-refined) cell
  *    table — dim-table-sized,
  *  - `book` (sub, code, cw): the PQ codebook, one row per
  *    (subspace, codeword) with the dsub-dim codeword vector,
  *  - `encoded` (cell, n_id, codes, n_norm): the corpus encoding —
  *    m bytes of codes + one norm per vector, the ONLY corpus-sized
  *    table, ~32× smaller than the float vectors it indexes, written
  *    PARTITIONED BY cell so a query session's scan touches only the
  *    probed cells' files (partition pruning, verified on scan
  *    metrics by IvfIndexSpec — at nprobe/nlist = 0.2 a probe reads
  *    ~20% of the code rows and none of the float corpus until the
  *    shortlist re-rank),
  *  - `geometry` (cell, r): per-cell angular radii, the triangle-bound
  *    state [[nearDupsExact]] prunes with. The geometry table is a
  *    pure ACCELERATOR: readers take the max radius over rows and
  *    treat a cell with no row as r = π (always a candidate), so any
  *    missing/stale/partial geometry state — pre-geometry legacy
  *    indexes, a crash mid-[[refreshGeometry]] — degrades to
  *    correct-but-less-pruned, never to a missed pair.
  *
  * Durability ([[graft.util.TableIndex]], shared with the dedup
  * index): [[build]] and every in-place mutation commit their tables
  * as ONE staged batch behind an atomic marker, so a crash between
  * table writes cannot tear the index (encoded rows present, geometry
  * rows absent — which WOULD be unsound, since a new vector may lie
  * outside its cell's recorded radius), and a replayed streaming
  * micro-batch resolves to its committed batch id and is skipped
  * (exactly-once ingestion, closing [[ingestStream]]'s documented
  * duplicate-on-replay window).
  *
  * [[append]] encodes new vectors with the PERSISTED centroids and
  * codebook (never re-seeding — re-seeding would silently re-key every
  * existing code) and unions the encoded rows; IvfIndexSpec pins
  * append ≡ rebuild-from-union bit-exactly, the same generation-loop
  * soundness property as `IncrementalDedup.updateIndex`.
  *
  * [[search]] probes the persisted index (nprobe cells per query, ADC
  * cosine ranking over code rows only) and re-ranks the shortlist
  * EXACTLY by joining the float vectors back from the CORPUS table by
  * id — the corpus remains the source of truth for exact scores; the
  * index only accelerates candidate selection. Ids must be unique
  * across the indexed corpus (generations partition the id space).
  */
object IvfIndex {

  /** Write the four index tables for a corpus as one committed batch.
    * `centroids`: (c_id, c_vec); `book`: the PQ codebook to persist;
    * `geometry`: (cell, r) — each cell's ANGULAR RADIUS (max
    * member-to-centroid angle). Radii are UPPER BOUNDS by maintenance
    * contract: appends max new members in ([[appendInPlace]] appends
    * per-shard maxes; readers take max over rows), deletions leave
    * them stale-but-larger — one-sided safe, candidates can only
    * widen, never drop; [[refreshGeometry]] re-tightens them. */
  def build(corpus: DataFrame, centroids: DataFrame, book: PqBook, outDir: String,
            storeFloats: Boolean = false): Unit = {
    val spark = corpus.sparkSession
    TableIndex.wipe(spark, outDir)
    TableIndex.commitBatch(spark, outDir, TableIndex.newBatchId("base"), Seq(
      ("centroids.parquet",
        centroids.select(col("c_id").cast("long"), col("c_vec").cast("array<double>")),
        Seq.empty),
      ("book.parquet", bookRows(spark, book), Seq.empty),
      ("encoded.parquet", encode(corpus, centroids, book), Seq("cell")),
      ("geometry.parquet", cellRadii(corpus, centroids), Seq.empty))
      ++ (if (storeFloats) Seq(("floats.parquet", floatRows(corpus, centroids), Seq("cell")))
          else Seq.empty))
    ()
  }

  /** The opt-in FLOAT table (cell, n_id, vec), cell-PARTITIONED like
    * `encoded` — the IVFFlat-style self-contained index. Without it,
    * [[nearDupsExact]] and [[search]] join the caller's flat corpus
    * for exact scoring, and at 100 TB that join's corpus-side SCAN is
    * a full pass per shard (candidates prune the JOIN, nothing prunes
    * a flat table's scan). With it, the candidate fetch partition-
    * prunes to the candidate/probed cells exactly like the code scan —
    * per-shard float IO proportional to the candidate cells, not the
    * corpus. Cost: the index stores a second copy of the vectors
    * (raw-corpus-sized — the FAISS IVFFlat trade, paid knowingly via
    * `storeFloats`). */
  private def floatRows(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = AnnSearch.collectCentroids(centroids)
    corpus.select(
      graft.functions.NearestCells.topCells(col("vec"), cents, 1).getItem(0).as("cell"),
      col("id").as("n_id"),
      col("vec").cast("array<double>").as("vec"))
  }

  /** The read posture of one LOGICAL operation: None = plain read,
    * Some = a snapshot PINNED at the operation's entry point
    * ([[graft.util.TableIndex.openSnapshot]] — one `_commits` listing)
    * and threaded through every table open inside it, so a batch
    * committing mid-operation is all-or-nothing across the operation's
    * tables (encoded + geometry + floats + tombstones), never a
    * cross-table tear. */
  type Snap = Option[TableIndex.Snapshot]

  /** The LIVE float table, if this index stores one: cell re-widened,
    * tombstones applied — partition filters stacked on top still push
    * to the scan (the [[loadEncoded]] discipline). */
  private[graft] def loadFloats(spark: SparkSession, indexDir: String,
                                snap: Snap = None): Option[DataFrame] =
    TableIndex.readTable(spark, indexDir, "floats.parquet", snap).map { raw =>
      TableIndex.liveTable(spark, indexDir,
        raw.withColumn("cell", col("cell").cast("long")), "n_id", snap)
    }

  /** A dim table (centroids/book) under the chosen read posture. The
    * dim tables are written once per index directory (in-place
    * mutations never touch them), so the snapshot filter is belt-and-
    * braces — but a mid-BUILD reader sees None-committed and fails
    * loud here instead of reading a half-written table. */
  private def dimTable(spark: SparkSession, indexDir: String, table: String,
                       snap: Snap): DataFrame =
    snap match {
      case Some(s) =>
        TableIndex.snapshotTable(spark, s, table).getOrElse(
          throw new IllegalStateException(
            s"$indexDir/$table holds no committed data (index mid-build?)"))
      case None => spark.read.parquet(s"$indexDir/$table")
    }

  /** The persisted centroid table, COLLECTED and session-cached
    * ([[graft.util.TableIndex.cachedDim]] — keyed by the table's
    * visible-file fingerprint, so wipe+rebuild, replaceTable and
    * snapshot-subset views all re-key). Centroids are written once per
    * generation; without the cache every probe / search / append paid
    * a ~0.14 s read+collect of an ≤nlist-row table (measured,
    * dev/EmbStageProbe) — a per-call DRIVER constant that dominates
    * the dim side of shard-cadence workloads. */
  private[graft] def centroidSet(spark: SparkSession, indexDir: String,
                                 snap: Snap = None): graft.functions.CentroidSet =
    TableIndex.cachedDim[graft.functions.CentroidSet](
        "centset", spark, indexDir, "centroids.parquet", snap)(AnnSearch.collectCentroids)
      .getOrElse(throw new IllegalStateException(
        s"$indexDir/centroids.parquet holds no committed data (index mid-build?)"))

  /** The cached centroid set as a tiny LOCAL DataFrame — for callers
    * that feed the table into a join or a write without re-reading
    * parquet. Columns (c_id, c_vec), the persisted schema. */
  private def centroidFrame(spark: SparkSession, indexDir: String,
                            snap: Snap = None): DataFrame = {
    import spark.implicits._
    val cs = centroidSet(spark, indexDir, snap)
    cs.ids.indices.map(i => (cs.ids(i), cs.vecs(i).toSeq)).toDF("c_id", "c_vec")
  }

  /** Per-cell max radius, collected and cached under the geometry
    * table's file fingerprint: appends add radius files and
    * [[refreshGeometry]] replaces them — both re-key — so between
    * mutations the probe side pays one listStatus instead of a
    * groupBy-max Spark job per call. Empty when no geometry exists
    * (legacy index) — readers π-default. */
  private def cachedRadii(spark: SparkSession, indexDir: String,
                          snap: Snap = None): Map[Long, Double] =
    TableIndex.cachedDim[Map[Long, Double]](
        "radii", spark, indexDir, "geometry.parquet", snap) { df =>
      df.groupBy("cell").agg(max("r").as("r"))
        .select(col("cell").cast("long"), col("r").cast("double"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }.getOrElse(Map.empty)

  private def bookRows(spark: SparkSession, book: PqBook): DataFrame = {
    import spark.implicits._
    book.books.zipWithIndex.flatMap { case (codewords, sub) =>
      codewords.zipWithIndex.map { case (cw, code) => (sub, code, cw.toSeq) }
    }.toSeq.toDF("sub", "code", "cw")
  }

  /** Per-cell angular radius over `vectors`: (cell, r) — one aggregate,
    * nlist output rows. Zero-norm vectors resolve to angle 0
    * (try_divide + coalesce, the closure's one-sided-safe rule). */
  private def cellRadii(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = AnnSearch.collectCentroids(centroids)
    val centDf = broadcast(centroids.select(
        col("c_id").cast("long").as("cell"), col("c_vec").cast("array<double>").as("c_vec"))
      .withColumn("c_nrm", AnnSearch.norm(col("c_vec"))))
    vectors.select(
        graft.functions.NearestCells.topCells(col("vec"), cents, 1).getItem(0).as("cell"),
        col("vec").cast("array<double>").as("n_vec"),
        AnnSearch.norm(col("vec")).as("n_nrm"))
      .join(centDf, Seq("cell"))
      .select(col("cell"),
        acos(least(lit(1.0), greatest(lit(-1.0),
          coalesce(try_divide(AnnSearch.dot(col("n_vec"), col("c_vec")),
            col("n_nrm") * col("c_nrm")), lit(1.0))))).as("ang"))
      .groupBy("cell").agg(max("ang").as("r"))
  }

  /** One map-side scan: cell assignment + PQ codes + exact norm (the
    * [[AnnSearch.ivfPqTopK]] projection, headed for parquet). */
  private def encode(corpus: DataFrame, centroids: DataFrame, book: PqBook): DataFrame = {
    val cents = AnnSearch.collectCentroids(centroids)
    corpus.select(
      graft.functions.NearestCells.topCells(col("vec"), cents, 1).getItem(0).as("cell"),
      col("id").as("n_id"),
      graft.functions.PqOps.codes(col("vec"), book).as("codes"),
      AnnSearch.norm(col("vec")).as("n_norm"))
  }

  /** Reload the persisted codebook. `snap`: pass the operation's
    * pinned snapshot for a repair-free committed-only read. */
  def loadBook(spark: SparkSession, indexDirOrRoot: String, snap: Snap = None): PqBook = {
    val indexDir = snap.map(_.dir).getOrElse(TableIndex.resolveDir(spark, indexDirOrRoot))
    if (snap.isEmpty) TableIndex.repair(spark, indexDir)
    // session-cached under the book table's file fingerprint — the
    // centroidSet rationale: one write per generation, one read+parse
    // per probe without the cache
    TableIndex.cachedDim[PqBook]("pqbook", spark, indexDir, "book.parquet", snap) { df =>
      val rows = df
        .select(col("sub").cast("int"), col("code").cast("int"), col("cw").cast("array<double>"))
        .collect()
      val m = rows.iterator.map(_.getInt(0)).max + 1
      val ksub = rows.iterator.map(_.getInt(1)).max + 1
      val books = Array.ofDim[Array[Double]](m, ksub)
      rows.foreach(r => books(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray)
      PqBook(m, books(0)(0).length, books.map(_.toArray))
    }.getOrElse(throw new IllegalStateException(
      s"$indexDir/book.parquet holds no committed data (index mid-build?)"))
  }

  /** Append new vectors: encode with the PERSISTED centroids/codebook,
    * union the encoded rows; centroid and book tables carry over
    * unchanged. Bit-identical to rebuilding over (old ∪ new) because
    * assignment and codes are pure map-side functions of (vector,
    * persisted dim tables). A pre-geometry legacy index carries no
    * radii forward — the new generation gets the shard's radii only,
    * and readers π-default the rest (correct, unpruned). */
  def append(spark: SparkSession, indexDirOrRoot: String, newVectors: DataFrame,
             outDir: String): Unit = {
    val indexDir = TableIndex.resolveDir(spark, indexDirOrRoot)
    TableIndex.repair(spark, indexDir)
    // captured BEFORE the reads: the new generation carries the
    // source's committed-bid HISTORY (seeded below) so replayed
    // pre-copy batch ids still skip after a manual pointer cutover
    val srcBids = TableIndex.committedBids(spark, indexDir)
    val centroids = spark.read.parquet(s"$indexDir/centroids.parquet")
    val book = loadBook(spark, indexDir)
    val freshRadii = cellRadii(newVectors, centroids)
    // max of maxes == rebuild's max over all members (bit-identical)
    val geometry = TableIndex.readTableIfExists(spark, indexDir, "geometry.parquet")
      .fold(freshRadii)(old => old.unionByName(freshRadii))
      .groupBy("cell").agg(max("r").as("r"))
    val floats = loadFloats(spark, indexDir).map(f =>
      ("floats.parquet", f.unionByName(floatRows(newVectors, centroids)), Seq("cell")))
    TableIndex.wipe(spark, outDir)
    TableIndex.commitBatch(spark, outDir, TableIndex.newBatchId("gen"), Seq(
      ("centroids.parquet", spark.read.parquet(s"$indexDir/centroids.parquet"), Seq.empty),
      ("book.parquet", spark.read.parquet(s"$indexDir/book.parquet"), Seq.empty),
      ("encoded.parquet",
        loadEncoded(spark, indexDir).unionByName(encode(newVectors, centroids, book)),
        Seq("cell")),
      ("geometry.parquet", geometry, Seq.empty)) ++ floats)
    TableIndex.seedCommittedHistory(spark, outDir, srcBids)
    ()
  }

  /** The O(new-shard) append: encode the new vectors with the
    * persisted dim tables and add their files UNDER the existing
    * cell partitions — the existing encoded rows are never read or
    * rewritten, so a shard lands in time proportional to the SHARD,
    * not the corpus ([[append]]'s generation-copy form rewrites
    * everything it carries over, which at 100 TB prices every hourly
    * shard at the full index; this form is the production
    * shard-cadence path and the reason [[compact]] exists — each call
    * adds one file wave per touched cell). Encoded rows and the
    * shard's per-cell radii commit under ONE atomic marker (see the
    * class doc: a torn encoded-without-geometry state would be
    * UNSOUND, unlike every other partial-geometry state); a replayed
    * `batchId` is skipped, and re-appending a tombstoned id throws.
    * Row-content contract identical to [[append]]: IvfIndexSpec pins
    * rows ≡ rebuild-over-union (layout differs, rows don't). */
  def appendInPlace(spark: SparkSession, indexDirOrRoot: String, newVectors: DataFrame,
                    batchId: Option[String] = None): Unit = {
    val bid = batchId.getOrElse(TableIndex.newBatchId())
    // root-addressed appends re-validate the generation pointer under
    // the commit's lease and retry across a concurrent swap
    // (graft.util.TableIndex.mutateCurrent): a shard committing into a
    // just-superseded generation would otherwise be invisible to every
    // post-swap root reader — lost, with no error
    TableIndex.mutateCurrent(spark, indexDirOrRoot) { (indexDir, reqCur) =>
      if (!TableIndex.isCommitted(spark, indexDir, bid)) { // replayed batch: skip
        TableIndex.repair(spark, indexDir)
        TableIndex.assertNotTombstoned(spark, indexDir,
          newVectors.select(col("id").cast("long").as("n_id")), "n_id")
        // session-cached dim tables rebuilt as local frames: the
        // shard-cadence append pays no parquet read for tables written
        // once per generation
        val centroids = centroidFrame(spark, indexDir)
        val book = loadBook(spark, indexDir)
        // per-shard maxes appended; readers normalize with a max over rows.
        // A floats-bearing index gets the shard's float rows in the SAME
        // commit — encoded-without-floats would silently lose the new
        // vectors from every exact-scoring path.
        val floats =
          if (TableIndex.readTableIfExists(spark, indexDir, "floats.parquet").isDefined)
            Seq(("floats.parquet", floatRows(newVectors, centroids), Seq("cell")))
          else Seq.empty
        TableIndex.commitBatch(spark, indexDir, bid, Seq(
          ("encoded.parquet", encode(newVectors, centroids, book), Seq("cell")),
          ("geometry.parquet", cellRadii(newVectors, centroids), Seq.empty)) ++ floats,
          requireCurrentOf = reqCur)
        ()
      }
    }
    ()
  }

  /** Continuous ingestion: each arriving micro-batch of (id, vec)
    * rows appends in place via [[appendInPlace]] — `foreachBatch` is
    * the idiomatic bridge from a stream to a non-streaming artifact,
    * and because the per-batch work is a pure function of (batch
    * rows, persisted dim tables), the resulting index is independent
    * of where micro-batch boundaries fall (spec-pinned: a 3-batch
    * feed produces row-for-row the same encoded table as one batch
    * build over the union). The checkpoint dir gives exactly-once
    * batch tracking across restarts, and the checkpoint-salted batch
    * id closes the replay window: a micro-batch redelivered after a
    * mid-write crash rolls back its torn files (repair) and a
    * redelivered COMMITTED batch is skipped — rows land exactly
    * once. */
  def ingestStream(indexDir: String, vectors: DataFrame, checkpointDir: String)
  : org.apache.spark.sql.streaming.StreamingQuery = {
    // path-NORMALIZED salt: a restart spelling the same checkpoint
    // differently must re-derive the same batch ids or the replay
    // window reopens (graft.util.TableIndex.checkpointSalt)
    val salt = TableIndex.checkpointSalt(vectors.sparkSession, checkpointDir)
    vectors.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) TableIndex.awaitingLease() {
          appendInPlace(batch.sparkSession, indexDir, batch.toDF(),
            batchId = Some(f"s${salt}_$batchId%010d"))
        }
      }
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** ONLINE embedding dedup — the [[graft.text.IncrementalDedup
    * .dedupStream]] loop for vectors: each arriving micro-batch is
    * checked EXACTLY (cosine ≥ τ, no recall knob) against the current
    * index via [[nearDupsExact]] plus the earlier-id rule within its
    * own batch ([[AnnSearch.cosineNearPairs]] — the text loop's batch
    * semantics: a vector is rejected iff it near-dups an INDEXED
    * vector or an earlier-id vector OF ITS OWN BATCH, so a rejected
    * earlier vector rejects same-batch successors but not later-batch
    * ones), and only the survivors enter the index.
    *
    * `corpusDir/vectors.parquet` is the loop's float source of truth:
    * [[nearDupsExact]] scores candidates against floats, and the PQ
    * index stores codes — so the loop maintains BOTH, appending each
    * batch's survivors to the float table and the encoded index under
    * the SAME checkpoint-salted batch id. Seed it with the indexed
    * generation's (id, vec) rows before starting. Decisions land in
    * `decisionsDir/decisions.parquet` (id, dup_emb, kept). All three
    * writes are [[graft.util.TableIndex]] protocol commits, so a
    * micro-batch replayed after a crash duplicates none of them —
    * the already-committed writes skip, the torn ones roll back and
    * redo. */
  def dedupStream(indexDir: String, corpusDir: String, vecStream: DataFrame,
                  decisionsDir: String, checkpointDir: String, tau: Double)
  : org.apache.spark.sql.streaming.StreamingQuery = {
    val salt = TableIndex.checkpointSalt(vecStream.sparkSession, checkpointDir)
    vecStream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) TableIndex.awaitingLease() {
          val spark = batch.sparkSession
          val bid = f"s${salt}_$batchId%010d"
          val b = batch.toDF().localCheckpoint(true)
          TableIndex.repair(spark, corpusDir)
          val corpus = TableIndex.readTableIfExists(spark, corpusDir, "vectors.parquet")
            .getOrElse(throw new IllegalStateException(
              s"IvfIndex.dedupStream: $corpusDir/vectors.parquet missing — seed it with the " +
                "indexed generation's float vectors before starting the stream"))
          val dupIdx = nearDupsExact(spark, indexDir, corpus, b, tau)
            .select(col("q_id").as("id")).distinct()
          // within-batch earlier-id rule: exact pairs via the closure
          // (the persisted centroids block it; exactness holds for ANY
          // centroid table), rejecting the larger id of each pair
          val centroids = centroidFrame(spark, TableIndex.resolveDir(spark, indexDir))
          val dupBatch = AnnSearch.cosineNearPairs(b, centroids, tau)
            .select(col("b").as("id")).distinct()
          val decisions = b.select(col("id"))
            .join(dupIdx.withColumn("di", lit(true)), Seq("id"), "left")
            .join(dupBatch.withColumn("db", lit(true)), Seq("id"), "left")
            .select(col("id"),
              (coalesce(col("di"), lit(false)) || coalesce(col("db"), lit(false))).as("dup_emb"))
            .withColumn("kept", !col("dup_emb"))
            .localCheckpoint(true)
          TableIndex.commitBatch(spark, decisionsDir, bid,
            Seq(("decisions.parquet", decisions, Seq.empty)))
          val survivors = b.join(decisions.filter(col("kept")).select("id"), Seq("id"))
            .localCheckpoint(true)
          TableIndex.commitBatch(spark, corpusDir, bid,
            Seq(("vectors.parquet", survivors, Seq.empty)))
          appendInPlace(spark, indexDir, survivors, batchId = Some(bid))
        }
      }
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** [[dedupStream]] against a FLOATS-BEARING index (built with
    * `storeFloats = true`): no side float-corpus directory to seed or
    * maintain — the index itself serves every float the exact scoring
    * needs (partition-pruned to the candidate cells), and each batch's
    * surviving float rows ride [[appendInPlace]]'s atomic commit. The
    * operationally simpler production form; the corpus-backed overload
    * remains for indexes that must not duplicate vector storage.
    * Throws at start if the index carries no float table. */
  def dedupStream(indexDir: String, vecStream: DataFrame,
                  decisionsDir: String, checkpointDir: String, tau: Double)
  : org.apache.spark.sql.streaming.StreamingQuery = {
    val salt = TableIndex.checkpointSalt(vecStream.sparkSession, checkpointDir)
    vecStream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) TableIndex.awaitingLease() {
          val spark = batch.sparkSession
          require(loadFloats(spark, indexDir).isDefined,
            s"IvfIndex.dedupStream (self-contained form): $indexDir carries no floats table — " +
              "build with storeFloats = true, or use the corpus-backed overload")
          val bid = f"s${salt}_$batchId%010d"
          val b = batch.toDF().localCheckpoint(true)
          val dupIdx = nearDupsExact(spark, indexDir, b, tau)
            .select(col("q_id").as("id")).distinct()
          val centroids = centroidFrame(spark, TableIndex.resolveDir(spark, indexDir))
          val dupBatch = AnnSearch.cosineNearPairs(b, centroids, tau)
            .select(col("b").as("id")).distinct()
          val decisions = b.select(col("id"))
            .join(dupIdx.withColumn("di", lit(true)), Seq("id"), "left")
            .join(dupBatch.withColumn("db", lit(true)), Seq("id"), "left")
            .select(col("id"),
              (coalesce(col("di"), lit(false)) || coalesce(col("db"), lit(false))).as("dup_emb"))
            .withColumn("kept", !col("dup_emb"))
            .localCheckpoint(true)
          TableIndex.commitBatch(spark, decisionsDir, bid,
            Seq(("decisions.parquet", decisions, Seq.empty)))
          val survivors = b.join(decisions.filter(col("kept")).select("id"), Seq("id"))
            .localCheckpoint(true)
          appendInPlace(spark, indexDir, survivors, batchId = Some(bid))
        }
      }
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Remove vectors by id — the index-maintenance half of a dedup or
    * takedown decision: once a pipeline drops documents, their vectors
    * must leave the index or every later probe re-surfaces them. A
    * pure anti-join on the ONLY corpus-sized table (`encoded`);
    * centroids and codebook are unaffected by removals (they are
    * trained artifacts, not per-row state), so deletion never re-keys
    * surviving codes. `ids` is a DataFrame — deletion lists at corpus
    * scale are themselves table-sized (a dedup pass can drop half the
    * corpus), so the filter must be a join, not a collected literal;
    * AQE picks broadcast when the list is small. IvfIndexSpec pins
    * delete ≡ rebuild-over-remaining bit-exactly. */
  def delete(spark: SparkSession, indexDirOrRoot: String, ids: DataFrame,
             outDir: String): Unit = {
    val indexDir = TableIndex.resolveDir(spark, indexDirOrRoot)
    TableIndex.repair(spark, indexDir)
    val srcBids = TableIndex.committedBids(spark, indexDir) // history carry (see append)
    // radii carry over STALE (an upper bound after removals) —
    // one-sided safe; [[refreshGeometry]] re-tightens. A pre-geometry
    // legacy index simply carries none (readers π-default).
    val geometry = TableIndex.readTableIfExists(spark, indexDir, "geometry.parquet")
      .map(g => ("geometry.parquet", g.groupBy("cell").agg(max("r").as("r")), Seq.empty[String]))
    val floats = loadFloats(spark, indexDir).map(f =>
      ("floats.parquet",
        f.join(ids.select(col("id").cast("long").as("n_id")), Seq("n_id"), "left_anti"),
        Seq("cell")))
    TableIndex.wipe(spark, outDir)
    TableIndex.commitBatch(spark, outDir, TableIndex.newBatchId("del"), Seq(
      ("centroids.parquet", spark.read.parquet(s"$indexDir/centroids.parquet"), Seq.empty),
      ("book.parquet", spark.read.parquet(s"$indexDir/book.parquet"), Seq.empty),
      ("encoded.parquet",
        loadEncoded(spark, indexDir)
          .join(ids.select(col("id").cast("long").as("n_id")), Seq("n_id"), "left_anti"),
        Seq("cell"))) ++ geometry ++ floats)
    TableIndex.seedCommittedHistory(spark, outDir, srcBids)
    ()
  }

  /** The O(delete-list) delete: append the ids to a TOMBSTONE table
    * instead of rewriting the corpus-sized encoded table ([[delete]]'s
    * generation-copy form prices a 10-row takedown at the full index —
    * the write-side analog of [[appendInPlace]] vs [[append]]). Every
    * read path ([[loadEncoded]], and therefore [[search]]'s probed
    * scan, [[append]], [[compact]]) applies the tombstones as an
    * anti-join — merge-on-read; AQE broadcasts the list while it is
    * small, and [[compact]] is the fold point that rewrites the
    * encoded table without the dead rows and drops the tombstone
    * table. IvfIndexSpec pins: search ≡ the rewrite-delete's search,
    * encoded files untouched by the delete itself, and compaction
    * folds to exactly the rebuild-over-remaining rows. Re-appending a
    * tombstoned id before a compact THROWS in [[appendInPlace]] (the
    * tombstone would suppress the new row too) — enforced, not
    * comment-only. */
  def deleteInPlace(spark: SparkSession, indexDirOrRoot: String, ids: DataFrame): Unit = {
    val bid = TableIndex.newBatchId("del")
    TableIndex.mutateCurrent(spark, indexDirOrRoot) { (indexDir, reqCur) =>
      TableIndex.commitBatch(spark, indexDir, bid,
        Seq(("tombstones.parquet", ids.select(col("id").cast("long").as("n_id")), Seq.empty)),
        requireCurrentOf = reqCur)
    }
    ()
  }

  /** Rewrite the encoded table with one file wave per cell partition.
    * Every [[append]] adds a file wave under each touched cell
    * directory; after many generations a probe opens
    * O(generations) small files per probed cell, and at production
    * shard cadence (hourly appends for months) the file count — not
    * the byte count — becomes the scan's cost. Compaction folds the
    * tombstones and collapses the geometry rows to one per cell (still
    * the stale upper bounds — run [[refreshGeometry]] on the new
    * generation to re-tighten them from the float corpus). IvfIndexSpec
    * pins rows bit-identical before/after and a strictly smaller file
    * count. Centroids and book are copied through untouched (they are
    * single-write dim tables). */
  def compact(spark: SparkSession, indexDirOrRoot: String, outDir: String,
              at: Snap = None): Unit = {
    val indexDir = at.map(_.dir).getOrElse(TableIndex.resolveDir(spark, indexDirOrRoot))
    // `at`: build from a PINNED committed view (compactPublish passes
    // one) — no repair (it could roll a concurrent writer's mid-move
    // batch back), no torn file waves; post-pin commits are the
    // publisher's catch-up (graft.util.TableIndex.catchUpAndPublish)
    if (at.isEmpty) TableIndex.repair(spark, indexDir)
    val geometry = TableIndex.readTable(spark, indexDir, "geometry.parquet", at)
      .map(g => ("geometry.parquet", g.groupBy("cell").agg(max("r").as("r")), Seq.empty[String]))
    // size-targeted parallelism WITHIN cells (per-cell byte-derived
    // salt — single pass): the pre-r14 repartition(col("cell")) made
    // every cell ONE task and one file — a hot semantic cluster (the
    // common case in a real corpus) serialized the whole fold
    // regardless of cluster size
    val floats = loadFloats(spark, indexDir, at).map { f =>
      ("floats.parquet",
        TableIndex.sizedKeyedRepartition(spark, indexDir, "floats.parquet", f, "cell", "n_id"),
        Seq("cell"))
    }
    TableIndex.wipe(spark, outDir)
    TableIndex.commitBatch(spark, outDir, TableIndex.newBatchId("compact"), Seq(
      ("centroids.parquet", dimTable(spark, indexDir, "centroids.parquet", at), Seq.empty),
      ("book.parquet", dimTable(spark, indexDir, "book.parquet", at), Seq.empty),
      ("encoded.parquet",
        TableIndex.sizedKeyedRepartition(spark, indexDir, "encoded.parquet",
          loadEncoded(spark, indexDir, at), "cell", "n_id"),
        Seq("cell"))
    ) ++ geometry ++ floats)
    ()
  }

  /** [[compact]] with the generation cutover made a LIBRARY guarantee
    * (the [[graft.text.IncrementalDedup.compactPublish]] shape):
    * compact the root's CURRENT generation into a fresh child
    * directory, then swap `root/_generation` atomically — only after
    * the new generation's commit marker lands. A crash anywhere leaves
    * the old generation authoritative; pinned snapshots survive the
    * swap; retire the superseded directory with
    * [[graft.util.TableIndex.retireGeneration]] once readers drain. */
  def compactPublish(spark: SparkSession, root: String): String = {
    val cur = TableIndex.resolveGeneration(spark, root).getOrElse(
      throw new IllegalStateException(
        s"$root carries no _generation pointer — build into a child directory and " +
          "publishGeneration it first"))
    // pin → rewrite from the pin → catch up late commits under the
    // source's writer lease → swap. Concurrent root-addressed writers
    // either land before the catch-up listing (carried over, same bid
    // — file copy is sound here: compaction retrains nothing the rows
    // are relative to) or retry against the new generation
    // (graft.util.TableIndex.mutateCurrent); replayed pre-swap bids
    // skip via the seeded history. No interleaving loses a batch.
    val snap = TableIndex.openSnapshot(spark, cur)
    val genName = "g" + java.util.UUID.randomUUID().toString.replace("-", "")
    val outDir = s"$root/$genName"
    compact(spark, cur, outDir, at = Some(snap))
    TableIndex.catchUpAndPublish(spark, root, cur, genName, snap.bids)
    outDir
  }

  /** [[recluster]] under the same published-cutover contract as
    * [[compactPublish]] — the drift-maintenance op is exactly the
    * "atomic-swap shape" whose cutover used to be prose: retrain on
    * the live corpus into a fresh generation, publish when committed. */
  def reclusterPublish(spark: SparkSession, root: String, corpus: DataFrame,
                       stride: Int, iters: Int = 2, retrainBook: Boolean = false,
                       bookStride: Int = 10): String = {
    val cur = TableIndex.resolveGeneration(spark, root).getOrElse(
      throw new IllegalStateException(
        s"$root carries no _generation pointer — build into a child directory and " +
          "publishGeneration it first"))
    val snap = TableIndex.openSnapshot(spark, cur)
    val genName = "g" + java.util.UUID.randomUUID().toString.replace("-", "")
    val outDir = s"$root/$genName"
    recluster(spark, cur, corpus, outDir, stride, iters, retrainBook, bookStride,
      at = Some(snap))
    // unlike compactPublish's file-copy carry, late APPEND batches here
    // must be RE-ENCODED: their codes and cell assignments are relative
    // to the centroids/book the recluster just retrained away
    TableIndex.catchUpAndPublishWith(spark, root, cur, genName, snap.bids)(
      late => carryReencoded(spark, cur, outDir, late))
    outDir
  }

  /** Recluster's catch-up carry ([[graft.util.TableIndex
    * .catchUpAndPublishWith]]): a batch committed to the source after
    * the recluster's pin cannot be file-copied — PQ codes and cell
    * assignments are relative to the RETRAINED centroids/book — so
    * append batches are re-encoded from their own float rows through
    * [[appendInPlace]] UNDER THE SAME BID (replay semantics carry
    * over), and tombstone batches file-copy (id lists are
    * model-independent). Appends run before tombstones, reproducing a
    * legal source order (a late delete of a late-appended id must find
    * the row present). A plain (no-floats) index cannot re-encode a
    * late append — that fails LOUD with the remedy named, instead of
    * publishing a generation that silently lost the shard. */
  private[graft] def carryReencoded(spark: SparkSession, srcDir: String, dstDir: String,
                                    late: Seq[String]): Unit = {
    if (late.isEmpty) return
    val kinds = late.map { bid =>
      (bid,
        TableIndex.batchRows(spark, srcDir, "encoded.parquet", bid).isDefined,
        TableIndex.batchRows(spark, srcDir, "tombstones.parquet", bid).isDefined)
    }
    val mixed = kinds.collect { case (bid, true, true) => bid }
    require(mixed.isEmpty,
      s"reclusterPublish: late batches ${mixed.mkString(", ")} carry BOTH encoded and " +
        "tombstone rows — no index mutation produces this; run fsck on the source")
    val appends = kinds.collect { case (bid, true, false) => bid }
    if (appends.nonEmpty &&
        TableIndex.readTableIfExists(spark, srcDir, "floats.parquet").isEmpty)
      throw new IllegalStateException(
        s"reclusterPublish: batches ${appends.mkString(", ")} committed to $srcDir after " +
          "the recluster's pinned snapshot, and a plain (no-floats) index cannot re-encode " +
          "them against the retrained centroids — quiesce appends around reclusterPublish, " +
          "or build with storeFloats = true")
    for (bid <- appends) {
      val vecs = TableIndex.batchRows(spark, srcDir, "floats.parquet", bid)
        .getOrElse(throw new IllegalStateException(
          s"reclusterPublish: late batch $bid has encoded rows but no float rows in $srcDir"))
        .select(col("n_id").as("id"), col("vec"))
      appendInPlace(spark, dstDir, vecs, batchId = Some(bid))
    }
    // everything else (tombstones; a replaceTable'd geometry refresh —
    // stale radii merge by max, still sound upper bounds) copies as-is
    TableIndex.copyBatches(spark, srcDir, dstDir,
      kinds.collect { case (bid, false, _) => bid })
  }

  /** Re-tighten the cell radii from the LIVE float corpus — the
    * maintenance op that stops post-delete staleness from
    * monotonically eroding the triangle bound's pruning (radii only
    * ever grow under append/delete/compact; after months of churn the
    * bound degrades toward all-cells). One aggregate over the corpus
    * (the [[build]]-time `cellRadii` shape) restricted to ids still
    * live in the index (semi-join against the tombstone-filtered
    * encoded ids — the caller's corpus may be a superset). The rewrite
    * is [[graft.util.TableIndex.replaceTable]]: not atomic end-to-end,
    * but every partial state is a subset of old ∪ new radii per cell,
    * and readers π-default a cell with no row — any crash degrades to
    * correct-but-unpruned, never to a missed pair. Spec-pinned:
    * refreshed radii ≤ stale radii, [[nearDupsExact]]'s candidate cell
    * set shrinks, results stay equal to brute force.
    *
    * Coverage is ENFORCED: the semi-join tolerates a SUPERSET corpus,
    * but a SUBSET would compute under-sized radii and the triangle
    * bound would then wrongly prune cells holding true near-dups —
    * the one direction the radii contract forbids. Any live indexed
    * id missing from `corpus` throws (one anti-join probe — this is a
    * maintenance op, not the query path). A floats-bearing index
    * refreshes from its OWN float table and ignores `corpus` (pass an
    * empty frame) — coverage holds by construction there. */
  def refreshGeometry(spark: SparkSession, indexDirOrRoot: String, corpus: DataFrame): Unit = {
    // stable bid across mutateCurrent retries: a refresh that loses the
    // swap race and retries against the new generation must not leave a
    // half-claimed bid behind
    val bid = TableIndex.newBatchId("geo")
    // root-addressed refreshes re-validate the pointer under the
    // replaceTable lease (requireCurrentOf) and retry across a
    // concurrent generation swap — without it a refresh racing a
    // compactPublish committed into the superseded directory and was
    // silently lost (stale-but-sound radii; wasted work), inconsistent
    // with the appendInPlace/deleteInPlace discipline
    TableIndex.mutateCurrent(spark, indexDirOrRoot) { (indexDir, reqCur) =>
      TableIndex.repair(spark, indexDir)
      val centroids = spark.read.parquet(s"$indexDir/centroids.parquet")
      val live = liveVectors(spark, indexDir, corpus, op = "refreshGeometry")
      TableIndex.replaceTable(spark, indexDir, bid,
        "geometry.parquet", cellRadii(live, centroids), requireCurrentOf = reqCur)
    }
    ()
  }

  /** The LIVE (id, vec) rows of an index, for maintenance ops that
    * retrain/re-measure from floats: a floats-bearing index serves its
    * own table (`corpus` ignored — the [[nearDupsExact]] precedence);
    * otherwise the caller's corpus is semi-joined to the live encoded
    * ids after PROVING it covers them all (one anti-join `limit(1)`
    * probe — a subset corpus would silently produce under-sized radii
    * or a centroid fit that misses live mass, the unsound direction). */
  private def liveVectors(spark: SparkSession, indexDir: String, corpus: DataFrame,
                          op: String, snap: Snap = None): DataFrame =
    loadFloats(spark, indexDir, snap) match {
      case Some(f) => f.select(col("n_id").as("id"), col("vec"))
      case None =>
        val liveIds = loadEncoded(spark, indexDir, snap).select(col("n_id").as("id"))
        val missing = liveIds
          .join(corpus.select(col("id")), Seq("id"), "left_anti").limit(1).count()
        require(missing == 0L,
          s"$op: the corpus argument is missing live indexed ids (index $indexDir) — " +
            "a subset corpus would silently break the index's exactness guarantees; " +
            "pass a corpus covering every live id, or build with storeFloats = true")
        corpus.join(liveIds, Seq("id"), "left_semi")
    }

  /** Retrain the centroid PLACEMENT (and optionally the PQ codebook)
    * on the live corpus and rebuild the index around it — the
    * maintenance op [[refreshGeometry]] cannot substitute for: radii
    * re-tightening keeps the triangle bound sound around STALE
    * centroids, but after generations of drifted appends the cells no
    * longer fit the data (a drifted cluster smears across cells whose
    * centroids sit elsewhere), so pruning fractions and ADC ranks
    * degrade even with tight radii. Reclustering re-seeds + Lloyd-
    * refines centroids on the LIVE vectors ([[AnnSearch
    * .kmeansCentroidsExact]] — bit-deterministic), re-encodes, and
    * writes a fresh generation directory. The cutover is a library
    * primitive: [[reclusterPublish]] builds into a fresh child of a
    * pointer-rooted index and swaps `root/_generation` atomically
    * once the commit marker lands ([[graft.util.TableIndex
    * .publishGeneration]]); this raw form leaves `outDir` unpublished
    * for callers composing their own roots. Tombstones fold (the
    * rebuild sees only live rows); `storeFloats` is inherited from the
    * source index. The codebook carries over by default (PQ codes are
    * a function of (vector, book) only — cell changes don't re-key
    * them); `retrainBook = true` refits it on the live corpus too, for
    * the ADC-rank half of drift. Exactness is unconditional throughout
    * ([[nearDupsExact]] holds for ANY centroid table); what recluster
    * restores is the PRUNING — spec-pinned: after drifted appends the
    * reclustered index's candidate-cell fraction recovers to
    * build-time levels while results stay ≡ brute force. */
  def recluster(spark: SparkSession, indexDirOrRoot: String, corpus: DataFrame, outDir: String,
                stride: Int, iters: Int = 2, retrainBook: Boolean = false,
                bookStride: Int = 10, at: Snap = None): Unit = {
    val indexDir = at.map(_.dir).getOrElse(TableIndex.resolveDir(spark, indexDirOrRoot))
    if (at.isEmpty) TableIndex.repair(spark, indexDir)
    val live = liveVectors(spark, indexDir, corpus, op = "recluster", snap = at)
      .localCheckpoint(false)
    val storeF = TableIndex.readTable(spark, indexDir, "floats.parquet", at).isDefined
    val centroids = AnnSearch.kmeansCentroidsExact(live, stride, iters)
    val book =
      if (retrainBook) {
        val old = loadBook(spark, indexDir, at)
        AnnSearch.pqBook(live, m = old.m, stride = bookStride)
      } else loadBook(spark, indexDir, at)
    build(live, centroids, book, outDir, storeFloats = storeF)
  }

  /** The LIVE encoded table: cell normalized back to long (partition-
    * column type inference narrows small directory keys to int), and
    * [[deleteInPlace]] tombstones applied as an anti-join (merge-on-
    * read) — the cell partition filter a caller stacks on top still
    * pushes through the join to the parquet scan. */
  private[graft] def loadEncoded(spark: SparkSession, indexDir: String,
                                 snap: Snap = None): DataFrame = {
    if (snap.isEmpty) TableIndex.repair(spark, indexDir)
    val raw = dimTable(spark, indexDir, "encoded.parquet", snap)
      .withColumn("cell", col("cell").cast("long"))
    TableIndex.liveTable(spark, indexDir, raw, "n_id", snap)
  }

  /** The encoded rows of ONE probe set — `cells` is driver-side small
    * (≤ nlist, the dim-table bound: distinct probed cells, not per-
    * query pairs) and lands in the scan as a partition `IN` filter, so
    * parquet prunes unprobed cells' files before reading a byte.
    * Factored out so the spec can pin the pruning on scan metrics. */
  private[graft] def probedEncoded(spark: SparkSession, indexDir: String, cells: Seq[Long],
                                   snap: Snap = None): DataFrame =
    loadEncoded(spark, indexDir, snap).filter(col("cell").isInCollection(cells))

  /** The broadcast (cell, c_vec, c_nrm, r) table [[nearDupsExact]]
    * bound-filters against: every centroid, LEFT-joined with the max
    * stored radius and π-defaulted when absent — geometry can
    * accelerate but never exclude a cell it knows nothing about
    * (legacy pre-geometry indexes, the [[refreshGeometry]] crash
    * window). */
  private[graft] def cellGeometry(spark: SparkSession, indexDir: String,
                                  snap: Snap = None): DataFrame = {
    // assembled on the DRIVER from the cached collected dims (no
    // parquet scan, no join job): between index mutations a probe's
    // dim side costs two listStatus fingerprints instead of ~0.4 s of
    // read+aggregate planning (dev/EmbStageProbe, before/after in
    // SCALE.md). Radii merge exactly like the old plan: max over rows
    // per cell, π when the cell has no row.
    import spark.implicits._
    val cs = centroidSet(spark, indexDir, snap)
    val radii = cachedRadii(spark, indexDir, snap)
    cs.ids.indices
      .map(i => (cs.ids(i), cs.vecs(i).toSeq, cs.norms(i),
        radii.getOrElse(cs.ids(i), math.Pi)))
      .toDF("cell", "c_vec", "c_nrm", "r")
  }

  /** The candidate (q_id, cell) pairs of one [[nearDupsExact]] probe:
    * query × broadcast cell-geometry bound filter (map-side, nlist
    * rows per query evaluated in the join predicate). Factored out so
    * the refresh spec can measure the candidate-cell shrink. */
  private[graft] def candidateCells(spark: SparkSession, indexDir: String,
                                    newVecs: DataFrame, tau: Double,
                                    snap: Snap = None): DataFrame = {
    val thetaTau = math.acos(math.max(-1.0, math.min(1.0, tau)))
    val slack = 1e-4
    val geom = broadcast(cellGeometry(spark, indexDir, snap))
    newVecs.select(col("id").as("q_id"),
        col("vec").cast("array<double>").as("q_vec"))
      .withColumn("q_nrm", AnnSearch.norm(col("q_vec")))
      .join(geom,
        acos(least(lit(1.0), greatest(lit(-1.0),
          coalesce(try_divide(AnnSearch.dot(col("q_vec"), col("c_vec")),
            col("q_nrm") * col("c_nrm")), lit(1.0)))))
          <= col("r") + lit(thetaTau + slack))
      .select(col("q_id"), col("q_vec"), col("q_nrm"), col("cell"))
  }

  /** EXACT incremental embedding dedup: every (new vector, indexed
    * vector) pair with cosine ≥ τ — the embedding analog of
    * [[graft.text.IncrementalDedup.processShard]]'s near check,
    * answered from the PERSISTED index with NO recall assumption.
    *
    * Exactness (the [[AnnSearch.cosineNearPairs]] triangle argument,
    * one-sided): for an indexed member m of cell c,
    * angle(q,m) ≤ angle(q,c) + r_c; so if sim(q,m) ≥ τ then
    * angle(q,c) ≤ r_c + θτ — cells failing that bound provably hold
    * no qualifying member and are skipped. The stored radii are upper
    * bounds by maintenance contract ([[build]]), so staleness widens
    * candidates, never drops one — and [[refreshGeometry]] re-tightens
    * them after churn.
    *
    * Plan shape: [[candidateCells]] bound filter, then the candidate
    * (query, cell) pairs join the encoded table — partition-pruned to
    * the DISTINCT candidate cells (≤ nlist values collected, the
    * [[probedEncoded]] discipline) — then the float corpus joins by id
    * for the exact score; only candidate-cell members are ever scored.
    * Within-shard pairs are out of scope (run
    * [[AnnSearch.cosineNearPairs]] on the shard itself; generations
    * partition the id space so the two pair sets are disjoint).
    *
    * Contract: `corpus` must cover every LIVE indexed id — the float
    * join is the scoring step, so an indexed id missing from `corpus`
    * silently loses its pairs (the one place this operator can be
    * wrong by mis-use rather than fail loud; a per-call subset check
    * would cost a corpus-wide join on the hot path). [[dedupStream]]
    * side-steps the foot-gun by maintaining its own float table in
    * lock-step with the index.
    *
    * Float-source PRECEDENCE: on a floats-bearing index (`storeFloats`
    * build) the index's OWN partition-pruned float table scores every
    * candidate and the `corpus` argument is IGNORED entirely — use the
    * no-corpus overload, which drops the ignored parameter outright.
    * On a plain index the caller's corpus is the float source, under
    * the coverage contract above.
    *
    * `snapshot = true` reads every index table through ONE pinned
    * [[graft.util.TableIndex.Snapshot]] (committed batches only, no
    * repair) — safe to run CONCURRENTLY with a writer's in-flight
    * commit: it sees the pre-batch index until the marker lands, and
    * because the pin is per-OPERATION, a batch committing between this
    * probe's table opens is all-or-nothing across encoded/geometry/
    * floats/tombstones (never a cross-table tear).
    *
    * `at`: a CALLER-pinned handle (supersedes `snapshot`) — pass the
    * same [[graft.util.TableIndex.openSnapshot]] result to several
    * probes/searches and they all answer from one frozen index state,
    * even while a writer commits between the calls. */
  def nearDupsExact(spark: SparkSession, indexDirOrRoot: String, corpus: DataFrame,
                    newVecs: DataFrame, tau: Double,
                    snapshot: Boolean = false,
                    at: Option[TableIndex.Snapshot] = None): DataFrame = {
    val snap = TableIndex.resolvePin(spark, indexDirOrRoot, snapshot, at)
    val indexDir = snap.map(_.dir).getOrElse(TableIndex.resolveDir(spark, indexDirOrRoot))
    if (snap.isEmpty) TableIndex.repair(spark, indexDir)
    val cand = candidateCells(spark, indexDir, newVecs, tau, snap).localCheckpoint(false)
    val candCells = cand.select("cell").distinct().collect().map(_.getLong(0)).toSeq
    // float source for exact scoring: see the precedence note above —
    // a floats-bearing index serves its OWN vectors partition-pruned
    // to the candidate cells (no corpus scan at all); otherwise the
    // caller's flat corpus joins by id (one corpus-side projection
    // scan per shard — the reason `storeFloats` exists)
    val memberVecs = loadFloats(spark, indexDir, snap) match {
      case Some(f) => f.filter(col("cell").isInCollection(candCells))
        .select(col("cell"), col("n_id"), col("vec").cast("array<double>").as("n_vec"))
      case None => probedEncoded(spark, indexDir, candCells, snap).select("cell", "n_id")
        .join(corpus.select(col("id").as("n_id"), col("vec").cast("array<double>").as("n_vec")),
          Seq("n_id"))
    }
    cand.join(memberVecs, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      // try_divide, no coalesce: a zero-norm side yields null sim,
      // which fails ≥ τ — a zero vector pairs with nothing (and a
      // plain `/` would throw under ANSI)
      .select(col("q_id"), col("n_id"),
        try_divide(AnnSearch.dot(col("q_vec"), col("n_vec")),
          col("q_nrm") * AnnSearch.norm(col("n_vec"))).as("sim"))
      .filter(col("sim") >= tau)
      .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("sim"))
  }

  /** [[nearDupsExact]] for a FLOATS-BEARING index, with no corpus
    * parameter: the index's own cell-pruned float table scores every
    * candidate, so the corpus argument the full signature carries is
    * ignored there by documented precedence — this overload removes
    * the empty-frame idiom that precedence forced on callers. Fails
    * loud on an index without a float table (there is genuinely no
    * float source to score from). */
  def nearDupsExact(spark: SparkSession, indexDirOrRoot: String, newVecs: DataFrame,
                    tau: Double, snapshot: Boolean, at: Option[TableIndex.Snapshot]): DataFrame = {
    val snap = TableIndex.resolvePin(spark, indexDirOrRoot, snapshot, at)
    val indexDir = snap.map(_.dir).getOrElse(TableIndex.resolveDir(spark, indexDirOrRoot))
    requireFloats(spark, indexDir, snap, "nearDupsExact")
    nearDupsExact(spark, indexDir, emptyVecFrame(spark), newVecs, tau, snapshot, snap)
  }

  /** Plain-read form of the no-corpus [[nearDupsExact]] overload. */
  def nearDupsExact(spark: SparkSession, indexDirOrRoot: String, newVecs: DataFrame,
                    tau: Double): DataFrame =
    nearDupsExact(spark, indexDirOrRoot, newVecs, tau, snapshot = false, at = None)

  private def emptyVecFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Array[Double])].toDF("id", "vec")
  }

  private def requireFloats(spark: SparkSession, indexDir: String, snap: Snap,
                            op: String): Unit =
    require(loadFloats(spark, indexDir, snap).isDefined,
      s"$op (no-corpus form): $indexDir carries no floats table — build with " +
        "storeFloats = true, or use the corpus-argument overload")

  /** IVFADC top-k against the persisted index: probe `nprobe` cells,
    * ADC-rank their CODE rows, exact-re-rank the `shortlist` against
    * the float corpus by id. Plan shape identical to
    * [[AnnSearch.ivfPqTopK]] except the encoded table is a parquet
    * scan (partition-prunable by cell at scale) instead of an
    * in-session materialization.
    *
    * Float-source PRECEDENCE (the [[nearDupsExact]] rule): on a
    * floats-bearing index the exact re-rank reads the index's OWN
    * cell-pruned float table and the `corpus` argument is IGNORED —
    * use the no-corpus overload, which drops the ignored parameter
    * outright. On a plain index the caller's corpus is the re-rank
    * source and must cover every live indexed id.
    *
    * `snapshot = true`: committed-batches-only reads under ONE pinned
    * snapshot, no repair — safe concurrent with an in-flight writer,
    * and immune to a commit landing between this search's table opens
    * (see [[nearDupsExact]]). */
  def search(spark: SparkSession, indexDirOrRoot: String, corpus: DataFrame, queries: DataFrame,
             k: Int, nprobe: Int, shortlist: Int, snapshot: Boolean = false,
             at: Option[TableIndex.Snapshot] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val snap = TableIndex.resolvePin(spark, indexDirOrRoot, snapshot, at)
    val indexDir = snap.map(_.dir).getOrElse(TableIndex.resolveDir(spark, indexDirOrRoot))
    if (snap.isEmpty) TableIndex.repair(spark, indexDir)
    val book = loadBook(spark, indexDir, snap)
    val cents = centroidSet(spark, indexDir, snap) // session-cached collect
    val probes = queries
      .select(col("id").as("q_id"), col("vec").as("q_vec"), AnnSearch.norm(col("vec")).as("q_norm"))
      .withColumn("cell", explode(graft.functions.NearestCells.topCells(col("q_vec"), cents, nprobe)))
      .localCheckpoint(false)
    // distinct probed cells, collected: ≤ nlist values (dim-table
    // bound), turned into a partition filter so the encoded scan never
    // opens an unprobed cell's files
    val probedCells = probes.select("cell").distinct().collect().map(_.getLong(0)).toSeq
    val shortIds = probes
      .join(probedEncoded(spark, indexDir, probedCells, snap), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (graft.functions.PqOps.adc(col("q_vec"), col("codes"), book)
          / (col("q_norm") * col("n_norm"))).as("adc"))
      .withColumn("arank", row_number().over(Window.partitionBy("q_id").orderBy(desc("adc"), col("n_id"))))
      .filter(col("arank") <= shortlist)
      .select("q_id", "n_id")
    val q = broadcast(queries.select(
      col("id").as("q_id"), col("vec").as("q_vec"), AnnSearch.norm(col("vec")).as("q_norm")))
    // exact re-rank floats: from the index's own cell-pruned float
    // table when it carries one (shortlist members live in probed
    // cells by construction), else the caller's corpus
    val rerankVecs = loadFloats(spark, indexDir, snap) match {
      case Some(f) => f.filter(col("cell").isInCollection(probedCells))
        .select(col("n_id"), col("vec").as("n_vec"))
      case None => corpus.select(col("id").as("n_id"), col("vec").as("n_vec"))
    }
    broadcast(shortIds)
      .join(rerankVecs, Seq("n_id"))
      .join(q, Seq("q_id"))
      .select(col("q_id"), col("n_id"),
        round(AnnSearch.dot(col("q_vec"), col("n_vec"))
          / (col("q_norm") * AnnSearch.norm(col("n_vec"))), 6).as("sim"))
      .withColumn("rank", row_number().over(Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** [[search]] for a FLOATS-BEARING index, with no corpus parameter
    * (the [[nearDupsExact]] no-corpus rule): the exact re-rank reads
    * the index's own cell-pruned float table. Fails loud on an index
    * without a float table. */
  def search(spark: SparkSession, indexDirOrRoot: String, queries: DataFrame,
             k: Int, nprobe: Int, shortlist: Int,
             snapshot: Boolean, at: Option[TableIndex.Snapshot]): DataFrame = {
    val snap = TableIndex.resolvePin(spark, indexDirOrRoot, snapshot, at)
    val indexDir = snap.map(_.dir).getOrElse(TableIndex.resolveDir(spark, indexDirOrRoot))
    requireFloats(spark, indexDir, snap, "search")
    search(spark, indexDir, emptyVecFrame(spark), queries, k, nprobe, shortlist, snapshot, snap)
  }

  /** Plain-read form of the no-corpus [[search]] overload. */
  def search(spark: SparkSession, indexDirOrRoot: String, queries: DataFrame,
             k: Int, nprobe: Int, shortlist: Int): DataFrame =
    search(spark, indexDirOrRoot, queries, k, nprobe, shortlist, snapshot = false, at = None)

  /** OFFLINE index check: the protocol-level namespace findings
    * ([[graft.util.TableIndex.fsck]]) plus this index's row-level
    * invariants — states the commit protocol cannot produce but a
    * manual copy, partial restore, or foreign writer can:
    *
    *  - `cell-orphan`: an encoded (or geometry) cell with no centroid
    *    row — its members are unreachable by any probe (search assigns
    *    probes from the centroid table) yet count as indexed;
    *  - `floats-parity` (floats-bearing index only): the encoded and
    *    float id sets diverge — a vector with codes but no floats
    *    silently drops out of every exact-scoring path, one with
    *    floats but no codes is invisible to candidate selection.
    *
    * Full-table scans by design: an offline maintenance pass. */
  def fsckIndex(spark: SparkSession, indexDirOrRoot: String): Seq[TableIndex.FsckFinding] = {
    val indexDir = TableIndex.resolveDir(spark, indexDirOrRoot)
    val proto = TableIndex.rootFindings(spark, indexDirOrRoot) ++
      TableIndex.fsck(spark, indexDir)
    val out = Seq.newBuilder[TableIndex.FsckFinding]
    // the diagnostic must NAME a missing mandatory table, not crash on
    // it — incident-damaged indexes are exactly what it inspects
    val centsOpt = TableIndex.readTableIfExists(spark, indexDir, "centroids.parquet")
      .map(_.select(col("c_id").cast("long").as("cell")))
    val encOpt = TableIndex.readTableIfExists(spark, indexDir, "encoded.parquet")
      .map(_.withColumn("cell", col("cell").cast("long")))
    for (t <- Seq("centroids" -> centsOpt, "book" ->
           TableIndex.readTableIfExists(spark, indexDir, "book.parquet"),
           "encoded" -> encOpt) if t._2.isEmpty)
      out += TableIndex.FsckFinding("missing-table", s"${t._1}.parquet holds no data")
    for (cents <- centsOpt; enc <- encOpt) {
      val encOrphans = enc.select("cell").distinct().join(cents, Seq("cell"), "left_anti").count()
      if (encOrphans > 0)
        out += TableIndex.FsckFinding("cell-orphan", s"encoded.parquet: $encOrphans cells without a centroid")
    }
    for (cents <- centsOpt;
         g <- TableIndex.readTableIfExists(spark, indexDir, "geometry.parquet")) {
      val geoOrphans = g.select(col("cell").cast("long").as("cell")).distinct()
        .join(cents, Seq("cell"), "left_anti").count()
      if (geoOrphans > 0)
        out += TableIndex.FsckFinding("cell-orphan", s"geometry.parquet: $geoOrphans cells without a centroid")
    }
    for (enc <- encOpt;
         f <- TableIndex.readTableIfExists(spark, indexDir, "floats.parquet")) {
      val fe = f.select(col("n_id")).distinct()
      val ee = enc.select(col("n_id")).distinct()
      val missing = ee.join(fe, Seq("n_id"), "left_anti").count()
      val extra = fe.join(ee, Seq("n_id"), "left_anti").count()
      if (missing > 0)
        out += TableIndex.FsckFinding("floats-parity", s"$missing encoded ids have no float row")
      if (extra > 0)
        out += TableIndex.FsckFinding("floats-parity", s"$extra float rows have no encoded row")
    }
    proto ++ out.result()
  }
}
