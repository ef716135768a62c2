package graft.ml

import graft.functions.PqBook
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
  * Three parquet tables under one directory:
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
  *    shortlist re-rank).
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

  /** Write the four index tables for a corpus. `centroids`:
    * (c_id, c_vec); `book`: the PQ codebook to persist; `geometry`:
    * (cell, r) — each cell's ANGULAR RADIUS (max member-to-centroid
    * angle), the triangle-bound state [[nearDupsExact]] probes with.
    * Radii are UPPER BOUNDS by maintenance contract: appends max new
    * members in ([[appendInPlace]] appends per-shard maxes; readers
    * take max over rows), deletions leave them stale-but-larger —
    * one-sided safe, candidates can only widen, never drop. */
  def build(corpus: DataFrame, centroids: DataFrame, book: PqBook, outDir: String): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    centroids.select(col("c_id").cast("long"), col("c_vec").cast("array<double>"))
      .write.mode("overwrite").parquet(s"$outDir/centroids.parquet")
    book.books.zipWithIndex.flatMap { case (codewords, sub) =>
      codewords.zipWithIndex.map { case (cw, code) => (sub, code, cw.toSeq) }
    }.toSeq.toDF("sub", "code", "cw")
      .write.mode("overwrite").parquet(s"$outDir/book.parquet")
    encode(corpus, centroids, book)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$outDir/encoded.parquet")
    cellRadii(corpus, centroids)
      .write.mode("overwrite").parquet(s"$outDir/geometry.parquet")
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

  /** Reload the persisted codebook. */
  def loadBook(spark: SparkSession, indexDir: String): PqBook = {
    val rows = spark.read.parquet(s"$indexDir/book.parquet")
      .select(col("sub").cast("int"), col("code").cast("int"), col("cw").cast("array<double>"))
      .collect()
    val m = rows.iterator.map(_.getInt(0)).max + 1
    val ksub = rows.iterator.map(_.getInt(1)).max + 1
    val books = Array.ofDim[Array[Double]](m, ksub)
    rows.foreach(r => books(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray)
    PqBook(m, books(0)(0).length, books.map(_.toArray))
  }

  /** Append new vectors: encode with the PERSISTED centroids/codebook,
    * union the encoded rows; centroid and book tables carry over
    * unchanged. Bit-identical to rebuilding over (old ∪ new) because
    * assignment and codes are pure map-side functions of (vector,
    * persisted dim tables). */
  def append(spark: SparkSession, indexDir: String, newVectors: DataFrame, outDir: String): Unit = {
    val centroids = spark.read.parquet(s"$indexDir/centroids.parquet")
    val book = loadBook(spark, indexDir)
    spark.read.parquet(s"$indexDir/centroids.parquet")
      .write.mode("overwrite").parquet(s"$outDir/centroids.parquet")
    spark.read.parquet(s"$indexDir/book.parquet")
      .write.mode("overwrite").parquet(s"$outDir/book.parquet")
    loadEncoded(spark, indexDir)
      .unionByName(encode(newVectors, centroids, book))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$outDir/encoded.parquet")
    // max of maxes == rebuild's max over all members (bit-identical)
    spark.read.parquet(s"$indexDir/geometry.parquet")
      .unionByName(cellRadii(newVectors, centroids))
      .groupBy("cell").agg(max("r").as("r"))
      .write.mode("overwrite").parquet(s"$outDir/geometry.parquet")
  }

  /** The O(new-shard) append: encode the new vectors with the
    * persisted dim tables and add their files UNDER the existing
    * cell partitions (parquet append mode) — the existing encoded
    * rows are never read or rewritten, so a shard lands in time
    * proportional to the SHARD, not the corpus ([[append]]'s
    * generation-copy form rewrites everything it carries over, which
    * at 100 TB prices every hourly shard at the full index; this form
    * is the production shard-cadence path and the reason [[compact]]
    * exists — each call adds one file wave per touched cell).
    * Row-content contract identical to [[append]]: IvfIndexSpec pins
    * rows ≡ rebuild-over-union (layout differs, rows don't). */
  def appendInPlace(spark: SparkSession, indexDir: String, newVectors: DataFrame): Unit = {
    val centroids = spark.read.parquet(s"$indexDir/centroids.parquet")
    val book = loadBook(spark, indexDir)
    encode(newVectors, centroids, book)
      .write.mode("append").partitionBy("cell").parquet(s"$indexDir/encoded.parquet")
    // per-shard maxes appended; readers normalize with a max over rows
    cellRadii(newVectors, centroids)
      .write.mode("append").parquet(s"$indexDir/geometry.parquet")
  }

  /** Continuous ingestion: each arriving micro-batch of (id, vec)
    * rows appends in place via [[appendInPlace]] — `foreachBatch` is
    * the idiomatic bridge from a stream to a non-streaming artifact,
    * and because the per-batch work is a pure function of (batch
    * rows, persisted dim tables), the resulting index is independent
    * of where micro-batch boundaries fall (spec-pinned: a 3-batch
    * feed produces row-for-row the same encoded table as one batch
    * build over the union). The checkpoint dir gives exactly-once
    * batch tracking across restarts; parquet-append within a batch is
    * atomic per file, so a replayed batch after a mid-write crash can
    * duplicate rows — production would dedup by (n_id) at compact
    * time or write batch-id-named files; documented, not hidden. */
  def ingestStream(indexDir: String, vectors: DataFrame, checkpointDir: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) appendInPlace(batch.sparkSession, indexDir, batch.toDF())
      }
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .start()

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
  def delete(spark: SparkSession, indexDir: String, ids: DataFrame, outDir: String): Unit = {
    spark.read.parquet(s"$indexDir/centroids.parquet")
      .write.mode("overwrite").parquet(s"$outDir/centroids.parquet")
    spark.read.parquet(s"$indexDir/book.parquet")
      .write.mode("overwrite").parquet(s"$outDir/book.parquet")
    loadEncoded(spark, indexDir)
      .join(ids.select(col("id").cast("long").as("n_id")), Seq("n_id"), "left_anti")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$outDir/encoded.parquet")
    // radii carry over STALE (an upper bound after removals) —
    // one-sided safe for the triangle probe, documented in [[build]]
    spark.read.parquet(s"$indexDir/geometry.parquet")
      .groupBy("cell").agg(max("r").as("r"))
      .write.mode("overwrite").parquet(s"$outDir/geometry.parquet")
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
    * folds to exactly the rebuild-over-remaining rows. Constraint: a
    * tombstoned id must never be re-appended before a compact (the
    * tombstone would suppress the new row too) — consistent with the
    * index-wide rule that generations partition the id space. */
  def deleteInPlace(spark: SparkSession, indexDir: String, ids: DataFrame): Unit =
    ids.select(col("id").cast("long").as("n_id"))
      .write.mode("append").parquet(s"$indexDir/tombstones.parquet")

  private def tombstones(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones.parquet")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) Some(spark.read.parquet(path.toString)) else None
  }

  /** Rewrite the encoded table with one file per cell partition.
    * Every [[append]] adds a file wave under each touched cell
    * directory; after many generations a probe opens
    * O(generations) small files per probed cell, and at production
    * shard cadence (hourly appends for months) the file count — not
    * the byte count — becomes the scan's cost. Compaction is a pure
    * layout rewrite: IvfIndexSpec pins rows bit-identical before/after
    * and a strictly smaller file count. Centroids and book are copied
    * through untouched (they are single-write dim tables). */
  def compact(spark: SparkSession, indexDir: String, outDir: String): Unit = {
    spark.read.parquet(s"$indexDir/centroids.parquet")
      .write.mode("overwrite").parquet(s"$outDir/centroids.parquet")
    spark.read.parquet(s"$indexDir/book.parquet")
      .write.mode("overwrite").parquet(s"$outDir/book.parquet")
    loadEncoded(spark, indexDir)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$outDir/encoded.parquet")
    spark.read.parquet(s"$indexDir/geometry.parquet")
      .groupBy("cell").agg(max("r").as("r"))
      .write.mode("overwrite").parquet(s"$outDir/geometry.parquet")
  }

  /** The LIVE encoded table: cell normalized back to long (partition-
    * column type inference narrows small directory keys to int), and
    * [[deleteInPlace]] tombstones applied as an anti-join (merge-on-
    * read) — the cell partition filter a caller stacks on top still
    * pushes through the join to the parquet scan. */
  private[graft] def loadEncoded(spark: SparkSession, indexDir: String): DataFrame = {
    val raw = spark.read.parquet(s"$indexDir/encoded.parquet")
      .withColumn("cell", col("cell").cast("long"))
    tombstones(spark, indexDir)
      .fold(raw)(t => raw.join(t.select("n_id").distinct(), Seq("n_id"), "left_anti"))
  }

  /** The encoded rows of ONE probe set — `cells` is driver-side small
    * (≤ nlist, the dim-table bound: distinct probed cells, not per-
    * query pairs) and lands in the scan as a partition `IN` filter, so
    * parquet prunes unprobed cells' files before reading a byte.
    * Factored out so the spec can pin the pruning on scan metrics. */
  private[graft] def probedEncoded(spark: SparkSession, indexDir: String, cells: Seq[Long]): DataFrame =
    loadEncoded(spark, indexDir).filter(col("cell").isInCollection(cells))

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
    * candidates, never drops one.
    *
    * Plan shape: query × broadcast(geometry ⋈ centroids) bound filter
    * (map-side, nlist rows per query evaluated in the join predicate),
    * candidate (query, cell) pairs join the encoded table — partition-
    * pruned to the DISTINCT candidate cells (≤ nlist values collected,
    * the [[probedEncoded]] discipline) — then the float corpus joins
    * by id for the exact score; only candidate-cell members are ever
    * scored. Within-shard pairs are out of scope (run
    * [[AnnSearch.cosineNearPairs]] on the shard itself; generations
    * partition the id space so the two pair sets are disjoint). */
  def nearDupsExact(spark: SparkSession, indexDir: String, corpus: DataFrame,
                    newVecs: DataFrame, tau: Double): DataFrame = {
    val thetaTau = math.acos(math.max(-1.0, math.min(1.0, tau)))
    val slack = 1e-4
    val centroids = spark.read.parquet(s"$indexDir/centroids.parquet")
    val geom = broadcast(
      spark.read.parquet(s"$indexDir/geometry.parquet")
        .groupBy("cell").agg(max("r").as("r"))
        .join(centroids.select(col("c_id").cast("long").as("cell"),
          col("c_vec").cast("array<double>").as("c_vec")), Seq("cell"))
        .withColumn("c_nrm", AnnSearch.norm(col("c_vec"))))
    val q = newVecs.select(col("id").as("q_id"),
        col("vec").cast("array<double>").as("q_vec"))
      .withColumn("q_nrm", AnnSearch.norm(col("q_vec")))
    val cand = q.join(geom,
      acos(least(lit(1.0), greatest(lit(-1.0),
        coalesce(try_divide(AnnSearch.dot(col("q_vec"), col("c_vec")),
          col("q_nrm") * col("c_nrm")), lit(1.0)))))
        <= col("r") + lit(thetaTau + slack))
      .select(col("q_id"), col("q_vec"), col("q_nrm"), col("cell"))
      .localCheckpoint(false)
    val candCells = cand.select("cell").distinct().collect().map(_.getLong(0)).toSeq
    val members = probedEncoded(spark, indexDir, candCells).select("cell", "n_id")
    cand.join(members, Seq("cell"))
      .join(corpus.select(col("id").as("n_id"), col("vec").cast("array<double>").as("n_vec")),
        Seq("n_id"))
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

  /** IVFADC top-k against the persisted index: probe `nprobe` cells,
    * ADC-rank their CODE rows, exact-re-rank the `shortlist` against
    * the float corpus by id. Plan shape identical to
    * [[AnnSearch.ivfPqTopK]] except the encoded table is a parquet
    * scan (partition-prunable by cell at scale) instead of an
    * in-session materialization. */
  def search(spark: SparkSession, indexDir: String, corpus: DataFrame, queries: DataFrame,
             k: Int, nprobe: Int, shortlist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = spark.read.parquet(s"$indexDir/centroids.parquet")
    val book = loadBook(spark, indexDir)
    val cents = AnnSearch.collectCentroids(centroids)
    val probes = queries
      .select(col("id").as("q_id"), col("vec").as("q_vec"), AnnSearch.norm(col("vec")).as("q_norm"))
      .withColumn("cell", explode(graft.functions.NearestCells.topCells(col("q_vec"), cents, nprobe)))
      .localCheckpoint(false)
    // distinct probed cells, collected: ≤ nlist values (dim-table
    // bound), turned into a partition filter so the encoded scan never
    // opens an unprobed cell's files
    val probedCells = probes.select("cell").distinct().collect().map(_.getLong(0)).toSeq
    val shortIds = probes
      .join(probedEncoded(spark, indexDir, probedCells), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (graft.functions.PqOps.adc(col("q_vec"), col("codes"), book)
          / (col("q_norm") * col("n_norm"))).as("adc"))
      .withColumn("arank", row_number().over(Window.partitionBy("q_id").orderBy(desc("adc"), col("n_id"))))
      .filter(col("arank") <= shortlist)
      .select("q_id", "n_id")
    val q = broadcast(queries.select(
      col("id").as("q_id"), col("vec").as("q_vec"), AnnSearch.norm(col("vec")).as("q_norm")))
    broadcast(shortIds)
      .join(corpus.select(col("id").as("n_id"), col("vec").as("n_vec")), Seq("n_id"))
      .join(q, Seq("q_id"))
      .select(col("q_id"), col("n_id"),
        round(AnnSearch.dot(col("q_vec"), col("n_vec"))
          / (col("q_norm") * AnnSearch.norm(col("n_vec"))), 6).as("sim"))
      .withColumn("rank", row_number().over(Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }
}
