package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - `bfTopK`: brute-force cosine top-k — the correctness baseline.
  *    The (small) query set broadcasts; the corpus streams through one
  *    codegen'd projection (dot products via `aggregate`/`zip_with` —
  *    no UDFs), then a per-query top-k window. At 100 TB the corpus
  *    side never shuffles; the only exchange carries (query, candidate,
  *    sim) rows, O(|queries| · corpus) pre-top-k — use the IVF path
  *    when that product is too large.
  *  - `ivfTopK`: the scale path. A deterministic centroid table
  *    partitions the corpus into `nlist` cells (one broadcast-join
  *    assignment pass, materialize once, reuse per query batch);
  *    queries probe only their `nprobe` nearest cells, so the per-query
  *    candidate set shrinks by ~nlist/nprobe. Same exact scoring on the
  *    survivors.
  *
  * All arithmetic is double-precision with left-to-right accumulation so
  * results are deterministic and oracle-reproducible.
  */
object AnnSearch {

  /** Σ a_i·b_i in double precision (left-to-right, deterministic).
    * A native codegen expression — see [[graft.functions.DotProduct]]
    * for why this beats `aggregate(zip_with(...))` (HOFs run
    * interpreted per element; this is a compiled primitive loop with
    * bit-identical accumulation order). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k. `queries`/`corpus`: (id, vec) tables; the
    * query side is broadcast. Ties break on corpus id (deterministic).
    * Self-matches (same id) are excluded. */
  def bfTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // norms precomputed once per SIDE, not once per pair: the join
    // evaluates a single dot per candidate instead of three. The final
    // division keeps cosine's association (dot / (na·nb)), so sims are
    // bit-identical to the naive form.
    val q = broadcast(
      queries.select(col("id").as("q_id"), col("vec").as("q_vec"), norm(col("vec")).as("q_norm")))
    val scored = corpus
      .select(col("id").as("n_id"), col("vec").as("n_vec"), norm(col("vec")).as("n_norm"))
      .join(q, col("q_id") =!= col("n_id"))
      .withColumn("sim", dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Deterministic Lloyd refinement of the stride seeds: `iters`
    * rounds of assign (broadcast centroids, cosine argmax, ties →
    * smaller c_id) + recompute (per-cell elementwise mean via
    * posexplode/groupBy — partial-aggregated, no vector collect). On
    * clustered corpora this concentrates cells so small `nprobe`
    * probes recover the true neighbors; the IVF plumbing downstream is
    * unchanged. Each iteration is one broadcast join + one (cell, dim)
    * aggregate — at 100 TB the corpus streams once per iteration and
    * only (nlist × dim) rows shuffle. */
  def kmeansCentroids(corpus: DataFrame, stride: Int, iters: Int): DataFrame = {
    var centroids = strideCentroids(corpus, stride)
    for (_ <- 0 until iters) {
      val assigned = ivfAssign(corpus, centroids)
      centroids = assigned
        .select(col("cell"), posexplode(col("n_vec")).as(Seq("dim", "v")))
        .groupBy("cell", "dim")
        .agg(avg(col("v").cast("double")).as("m"))
        .groupBy(col("cell").as("c_id"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("c_id"), expr("transform(dm, x -> x.m)").as("c_vec"))
    }
    centroids
  }

  /** Deterministic centroid table: every `stride`-th corpus vector. At
    * scale this is a k-means refinement target; the IVF plumbing is
    * identical either way. */
  def strideCentroids(corpus: DataFrame, stride: Int): DataFrame =
    corpus
      .filter(pmod(col("id"), lit(stride)) === 0)
      .select(col("id").as("c_id"), col("vec").as("c_vec"))

  /** Assign each corpus vector to its nearest centroid (by cosine,
    * ties → smaller centroid id). One broadcast join + one top-1 window;
    * materialize the result and reuse it across query batches. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus
      .select(col("id").as("n_id"), col("vec").as("n_vec"))
      .crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("n_vec"), col("c_vec")))
      .withColumn("crank", row_number().over(Window.partitionBy("n_id").orderBy(desc("csim"), col("c_id"))))
      .filter(col("crank") === 1)
      .select(col("c_id").as("cell"), col("n_id"), col("n_vec"))

  /** IVF top-k: probe the `nprobe` nearest cells per query, exact-score
    * the candidates in those cells. */
  def ivfTopK(queries: DataFrame, assigned: DataFrame, centroids: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val probes = queries
      .select(col("id").as("q_id"), col("vec").as("q_vec"))
      .crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("q_vec"), col("c_vec")))
      .withColumn("crank", row_number().over(Window.partitionBy("q_id").orderBy(desc("csim"), col("c_id"))))
      .filter(col("crank") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("c_id").as("cell"))
    // per-side norms (see bfTopK): one dot per candidate in the scoring join
    probes
      .withColumn("q_norm", norm(col("q_vec")))
      .join(assigned.withColumn("n_norm", norm(col("n_vec"))), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")))
      .withColumn("rank", row_number().over(Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** All pairs (a < b) with cosine ≥ τ via cell-blocked comparison:
    * vectors are compared only within a cell and between a cell and its
    * probe-adjacent cells — never all-pairs. For exactness at small τ
    * use more probes. */
  def cosineNearPairs(corpus: DataFrame, centroids: DataFrame, tau: Double, nprobe: Int = 4): DataFrame = {
    val assigned = ivfAssign(corpus, centroids)
    // probe cells per vector: its nprobe nearest centroids
    val probes = corpus
      .select(col("id").as("n_id"), col("vec").as("n_vec"))
      .crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("n_vec"), col("c_vec")))
      .withColumn("crank", row_number().over(Window.partitionBy("n_id").orderBy(desc("csim"), col("c_id"))))
      .filter(col("crank") <= nprobe)
      .select(col("n_id").as("p_id"), col("n_vec").as("p_vec"), col("c_id").as("cell"))
    // symmetric blocking: a pair qualifies when EITHER side's probe set
    // reaches the other's home cell — doubles coverage for free.
    // Per-side norms: one dot per candidate pair; the (a,b,sim) distinct
    // still dedups because dot and the norm product are commutative
    // bit-exact, so both orientations of a pair produce the same sim.
    val joined = probes
      .withColumn("p_norm", norm(col("p_vec")))
      .join(
        assigned.select(
          col("cell"), col("n_id").as("h_id"), col("n_vec").as("h_vec"),
          norm(col("n_vec")).as("h_norm")),
        Seq("cell"))
      .filter(col("p_id") =!= col("h_id"))
      .select(
        least(col("p_id"), col("h_id")).as("a"),
        greatest(col("p_id"), col("h_id")).as("b"),
        (dot(col("p_vec"), col("h_vec")) / (col("p_norm") * col("h_norm"))).as("sim")
      )
    joined.distinct().filter(col("sim") >= tau)
  }
}
