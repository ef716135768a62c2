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
    for (t <- Seq("hashes", "sigs", "shingles")) {
      assert(tableSorted(s"$gen2/$t.parquet") == tableSorted(s"$rebuilt/$t.parquet"),
        s"updated index table $t diverged from the from-scratch rebuild")
    }
    // and the survivors are a meaningful subset (not all, not none)
    val (nShard, nKept) = (shard.count(), survivors.count())
    assert(nKept > 0 && nKept < nShard,
      s"degenerate fixture split: kept $nKept of $nShard shard docs")
  }
}
