package graft

/** Driver-contract guards: every conformance query must carry a DuckDB
  * oracle (a missing one silently downgrades that operator to a
  * rows-only check), and the flagship entry must produce rows. */
class SparkEntrySpec extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    // Intentional rows-only checks, each with the reason an ANSI-SQL
    // oracle cannot exist. Everything else missing an oracle is a bug.
    val rowsOnly = Set(
      "bpe_train_1k", // 1,000 merges = a 1,000-stage chained CTE; the
                      // N=50 engine/engine equality lives in BpeSpec
      "bpe_encode_1k" // same 1,000-stage ceiling; expr ≡ typed encode
                      // equality lives in BpeSpec
    )
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q diff o diff rowsOnly).isEmpty,
      s"queries without oracle: ${(q diff o diff rowsOnly).toSeq.sorted}")
    assert((o diff q).isEmpty, s"orphan oracles: ${(o diff q).toSeq.sorted}")
    assert((rowsOnly diff q).isEmpty, s"stale rows-only entries: ${(rowsOnly diff q).toSeq.sorted}")
  }

  test("flagship entry produces rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("LSH bucket cap drops degenerate buckets instead of exploding the candidate join") {
    import spark.implicits._
    // 300 identical docs form one bucket per band → ~45k candidate
    // pairs each without the cap; with it the oversized bucket is
    // skipped entirely (exact dedup owns identical content)
    val docs = (0L until 300L).map(i => (i, "the same exact document text repeated " * 8)).toDF("doc_id", "text")
    val sigs = graft.text.MinHashLsh.signatures(docs, "doc_id", "text")
    val uncapped = graft.text.MinHashLsh.candidatePairs(sigs, "doc_id", bands = 8, maxBucket = 1000000).count()
    val capped = graft.text.MinHashLsh.candidatePairs(sigs, "doc_id", bands = 8, maxBucket = 50).count()
    assert(uncapped == 300L * 299 / 2, s"expected full blowup uncapped, got $uncapped")
    assert(capped == 0L, s"cap should drop the degenerate bucket, got $capped")
  }
}
