package graft

/** Driver-contract guards: every conformance query must carry a DuckDB
  * oracle (a missing one silently downgrades that operator to a
  * rows-only check), and the flagship entry must produce rows. */
class SparkEntrySpec extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    // r9: the former rows-only cells (bpe_train_1k / bpe_encode_1k —
    // no ANSI-SQL oracle can exist; engine-side equality in BpeSpec)
    // moved to the bench-only scaleQueries registry, so the driver
    // catalog is STRICTLY oracled: any query without an oracle is a bug.
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q diff o).isEmpty, s"queries without oracle: ${(q diff o).toSeq.sorted}")
    assert((o diff q).isEmpty, s"orphan oracles: ${(o diff q).toSeq.sorted}")
  }

  test("scale-contrast registry is disjoint from the driver catalog and bench-resolvable") {
    val scale = SparkEntry.scaleQueries.keySet
    assert(scale.nonEmpty)
    assert((scale intersect SparkEntry.queries.keySet).isEmpty,
      "scaleQueries must not shadow driver-gated queries")
    assert(scale.subsetOf(Bench.catalog.keySet))
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
