package graft

/** Physical-plan audits (builder brief: ".explain the plan and iterate until
  * it's the plan you'd want"): filters reach the parquet scan, column
  * pruning holds, small dimensions broadcast, top-1-per-group becomes
  * WindowGroupLimit, and the window-rank scheduler shuffles exactly once.
  */
class PlanSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q11 enrich: filter pushed to parquet scan + broadcast hash join") {
    val p = planOf("q11_j1_enrich_bhj")
    assert(p.contains("PushedFilters:") &&
      p.matches("(?s).*PushedFilters: \\[[^\\]]*IsNotNull\\(o_custkey\\).*"),
      s"expected pushed filters in scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast hash join")
  }

  test("q11 enrich: column pruning — scan reads only needed orders columns") {
    val p = planOf("q11_j1_enrich_bhj")
    // orders scan must not read o_orderdate / o_orderpriority
    val scanLine = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!scanLine.contains("o_orderdate") && !scanLine.contains("o_orderpriority"),
      s"unpruned columns in scan:\n$scanLine")
  }

  test("q03 priority pick: top-1-per-group runs as WindowGroupLimit") {
    val p = planOf("q03_w1_priority_pick")
    assert(p.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit rewrite:\n$p")
  }

  test("q26 jaccard: LSH-banded blocking, no all-pairs join shape") {
    val p = planOf("q26_dedup_ngram_jaccard")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"all-pairs (non-equi) join shape leaked back:\n$p")
    // candidate pairs: codegen'd equi-join on the band key + distinct with
    // map-side partial dedup before the shuffle (not an interpreted
    // bucket-collect explode)
    assert(p.contains("partial"),
      s"expected partial (map-side) dedup aggregate in pair generation:\n$p")
  }

  test("q26 jaccard: no exchange keyed on the word-set array") {
    // group collapse + membership join ride a 60-bit scalar set-hash; an
    // exchange hash-partitioned on the array<bigint> word set would shuffle
    // (and compare) the full arrays — the round-3 verdict's last q26 cost
    val p = planOf("q26_dedup_ngram_jaccard")
    val arrayKeyed = p.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning(ws#")).toSeq
    assert(arrayKeyed.isEmpty,
      s"exchange keyed on the word-set array:\n${arrayKeyed.mkString("\n")}")
  }

  test("corpus-sized join sides carry no forced broadcast hint (q24/q26/q29/q30/q37/q44/q46/q49)") {
    // scale rule: broadcast() of an unbounded table OOMs at 100 TB; only
    // AQE's runtime size measurement may pick a broadcast. A forced hint
    // shows up as ResolvedHint in the analyzed plan.
    for (n <- Seq("q24_dedup_minhash_pairs", "q26_dedup_ngram_jaccard",
        "q29_ann_ivf_cell", "q30_dedup_embed_nn", "q37_ann_lsh_hyperplane",
        "q44_dedup_simhash_pairs", "q46_dedup_simhash_b6",
        "q49_dedup_simhash_incremental")) {
      val df = SparkEntry.queries(n)(spark, dir)
      val analyzed = df.queryExecution.analyzed.toString
      assert(!analyzed.contains("ResolvedHint"),
        s"$n forces a broadcast of a corpus-sized table:\n$analyzed")
    }
  }

  test("scheduler rank+budget: exactly one exchange (host) feeds both window functions") {
    val df = SparkEntry.queries("q07_t4_politeness_budget")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    // rank + running sum share the same (host) partitioning: one hash
    // exchange, not two
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
  }

  test("scheduler pre-cut: budget-derived rank filter runs as WindowGroupLimit") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    import graft.operators.Sched
    val rows = (0 until 2000).map { i =>
      (s"https://h${i % 7}.example.com/p/$i", s"h${i % 7}.example.com",
        i % 4, 1.0 / (1 + i % 9))
    }.toDF("canon_url", "host", "depth", "score")
      .withColumn("crawl_delay_ms", lit(500L))
    val p = Sched.rankAndBudget(rows, 10000L, Sched.MinCrawlDelayMs)
      .queryExecution.executedPlan.toString
    // the rank<=cut filter must rewrite to per-partition top-k insertion —
    // at a 10^10-row pending set this is the difference between a full
    // per-host sort and a bounded heap per host
    assert(p.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pre-cut rewrite:\n$p")
    // and the cum-sum window must reuse the host partitioning: still one
    // hash exchange total
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
  }

  test("q22 exact dedup: partial (map-side) aggregation before the shuffle") {
    val p = planOf("q22_dedup_exact")
    assert(p.contains("partial_count") || p.contains("partial"),
      s"expected partial aggregation:\n$p")
  }
}
