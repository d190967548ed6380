package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ckpt.SnapshotStore
import graft.fetch.FetchSim
import graft.functions.Canon
import graft.operators.{Bloom, Extract, Sched, Seen}

/** Epoch-loop crawl engine (SURVEY.md §3.1 Spark trace; north rule).
  *
  * One epoch = one batch job (the reference runs one job at a time behind
  * its `is_crawling_running` flag, src/main.py:56-62 — T1): rank the pending
  * frontier per host under the virtual-time politeness budget, fetch the
  * batch through the partition-local simulator, extract + canonicalize
  * outbound URLs, drop seen ones (Bloom prefilter + exact anti-join), and
  * commit frontier/seen/lineage/metrics as one atomic snapshot. Every epoch
  * is resumable: state lives only in the snapshot store.
  */
final class EpochDriver(
    spark: SparkSession,
    store: SnapshotStore,
    seed: Long,
    nHosts: Int,
    epochBudgetMs: Long = 10000L,
    saltBuckets: Int = 64,
    maxRetries: Int = 3,
    bloomSegments: Int = 8,
    bloomBitsPerSegment: Int = 1 << 16,
    useBloom: Boolean = true,
    // route the Bloom probe by segment (filterUnseenRouted) instead of
    // broadcasting the merged filter — the ≥10^10.5-URL geometry where no
    // merged array fits anywhere (BASELINE.md). Pure execution strategy:
    // results are identical (EngineSpec), so not resume-guarded
    bloomRouted: Boolean = false,
    // fold seen epoch partitions every N epochs (0 = off); purely a
    // file-count/scan-cost optimization — set semantics are unchanged, so
    // it is NOT part of the resume-guarded config
    compactSeenEvery: Int = 0,
    // K1/K2 external sink (file-backed stand-in for the reference's Kafka
    // REST bridge): per-epoch fresh records batch-emitted from the
    // executors, plus one job-control completion message per epoch.
    // Side-effecting and at-least-once across crash/retry (batch files are
    // idempotent per partition) — the exact-once state stays in the
    // snapshot store, exactly like the reference's DB-vs-Kafka split
    sinkDir: Option[String] = None) {

  import spark.implicits._

  private val defaultDelayMs = 2500L
  private val robots = Sched.robotsDf(spark,
    (0 until nHosts).map(graft.gen.SimWeb.hostName), seed)

  /** Engine parameters that define crawl semantics, persisted into every
    * snapshot manifest and require-matched on resume: re-invoking with
    * different CLI args would otherwise silently continue the crawl under
    * different scheduling/dedup semantics (and mismatched Bloom geometry
    * would mis-route segment probes).
    */
  private val cfg: Map[String, Long] = Map(
    "cfg_seed" -> seed,
    "cfg_n_hosts" -> nHosts.toLong,
    "cfg_epoch_budget_ms" -> epochBudgetMs,
    "cfg_salt_buckets" -> saltBuckets.toLong,
    "cfg_max_retries" -> maxRetries.toLong,
    "cfg_bloom_segments" -> bloomSegments.toLong,
    "cfg_bloom_bits" -> bloomBitsPerSegment.toLong,
    "cfg_bloom_hash_version" -> Bloom.HashVersion)

  /** Guard keys added after stores already existed: a manifest missing the
    * key is treated as having the value the code shipped with before the
    * key was introduced, so a semantic change older than its guard key
    * still refuses to resume instead of silently corrupting (a v1-hashed
    * seen_bloom probed with v2 hashes returns false negatives — seen URLs
    * would re-enter the frontier as fresh).
    */
  private val cfgLegacyDefaults: Map[String, Long] =
    Map("cfg_bloom_hash_version" -> 1L)

  private def requireCfgMatch(counters: Map[String, Long]): Unit =
    cfg.foreach { case (k, v) =>
      counters.get(k).orElse(cfgLegacyDefaults.get(k)).foreach(pv =>
        require(pv == v,
          s"resume config mismatch: $k snapshot=$pv, this driver=$v"))
    }

  /** Initialize snapshot v0 from the ordered seed list. */
  def init(seedUrls: Seq[String]): Unit = {
    require(store.latest().isEmpty, "store already initialized")
    val raw = seedUrls.toDF("url")
    val canoned = Canon.canonicalize(raw, "url", "https://unknown.example.com")
      .filter(Canon.isHttp(col("canon_url")))
      .select("canon_url", "host").distinct()
    val frontier = Sched.allowed(canoned, robots, defaultDelayMs)
      .select(col("canon_url"), col("host"),
        lit(0).as("depth"), lit(1.0).as("score"),
        lit("pending").as("state"), lit(0).as("retry_count"),
        lit(0L).as("discovered_epoch"))
    val seen = frontier.select("canon_url")
    // bucketed seen append is idempotent per epoch (dynamic partition
    // overwrite), so writing it before the manifest commit preserves
    // all-or-nothing resume semantics: an uncommitted epoch partition is
    // both invisible to readers (epoch gate) and overwritten on re-run
    store.appendSeen(seen, 0L)
    store.commit(0L,
      replace = Map("frontier" -> frontier),
      append = Map(
        "seen_bloom" -> Bloom.buildSegments(seen, "canon_url", bloomSegments, bloomBitsPerSegment)),
      counters = cfg + ("seeds" -> frontier.count()),
      partitionedBy = Map("frontier" -> "state"))
    ()
  }

  /** Run one epoch on top of the latest snapshot; returns epoch metrics. */
  def runEpoch(): Map[String, Long] = {
    val m = store.latest().getOrElse(sys.error("store not initialized"))
    requireCfgMatch(m.counters)
    val epoch = m.epoch + 1
    val frontier = store.readTable(m, "frontier").get
    // bucketed scan: the (huge, append-only) seen side of the anti-join
    // arrives pre-partitioned by hash(canon_url) — no big-side Exchange
    val seen = store.readSeen(m.epoch)

    // ---- schedule: W2 rank + T4 budget over the pending frontier
    val pending = frontier.filter(col("state") === "pending")
      .join(broadcast(robots.select("host", "crawl_delay_ms")), Seq("host"), "left")
      .withColumn("crawl_delay_ms", coalesce(col("crawl_delay_ms"), lit(defaultDelayMs)))
    val ranked = Sched.rankAndBudget(pending, epochBudgetMs)
    val batch = Sched.fetchBatch(ranked, epoch, saltBuckets,
      spark.sparkContext.defaultParallelism)

    // ---- fetch (S1) — salted partitions, partition-local lineage
    val fetched = FetchSim.run(batch, seed, nHosts).cache()
    val okDocs = fetched.filter(_.status == "ok")
      .map(f => (f.canon_url, f.depth, f.spans)).toDF("doc_id", "depth", "spans")

    // ---- extract (S2/D2) + canon (X14) + robots filter (J3/F3)
    val cand = Extract.canonCandidates(okDocs.select("doc_id", "spans"))
    val candAllowed = Sched.allowed(cand, robots, defaultDelayMs)
      .select("canon_url", "host", "src_doc")
    val candDepth = candAllowed
      .join(okDocs.select(col("doc_id").as("src_doc"), col("depth")), Seq("src_doc"))
      .groupBy("canon_url", "host")
      .agg((min("depth") + 1).cast("int").as("depth"))
      .cache()
    val nDiscovered = candDepth.count()

    // ---- dedup vs seen: Bloom prefilter (D3) + exact anti-join (J2).
    // Segment merge runs on the executors (one final blob per segment
    // reaches the driver); the broadcast handle is destroyed at the end of
    // the epoch so filter blobs never accumulate across epochs
    val segTable = if (useBloom) store.readTable(m, "seen_bloom") else None
    val bloomBc =
      if (bloomRouted) None
      else segTable.map(df =>
        Seen.broadcastSegments(spark,
          Bloom.mergedSegments(df, bloomSegments, bloomBitsPerSegment)))
    val fresh = (if (bloomRouted && segTable.isDefined)
        Seen.filterUnseenRouted(candDepth, "canon_url", seen,
          segTable.get, bloomSegments)
      else Seen.filterUnseen(candDepth, "canon_url", seen, bloomBc))
      .withColumn("score", lit(1.0) / (lit(1.0) + col("depth")))
      .withColumn("state", lit("pending"))
      .withColumn("retry_count", lit(0))
      .withColumn("discovered_epoch", lit(epoch))
      .select("canon_url", "host", "depth", "score", "state", "retry_count",
        "discovered_epoch")
      .cache()

    // ---- frontier transition: fetched ok → fetched; error → retry w/ score
    // decay, dead at maxRetries (T5/T7)
    val outcome = fetched.map(f => (f.canon_url, f.status))
      .toDF("canon_url", "_status")
    val updated = frontier
      .join(outcome, Seq("canon_url"), "left")
      .withColumn("state",
        when(col("_status") === "ok", lit("fetched"))
          .when(col("_status") === "error" && col("retry_count") + 1 >= maxRetries,
            lit("failed"))
          .otherwise(col("state")))
      .withColumn("score",
        when(col("_status") === "error" && col("retry_count") + 1 < maxRetries,
          col("score") * 0.5).otherwise(col("score")))
      .withColumn("retry_count",
        when(col("_status") === "error", col("retry_count") + 1)
          .otherwise(col("retry_count")))
      .drop("_status")
    val newFrontier = updated.unionByName(fresh)

    val fetchLog = fetched.toDF()
      .select(col("epoch"), col("partition_id"), col("canon_url"), col("host"),
        col("rank"), col("status"), col("n_spans"), col("n_urls_out"))

    val statusCounts = fetched.toDF().groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nFetched = statusCounts.getOrElse("ok", 0L)
    val nErrors = statusCounts.getOrElse("error", 0L)
    val nEmitted = fresh.count()
    val counters = Map(
      "epoch" -> epoch,
      "fetched" -> nFetched,
      "errors" -> nErrors,
      "discovered" -> nDiscovered,
      "deduped" -> (nDiscovered - nEmitted),
      "emitted" -> nEmitted)

    val metricsDf = Seq((epoch, nFetched, nErrors, nDiscovered,
      nDiscovered - nEmitted, nEmitted))
      .toDF("epoch", "fetched", "errors", "discovered", "deduped", "emitted")

    // ---- K1 record sink + K2 job-control message (kafka_producer.py
    // send_crawling_completion semantics: count==0 ⇒ fail with reason, no
    // wall clock — completed_at is virtual epoch time in KST)
    sinkDir.foreach { d =>
      graft.sinks.RecordSink.emit(
        fresh.withColumn("epoch", lit(epoch)), "canon_url",
        s"$d/frontier-records", tag = s"e$epoch")
      val completedAt = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
        .plusMinutes(epoch).atOffset(java.time.ZoneOffset.ofHours(9))
        .format(java.time.format.DateTimeFormatter.ofPattern(
          "yyyy-MM-dd'T'HH:mm:ssxxx"))
      val control = Seq((s"epoch_$epoch",
        if (nEmitted > 0) "done" else "fail",
        "collection",
        if (nEmitted > 0) null else "review count 0",
        nEmitted, completedAt))
        .toDF("job_id", "status", "step", "failure_reason",
          "expected_count", "completed_at")
      graft.sinks.RecordSink.emit(control, "job_id", s"$d/job-control",
        tag = s"e$epoch")
    }

    // seen + its Bloom segments are append-only: each epoch contributes only
    // its fresh URLs; seen goes to the bucketed table (epoch-partitioned,
    // idempotent overwrite — see SnapshotStore), Bloom readers OR-merge
    // segments (at 10^10 scale this is the log-structured write path;
    // compaction folds old epochs/segments periodically, compactSeenEvery)
    store.appendSeen(fresh.select("canon_url"), epoch)
    store.commit(epoch,
      replace = Map("frontier" -> newFrontier),
      append = Map(
        "seen_bloom" -> Bloom.buildSegments(fresh.select("canon_url"),
          "canon_url", bloomSegments, bloomBitsPerSegment),
        "docs" -> okDocs, // the crawled interleaved-span corpus itself
        "fetch_log" -> fetchLog, "metrics" -> metricsDf),
      counters = cfg ++ counters,
      partitionedBy = Map("frontier" -> "state"))
    if (compactSeenEvery > 0 && epoch % compactSeenEvery == 0)
      store.compactSeen(epoch)
    fetched.unpersist(); candDepth.unpersist(); fresh.unpersist()
    bloomBc.foreach(_.destroy())
    counters
  }

  /** Run epochs until `maxEpochs` or an empty batch (exhausted frontier). */
  def run(maxEpochs: Int): Seq[Map[String, Long]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Map[String, Long]]
    var i = 0
    var continue = true
    while (i < maxEpochs && continue) {
      val metrics = runEpoch()
      out += metrics
      continue = metrics("fetched") + metrics("errors") > 0
      i += 1
    }
    out.toSeq
  }

  // ---- readers used by tests/metrics
  def frontier(): DataFrame =
    store.latest().flatMap(m => store.readTable(m, "frontier")).get
  def seenSet(): DataFrame =
    store.latest().map(m => store.readSeen(m.epoch)).get
  def fetchLog(): Option[DataFrame] =
    store.latest().flatMap(m => store.readTable(m, "fetch_log"))
  def metrics(): Option[DataFrame] =
    store.latest().flatMap(m => store.readTable(m, "metrics"))
  def docs(): Option[DataFrame] =
    store.latest().flatMap(m => store.readTable(m, "docs"))
}
