package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.FrontierLog

/** Round-4 flagship feature under the driver's own DuckDB gate: the
  * log-structured frontier's merge-on-read semantics (engine/FrontierLog).
  * FrontierLogSpec pins the engine-level invariants (byte ratios, plan
  * shapes, fold identity); these two queries additionally verify the VALUE
  * semantics against an independent SQL formulation:
  *
  *  - q47: `resolve` (latest row per canon_url by seq over base ∪ delta)
  *    vs a DuckDB row_number window — the merge-on-read read path itself;
  *  - q48: `pending` (the decomposed no-shuffle pending view: pruned base
  *    anti-joined with delta keys ∪ delta-internal latest pending) vs the
  *    straightforward resolve-then-filter in DuckDB — the exactness claim
  *    of the scheduler's fast path, checked by an engine that knows
  *    nothing about the decomposition.
  *
  * The fixture is an engine-shaped frontier log: a RESOLVED base (one row
  * per key, seq = the fold epoch) plus three epochs of appended deltas
  * (seq 5..7 > base seq, at most one row per key per epoch) with schedule
  * transitions, retry re-enqueues, terminal absorptions, and fresh inserts
  * that are themselves later scheduled — the row mix the reference's
  * retry/dedup loops produce (/root/reference/src/api/
  * crawling_info_list.py:101-161 semantics, epoch-ized per SURVEY §2
  * S5/T5/D1).
  */
object QueriesFrontier {

  // NOT under target/: an `sbt clean` between Verify and the driver's
  // DuckDB pass would otherwise delete the fixture the oracle SQL reads
  val fixturePath = "/root/.graft/fixtures/frontier_oracle"
  private val N_BASE = 300
  private val N_FRESH = 100
  private val N_HOSTS = 10
  private val FOLD_SEQ = 4L

  private def urlOf(i: Int) =
    (s"https://h${i % N_HOSTS}.example.com/p/$i", s"h${i % N_HOSTS}.example.com")

  /** (canon_url, host, depth, score, state, retry_count, discovered_epoch,
    * seq) rows — FrontierLog.Cols order.
    */
  private type Row8 = (String, String, Int, Double, String, Int, Long, Long)

  /** One row per key: the resolved fold materialization. Keys i%3==0 are
    * already terminal in the base (absorbed before the fold).
    */
  private def baseRows: Seq[Row8] =
    (0 until N_BASE).map { i =>
      val (u, h) = urlOf(i)
      val st = if (i % 3 == 0) "fetched" else "pending"
      (u, h, i % 4, (i % 97) / 100.0, st, 0, (i % 3).toLong, FOLD_SEQ)
    }

  /** Post-fold transitions, engine-shaped: deltas only touch base-pending
    * keys (terminal is absorbing), seq strictly above the fold's, at most
    * one row per key per epoch; fresh inserts may be scheduled later
    * inside the same log window.
    */
  private def deltaRows: Seq[Row8] = {
    val onBase = (0 until N_BASE).filter(_ % 3 != 0).flatMap { i =>
      val (u, h) = urlOf(i)
      val d = i % 4; val sc = (i % 97) / 100.0
      i % 5 match {
        case 0 | 3 => // scheduled epoch 5, fetched
          Seq((u, h, d, sc, "fetched", 0, (i % 3).toLong, 5L))
        case 1 => // scheduled epoch 5, error -> retry re-enqueue (score decay);
          // every 10th then fetched at epoch 6
          Seq((u, h, d, sc / 2, "pending", 1, (i % 3).toLong, 5L)) ++
            (if (i % 10 == 1)
               Seq((u, h, d, sc / 2, "fetched", 1, (i % 3).toLong, 6L))
             else Nil)
        case 2 => // failed terminally at epoch 6
          Seq((u, h, d, sc, "failed", 3, (i % 3).toLong, 6L))
        case _ => Nil // untouched: base row stays latest
      }
    }
    val fresh = (N_BASE until N_BASE + N_FRESH).flatMap { i =>
      val (u, h) = urlOf(i)
      val sc = (i % 89) / 100.0
      val born = 5L + (i % 3) // discovered epoch 5..7
      Seq((u, h, 1 + i % 3, sc, "pending", 0, born, born)) ++
        (if (i % 4 == 0 && born < 7L) // scheduled within the log window
           Seq((u, h, 1 + i % 3, sc, "fetched", 0, born, born + 1))
         else Nil)
    }
    onBase ++ fresh
  }

  /** Write-once via [[Fixtures.ensure]]: deterministic in (base, fresh,
    * hosts); bump the version token whenever baseRows/deltaRows change.
    */
  private val stamp = s"base=$N_BASE fresh=$N_FRESH hosts=$N_HOSTS v1"
  @volatile private var checked = false

  private def ensureFixture(s: SparkSession): Unit =
    if (!checked) synchronized {
      Fixtures.ensure(fixturePath, stamp) { tmp =>
        import s.implicits._
        baseRows.toDF(FrontierLog.Cols: _*).coalesce(1)
          .write.mode("overwrite").parquet(s"$tmp/base")
        deltaRows.toDF(FrontierLog.Cols: _*).coalesce(1)
          .write.mode("overwrite").parquet(s"$tmp/delta")
      }
      checked = true
    }

  private def part(s: SparkSession, name: String): DataFrame = {
    ensureFixture(s)
    s.read.parquet(s"$fixturePath/$name")
  }

  private val duckLog =
    s"""flog AS (
       |  SELECT * FROM read_parquet('$fixturePath/base/*.parquet')
       |  UNION ALL
       |  SELECT * FROM read_parquet('$fixturePath/delta/*.parquet')
       |)""".stripMargin

  // seq is unique per key by construction (one row per key per epoch), so
  // the row_number tiebreak never fires and both sides are deterministic
  private val q47 = Q("q47_frontier_resolve",
    (s, _) => FrontierLog.resolve(
        part(s, "base").unionByName(part(s, "delta")))
      .orderBy("canon_url"),
    Some(s"""WITH $duckLog
            |SELECT canon_url, host, depth, score, state, retry_count,
            |       discovered_epoch, seq
            |FROM (SELECT *, row_number() OVER (
            |        PARTITION BY canon_url ORDER BY seq DESC) AS rn
            |      FROM flog)
            |WHERE rn = 1
            |ORDER BY canon_url""".stripMargin))

  private val q48 = Q("q48_frontier_pending",
    (s, _) => FrontierLog.pending(part(s, "base"), Some(part(s, "delta")))
      .orderBy("canon_url"),
    Some(s"""WITH $duckLog
            |SELECT canon_url, host, depth, score, state, retry_count,
            |       discovered_epoch
            |FROM (SELECT *, row_number() OVER (
            |        PARTITION BY canon_url ORDER BY seq DESC) AS rn
            |      FROM flog)
            |WHERE rn = 1 AND state = 'pending'
            |ORDER BY canon_url""".stripMargin))

  val qs: Seq[Q] = Seq(q47, q48)
}
