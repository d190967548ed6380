package graft.oracle

import scala.collection.mutable
import graft.fetch.FetchSim
import graft.gen.SimWeb
import graft.operators.Sched

/** Sequential in-memory reference model of the crawl semantics (SURVEY.md
  * §5.2-3): a deliberately independent reimplementation — plain Scala
  * collections and SimWeb.canonScala instead of DataFrames and Column
  * expressions — mirroring the reference crawler's loop structure (listing
  * scan order src/api/crawling_info_list.py:139-272, page order
  * src/api/crawling_review.py:377-489, dedup 157-161) lifted to the epoch
  * model. EngineSpec asserts the distributed engine reproduces this model's
  * per-host fetch sequences and final seen-set exactly (note N7's
  * determinism definition).
  */
final class SeqOracle(seed: Long, nHosts: Int, epochBudgetMs: Long = 10000L,
    maxRetries: Int = 3) {

  final case class Entry(canonUrl: String, host: String, depth: Int,
      var score: Double, var state: String, var retry: Int)

  val frontier = mutable.LinkedHashMap.empty[String, Entry]
  val seen = mutable.Set.empty[String]
  /** (epoch, host) -> fetch order */
  val fetchSeq = mutable.Map.empty[(Long, String), Vector[String]]
  val metrics = mutable.ArrayBuffer.empty[Map[String, Long]]

  private val robots: Map[String, (Long, Seq[String])] =
    Sched.robotsFor((0 until nHosts).map(SimWeb.hostName), seed)
      .map { case (h, d, dis) => h -> (d, dis) }.toMap

  private val defaultDelayMs = 2500L

  private def delayOf(host: String): Long =
    robots.get(host).map(_._1).getOrElse(defaultDelayMs)

  private def disallowed(canon: String, host: String): Boolean = {
    val path = {
      val si = canon.indexOf("://")
      if (si < 0) "" else {
        val rest = canon.substring(si + 3)
        val ps = rest.indexWhere(c => c == '/' || c == '?')
        if (ps < 0) "" else {
          val tail = rest.substring(ps)
          val qi = tail.indexOf('?')
          if (qi >= 0) tail.substring(0, qi) else tail
        }
      }
    }
    robots.get(host).exists(_._2.exists(path.startsWith))
  }

  def init(seedUrls: Seq[String]): Unit = {
    seedUrls.foreach { u =>
      val canon = SimWeb.canonScala(u, "https://unknown.example.com")
      if (canon.startsWith("http")) {
        val host = SimWeb.hostOfCanon(canon)
        if (!disallowed(canon, host) && !seen.contains(canon)) {
          seen += canon
          frontier(canon) = Entry(canon, host, 0, 1.0, "pending", 0)
        }
      }
    }
  }

  def runEpoch(epoch: Long): Map[String, Long] = {
    // W2 + T4: per-host priority order, budget cut
    val byHost = frontier.values.filter(_.state == "pending").toSeq.groupBy(_.host)
    val batch = byHost.toSeq.flatMap { case (host, entries) =>
      val ordered = entries.sortBy(e => (-e.score, e.depth, e.canonUrl))
      val delay = delayOf(host)
      var cum = 0L
      ordered.takeWhile { _ => cum += delay; cum <= epochBudgetMs }
    }
    // record per-host sequences in priority order
    batch.groupBy(_.host).foreach { case (host, es) =>
      fetchSeq((epoch, host)) =
        es.sortBy(e => (-e.score, e.depth, e.canonUrl)).map(_.canonUrl).toVector
    }

    var fetched = 0L
    var errors = 0L
    // discovered candidates: canon -> min parent depth
    val candDepth = mutable.Map.empty[String, Int]
    batch.foreach { e =>
      if (FetchSim.failsFor(e.canonUrl, seed)) {
        errors += 1
        e.retry += 1
        if (e.retry >= maxRetries) e.state = "failed" else e.score *= 0.5
      } else {
        fetched += 1
        e.state = "fetched"
        val doc = SimWeb.docFor(e.canonUrl, seed, nHosts)
        val base = SimWeb.originOfCanon(e.canonUrl)
        doc.spans.filter(_.kind == "text").foreach { sp =>
          SimWeb.extractRawScala(sp.text).foreach { raw =>
            val canon = SimWeb.canonScala(raw, base)
            if (canon.startsWith("http")) {
              val host = SimWeb.hostOfCanon(canon)
              if (!disallowed(canon, host)) {
                val d = e.depth + 1
                candDepth(canon) = candDepth.get(canon).fold(d)(math.min(_, d))
              }
            }
          }
        }
      }
    }
    val discovered = candDepth.size.toLong
    var emitted = 0L
    candDepth.toSeq.sortBy(_._1).foreach { case (canon, d) =>
      if (!seen.contains(canon)) {
        seen += canon
        frontier(canon) = Entry(canon, SimWeb.hostOfCanon(canon), d,
          1.0 / (1.0 + d), "pending", 0)
        emitted += 1
      }
    }
    val m = Map("epoch" -> epoch, "fetched" -> fetched, "errors" -> errors,
      "discovered" -> discovered, "deduped" -> (discovered - emitted),
      "emitted" -> emitted)
    metrics += m
    m
  }

  def run(maxEpochs: Int): Unit = {
    var e = 1L
    var continue = true
    while (e <= maxEpochs && continue) {
      val m = runEpoch(e)
      continue = m("fetched") + m("errors") > 0
      e += 1
    }
  }
}
