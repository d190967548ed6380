package graft.fetch

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset}
import graft.gen.SimWeb
import graft.model.{FetchTask, Span}

/** S1 — the fetch "source": partition-local simulated page fetches inside
  * mapPartitions (the analog of the reference's per-process browser with
  * amortized init, src/api/crawling_review.py:512-517, R3). Deterministic:
  * page content is a pure function of (seed, canon_url); a hash-picked 5%
  * of fetches fail (status=error, no spans) to exercise the retry path (T5,
  * reference src/api/crawling_info_list.py:101-131).
  */
object FetchSim {

  final case class Fetched(
      epoch: Long,
      partition_id: Int,
      canon_url: String,
      host: String,
      depth: Int,
      rank: Int,
      status: String,
      n_spans: Int,
      n_urls_out: Int,
      spans: Seq[Span])

  def failsFor(url: String, seed: Long): Boolean =
    (SimWeb.mix(seed, s"fail:$url") & Long.MaxValue) % 20 == 0

  def run(batch: Dataset[FetchTask], seed: Long, nHosts: Int): Dataset[Fetched] = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch.mapPartitions { it =>
      // partition-local "browser" init would happen here (R3); the simulator
      // needs none, but the partition id is recorded as fetch lineage
      val pid = TaskContext.getPartitionId()
      it.map { t =>
        if (failsFor(t.canon_url, seed))
          Fetched(t.epoch, pid, t.canon_url, t.host, t.depth, t.rank,
            "error", 0, 0, Seq.empty)
        else {
          val doc = SimWeb.docFor(t.canon_url, seed, nHosts)
          // docFor emits one link-bearing text span per outbound link plus
          // one tail text span — no need to regenerate the links to count
          val nOut = doc.spans.count(_.kind == "text") - 1
          Fetched(t.epoch, pid, t.canon_url, t.host, t.depth, t.rank,
            "ok", doc.spans.size, nOut, doc.spans)
        }
      }
    }
  }
}
