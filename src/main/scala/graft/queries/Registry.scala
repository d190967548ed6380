package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a Spark DataFrame program plus (optionally)
  * an exactly-equivalent DuckDB SQL oracle over the same parquet tables.
  *
  * Output discipline (driver hash-compares after sorting columns by name):
  *  - only scalar output columns (string/long/int/double) — arrays and maps
  *    are serialized to strings so parquet-vs-DuckDB comparison is stable;
  *  - doubles are `round(_, k)` of identically-ordered arithmetic on both
  *    sides, or decimal-cast sums, so bit-equality holds;
  *  - every query ends in a deterministic total ORDER BY.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Table scan spread over all cores. Small parquet files arrive as ONE
    * scan partition (a single row group is unsplittable), which serializes
    * every downstream per-row computation; queries whose per-row work is
    * heavy (tokenization, MinHash, SimHash) repartition the scan first —
    * one trivial shuffle of the raw rows buys full-width parallelism for
    * the expensive projections. At real scale the scan is already wide and
    * this exchange is the usual explicit-repartition before CPU-bound map
    * stages.
    */
  def tblSpread(s: SparkSession, dir: String, name: String): DataFrame =
    tbl(s, dir, name).repartition(s.sparkContext.defaultParallelism)

  /** DuckDB expression computing graft.functions.Canon.md5Long(x). */
  def duckMd5Long(x: String): String =
    s"('0x'||substr(md5($x),1,15))::BIGINT"

  // lazy: the Queries* objects reference Registry helpers during their own
  // initialization — a strict val here would deadlock into nulls
  lazy val all: Seq[Q] =
    QueriesCrawl.qs ++ QueriesCrawl2.qs ++ QueriesRelational.qs ++
      QueriesText.qs ++ QueriesVector.qs ++ QueriesPipeline.qs ++
      QueriesFidelity.qs ++ QueriesFrontier.qs ++ QueriesMedia.qs

  lazy val byName: Map[String, Q] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names")
    m
  }
}
