package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{QueriesCrawl, Registry}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the training-data
  * pipeline surface) is registered in `queries`, each with an exactly
  * equivalent DuckDB oracle in `oracleSql` (same column names, deterministic
  * ordering, scalar-only output columns).
  */
object SparkEntry {

  /** Session settings every entry point relies on: non-ANSI casts (lenient
    * ''→null semantics shared with the oracle's try_cast) and AQE on.
    */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // AQE coalesces shuffle partitions by BYTES; the dedup/ANN stages carry
    // few bytes per row but heavy per-row CPU (array set ops, pair
    // enumeration), so the 64m default collapses them onto one core. 4m
    // keeps those stages wide without fragmenting genuinely large shuffles.
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    spark
  }

  /** Flagship: one epoch of the frontier pipeline on sf0.001 — extract
    * candidates from synthesized span text, canonicalize, dedup, anti-join a
    * seen set, rank per host, emit the fetch batch (SURVEY §7.3).
    * Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    configure(spark)
    Registry.byName("q06_w2_sched_rank").run(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> { (s: SparkSession, dir: String) =>
      configure(s)
      q.run(s, dir)
    }).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
