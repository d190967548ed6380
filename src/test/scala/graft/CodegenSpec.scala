package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bloom, Seen}

/** Codegen regression gate (round-1 verdict item 4): BENCH_r01 carried a
  * silent CodeGenerator compile failure — Spark logged a stack trace and
  * fell back to interpreted execution, so everything still "passed" while
  * the hot path ran un-codegen'd. This suite forces both fallback paths off
  * (`spark.sql.codegen.fallback` for whole-stage codegen,
  * `spark.sql.codegen.factoryMode=CODEGEN_ONLY` for codegen'd predicates /
  * projections outside WSCG — join conditions live there) and executes
  * every registered query plus the Bloom-prefiltered anti-join, so any
  * expression that stops compiling fails loudly here.
  */
class CodegenSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def withStrictCodegen[A](f: => A): A = {
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try f
    finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("every registered query executes with codegen fallback disabled") {
    withStrictCodegen {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try fn(spark, dir).write.mode("overwrite").format("noop").save()
        catch {
          case e: Throwable =>
            fail(s"$name fails under strict codegen: ${e.getMessage}", e)
        }
      }
    }
  }

  test("Bloom-prefiltered anti-join (join-condition expression) compiles under strict codegen") {
    import spark.implicits._
    withStrictCodegen {
      val seen = (0 until 500).map(i => s"https://h${i % 7}.com/p/$i")
        .toDF("canon_url")
      val cand = (250 until 750).map(i => s"https://h${i % 7}.com/p/$i")
        .toDF("canon_url")
      val segs = Bloom.mergedSegments(
        Bloom.buildSegments(seen, "canon_url", 4, 1 << 12), 4, 1 << 12)
      val bc = Seen.broadcastSegments(spark, segs)
      val fresh = Seen.filterUnseen(cand, "canon_url", seen, Some(bc))
      assert(fresh.count() === 250)
      bc.destroy()
    }
  }
}
