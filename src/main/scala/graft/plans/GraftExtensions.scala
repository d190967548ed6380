package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.Bridge
import graft.functions.Canon

/** SparkSessionExtensions entry point: registers the engine's scalar surface
  * for SQL users (`spark.sql("SELECT canon_url(u, 'https://base') ...")`),
  * so a session built with
  * `.withExtensions(new GraftExtensions)` — or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` on
  * spark-submit — gets the canonicalizer family without touching the
  * DataFrame API. Each function expands to the same built-in expression
  * trees the Column API produces (SURVEY §2.10: no UDFs; DuckDB-oracle
  * parity preserved).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def fn(name: String, usage: String)(
      build: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.plans.GraftExtensions", null, name, usage, ""),
      (exprs: Seq[Expression]) => build(exprs))

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("canon_url",
      "canon_url(url, base) - full URL canonicalization (X14)") { es =>
      require(es.size == 2, "canon_url(url, base)")
      Bridge.expression(Canon.canonUrlCol(Bridge.column(es.head), Bridge.column(es(1))))
    },
    fn("url_host",
      "url_host(url) - lowercased host with default port stripped") { es =>
      require(es.size == 1, "url_host(url)")
      Bridge.expression(Canon.urlHost(Bridge.column(es.head)))
    },
    fn("product_code",
      "product_code(url) - X1 product code extraction") { es =>
      require(es.size == 1, "product_code(url)")
      Bridge.expression(Canon.productCode(Bridge.column(es.head)))
    },
    fn("graft_hash64",
      "graft_hash64(s) - portable 60-bit md5-prefix hash") { es =>
      require(es.size == 1, "graft_hash64(s)")
      Bridge.expression(Canon.md5Long(Bridge.column(es.head)))
    },
    fn("dot_product",
      "dot_product(a, b) - codegen'd dot product over two ARRAY<DOUBLE>") { es =>
      require(es.size == 2, "dot_product(a, b)")
      DotProduct(es.head, es(1))
    },
    fn("extract_urls",
      "extract_urls(text) - URL-grammar matches of a text span, in order") { es =>
      require(es.size == 1, "extract_urls(text)")
      UrlExprs.ExtractUrlsNative(es.head)
    })

  /** Register the same functions on an already-built session (getOrCreate
    * silently ignores withExtensions when a session exists — this is the
    * safe path for notebooks/tests sharing a session).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    descriptors.foreach { case (id, info, b) => reg.registerFunction(id, info, b) }
  }
}
