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

  private def fn(name: String, usage: String)(
      build: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.plans.GraftExtensions", null, name, usage, ""),
      (exprs: Seq[Expression]) => build(exprs))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("canon_url",
      "canon_url(url, base) - full URL canonicalization (X14)") { es =>
      require(es.size == 2, "canon_url(url, base)")
      val u = Bridge.column(es.head)
      val base = Bridge.column(es(1))
      Bridge.expression(Canon.canonUrlCol(u, base))
    })
    ext.injectFunction(fn("url_host",
      "url_host(url) - lowercased host with default port stripped") { es =>
      require(es.size == 1, "url_host(url)")
      Bridge.expression(Canon.urlHost(Bridge.column(es.head)))
    })
    ext.injectFunction(fn("product_code",
      "product_code(url) - X1 product code extraction") { es =>
      require(es.size == 1, "product_code(url)")
      Bridge.expression(Canon.productCode(Bridge.column(es.head)))
    })
    ext.injectFunction(fn("graft_hash64",
      "graft_hash64(s) - portable 60-bit md5-prefix hash") { es =>
      require(es.size == 1, "graft_hash64(s)")
      Bridge.expression(Canon.md5Long(Bridge.column(es.head)))
    })
  }
}
