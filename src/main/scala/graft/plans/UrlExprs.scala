package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass URL expressions for the extraction/canonicalization hot
  * path (SURVEY.md §2.7 X14/X8/D2, §2.10 "custom Expression beats UDF").
  *
  * The Column formulations these replace are pure compositions of built-in
  * regex expressions — correct and codegen'd, but each candidate row paid
  * ~7 independent regex evaluations (6 in the staged canonicalizer + 1 for
  * the page origin) plus a `regexp_extract_all` scan per span. The round-3
  * local[32] stage profile put that map stage at 75% of the crawl
  * pipeline's wall (474 CPU-seconds of 630). Each expression here is a
  * single character scan in plain JVM code (graft.functions.CanonJvm),
  * invoked from whole-stage codegen as one static call — no matcher
  * allocation, no per-regex string traversals.
  *
  * Equivalence to the regex forms is pinned three ways: CanonSpec /
  * ExtractSpec property tests against both the staged Column pipeline and
  * the plain-Scala oracle twins, EngineSpec's sequential-oracle crawl
  * equality, and the DuckDB oracle gate (whose SQL keeps the REGEX
  * formulation — every Verify run independently re-derives the expected
  * values the regex way and hash-compares).
  */
object UrlExprs {
  import org.apache.spark.sql.graftbridge.Bridge

  private val JVM = "graft.functions.CanonJvm"

  /** X14 full canonicalization: one scan, exact staged-pipeline semantics. */
  final case class CanonUrlNative(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = StringType
    override def prettyName: String = "canon_url_native"
    // null iff url is null, or url is root-relative and base is null —
    // mirrors when(u.startsWith("/"), concat(base, u)).otherwise(u)
    override def nullable: Boolean = left.nullable || right.nullable

    override def eval(input: InternalRow): Any = {
      val u = left.eval(input)
      if (u == null) return null
      val us = u.asInstanceOf[UTF8String]
      if (graft.functions.CanonJvm.startsWithSlash(us)) {
        val b = right.eval(input)
        if (b == null) null
        else graft.functions.CanonJvm.canonUrlU(us, b.asInstanceOf[UTF8String])
      } else graft.functions.CanonJvm.canonUrlU(us, UTF8String.EMPTY_UTF8)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val uev = left.genCode(ctx)
      val bev = right.genCode(ctx)
      val code =
        code"""
          |${uev.code}
          |boolean ${ev.isNull} = true;
          |UTF8String ${ev.value} = null;
          |if (!${uev.isNull}) {
          |  ${bev.code}
          |  if ($JVM.startsWithSlash(${uev.value})) {
          |    if (!${bev.isNull}) {
          |      ${ev.value} = $JVM.canonUrlU(${uev.value}, ${bev.value});
          |      ${ev.isNull} = false;
          |    }
          |  } else {
          |    ${ev.value} = $JVM.canonUrlU(${uev.value}, UTF8String.EMPTY_UTF8);
          |    ${ev.isNull} = false;
          |  }
          |}
        """.stripMargin
      ev.copy(code = code)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** host[:non-default-port] component of a canonical URL. */
  final case class CanonHostNative(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "canon_host_native"

    override def nullSafeEval(v: Any): Any =
      graft.functions.CanonJvm.canonHostU(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$JVM.canonHostU($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `scheme://host[:port]` origin prefix of a canonical URL ('' if none). */
  final case class OriginNative(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "canon_origin_native"

    override def nullSafeEval(v: Any): Any =
      graft.functions.CanonJvm.originU(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$JVM.originU($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** All URL-grammar matches of a text span, in document order — the twin
    * of `regexp_extract_all(text, SimWeb.urlRegex, 0)`.
    */
  final case class ExtractUrlsNative(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "extract_urls_native"

    override def nullSafeEval(v: Any): Any =
      graft.functions.CanonJvm.extractUrlsData(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$JVM.extractUrlsData($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ------------------------------------------------------- Column factories

  def canonUrl(u: Column, base: Column): Column =
    Bridge.column(CanonUrlNative(Bridge.expression(u), Bridge.expression(base)))

  def canonHost(c: Column): Column =
    Bridge.column(CanonHostNative(Bridge.expression(c)))

  def origin(c: Column): Column =
    Bridge.column(OriginNative(Bridge.expression(c)))

  def extractUrls(c: Column): Column =
    Bridge.column(ExtractUrlsNative(Bridge.expression(c)))
}
