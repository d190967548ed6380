package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two ARRAY<DOUBLE> columns.
  *
  * The ANN/near-dup queries previously expressed this as
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` — higher-order array
  * functions are CodegenFallback, so every product ran through an
  * interpreted lambda call per ELEMENT, in the innermost loop of the
  * in-cell pair scans. This expression compiles to a tight
  * `acc += a[i] * b[i]` loop (and its interpreted eval matches exactly).
  *
  * Floating-point parity: the sum is the same sequential left fold in
  * element order, so results are bit-identical to both the old
  * formulation and DuckDB's `list_dot_product` oracle expression.
  * Mismatched lengths fold over the shorter prefix (the queries only ever
  * compare same-dimension embeddings); null arrays yield null.
  *
  * Null ELEMENTS match the HOF formulation this expression replaced: any
  * null element in the folded prefix nulls the whole dot product (zip_with
  * multiplies null → null, aggregate's sum propagates it). The per-element
  * null check is emitted ONLY when a child's ArrayType reports
  * containsNull — a containsNull=false schema keeps the tight two-load
  * loop, so the check costs nothing where the schema already proves it
  * redundant.
  */
final case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def elemNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  })

  // null elements can null the result even when both array columns are
  // non-null — fold element nullability into the expression's own
  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    if (elemNullable) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getDouble(i) * b.getDouble(i); i += 1
      }
    } else {
      while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("dpN")
      val i = ctx.freshName("dpI")
      val acc = ctx.freshName("dpAcc")
      val nullCheck =
        if (elemNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  import org.apache.spark.sql.graftbridge.Bridge
  def apply(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
