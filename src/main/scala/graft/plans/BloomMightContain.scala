package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.Bloom

/** Native Catalyst expression for the Bloom seen-set membership probe
  * (SURVEY.md §4.2: custom Expression preferred over a Scala UDF — a UDF
  * forces UTF8String→String conversion through a boxed function call and
  * blocks whole-stage codegen's null-elision; this stays codegen'd).
  *
  * The segment array rides inside the expression (captured at plan time,
  * serialized with the task closure like a broadcast literal). Segment
  * choice uses the same md5-prefix hash as the distributed build
  * (Canon.md5Long / CanonJvm.md5Long).
  */
final case class BloomMightContain(child: Expression, segments: Array[Bloom.Filter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val nSeg = segments.length

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val id = (graft.functions.CanonJvm.md5Long(s) % nSeg).toInt
    segments(id).mightContain(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the segment array once per task via a codegen reference object
    val segsRef = ctx.addReferenceObj("bloomSegs", segments,
      classOf[Array[Bloom.Filter]].getName)
    val nSegLit = segments.length
    nullSafeCodeGen(ctx, ev, c => {
      val sv = ctx.freshName("bmcStr")
      val idv = ctx.freshName("bmcSeg")
      s"""
         |String $sv = $c.toString();
         |int $idv = (int) (graft.functions.CanonJvm.md5Long($sv) % $nSegLit);
         |${ev.value} = $segsRef[$idv].mightContain($sv);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  import org.apache.spark.sql.graftbridge.Bridge
  def apply(c: Column, segments: Array[Bloom.Filter]): Column =
    Bridge.column(BloomMightContain(Bridge.expression(c), segments))
}
