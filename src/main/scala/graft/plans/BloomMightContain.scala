package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.SegmentedBloom

/** Native Catalyst expression for the Bloom seen-set membership probe
  * (SURVEY.md §4.2: custom Expression preferred over a Scala UDF — a UDF
  * forces UTF8String→String conversion through a boxed function call and
  * blocks whole-stage codegen's null-elision; this stays codegen'd).
  *
  * The segments arrive via a `Broadcast[SegmentedBloom]`: the expression
  * holds only the (tiny) broadcast handle, so task closures stay small and
  * the filter array ships once per executor per epoch. Codegen materializes
  * `broadcast.value()` into a mutable state field at generated-class init —
  * one `value()` call per task, not per row. Segment choice uses the same
  * md5-prefix hash as the distributed build (Canon.md5Long / CanonJvm
  * .md5Long), implemented inside SegmentedBloom.mightContain.
  */
final case class BloomMightContain(child: Expression, bloom: Broadcast[SegmentedBloom])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val segs = bloom.value

  override def nullSafeEval(v: Any): Any =
    segs.mightContain(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // both class names below are top-level JVM classes whose getName is
    // valid Java source — a requirement for Janino casts (see SegmentedBloom)
    val bcClass = classOf[Broadcast[_]].getName
    val segClass = classOf[SegmentedBloom].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloom, bcClass)
    val segsTerm = ctx.addMutableState(segClass, "bloomSegs",
      v => s"$v = ($segClass) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => {
      val sv = ctx.freshName("bmcStr")
      s"""
         |String $sv = $c.toString();
         |${ev.value} = $segsTerm.mightContain($sv);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  import org.apache.spark.sql.graftbridge.Bridge
  def apply(c: Column, bloom: Broadcast[SegmentedBloom]): Column =
    Bridge.column(BloomMightContain(Bridge.expression(c), bloom))
}
