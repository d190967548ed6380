package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

/** The native DotProduct expression must be bit-identical to the
  * higher-order-function formulation it replaced (same sequential left
  * fold), null-safe, and executable under strict codegen.
  */
class DotProductSpec extends SparkSpecBase with TableDrivenPropertyChecks {

  import spark.implicits._

  test("bit-identical to the aggregate(zip_with(...)) formulation") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i, Array.fill(64)(rnd.nextDouble() * 2 - 1),
        Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val native = graft.plans.DotProduct(col("a"), col("b"))
    val diff = df.select((hof =!= native).as("d")).filter(col("d")).count()
    assert(diff === 0, "native dot product diverged from the HOF fold")
  }

  test("null array yields null; empty arrays yield 0.0") {
    val df = Seq(
      (1, Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),
      (2, None: Option[Array[Double]], Some(Array(3.0, 4.0))),
      (3, Some(Array.empty[Double]), Some(Array.empty[Double])))
      .toDF("id", "a", "b")
    val got = df.select(col("id"),
      graft.plans.DotProduct(col("a"), col("b")).as("d"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(got(1) === Some(11.0))
    assert(got(2) === None)
    assert(got(3) === Some(0.0))
  }

  test("null ELEMENT nulls the dot product, matching the HOF fold (eval + codegen)") {
    // zip_with multiplies a null element to null and aggregate's sum
    // propagates it — the native expression must agree, in both the
    // interpreted eval and the containsNull codegen path
    val df = Seq(
      (1, Array[java.lang.Double](1.0, null, 3.0), Array[java.lang.Double](1.0, 1.0, 1.0)),
      (2, Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](null, 1.0)),
      (3, Array[java.lang.Double](2.0, 3.0), Array[java.lang.Double](4.0, 5.0)))
      .toDF("id", "a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val native = graft.plans.DotProduct(col("a"), col("b"))
    val got = df.select(col("id"), native.as("d"), hof.as("h"))
      .collect().map(r => r.getInt(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(got(1) === ((None, None)))
    assert(got(2) === ((None, None)))
    assert(got(3) === ((Some(23.0), Some(23.0))))
  }

  test("compiles and runs under strict codegen") {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(1000)
        .select(array(Seq.fill(8)(rand(1)): _*).as("a"),
          array(Seq.fill(8)(rand(2)): _*).as("b"))
      val s = df.select(sum(graft.plans.DotProduct(col("a"), col("b"))))
        .collect()(0).getDouble(0)
      assert(!s.isNaN)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
