package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen kernel must be bit-identical to the declarative
  * strict fold it replaces (same IEEE op order), on both float and
  * double element types, including nulls and empty arrays. */
class FloatDotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("float_dot equals the aggregate(zip_with(...)) fold bit-exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      (Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .withColumn("fast", expr("float_dot(a, b)"))
      .withColumn("slow", expr(
        "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
    val bad = df.filter($"fast" =!= $"slow").count()
    assert(bad == 0)
    // interpreted eval path (no codegen) must agree too
    val f = graft.functions.FloatDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        rows.head._1, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        rows.head._2, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val expected = rows.head._1.zip(rows.head._2)
      .foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    assert(f.eval(null) == expected)
  }

  test("float_dot handles double arrays, empty arrays and null input") {
    import spark.implicits._
    val out = spark.sql(
      """SELECT float_dot(array(CAST(1.5 AS DOUBLE), CAST(2.0 AS DOUBLE)),
        |                 array(CAST(2.0 AS DOUBLE), CAST(0.25 AS DOUBLE))) AS d,
        |       float_dot(array(CAST(1.0 AS FLOAT)), array(CAST(4.0 AS DOUBLE))) AS mixed,
        |       float_dot(CAST(array() AS ARRAY<FLOAT>), CAST(array() AS ARRAY<FLOAT>)) AS empty,
        |       float_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS nul
        |""".stripMargin).collect()(0)
    assert(out.getDouble(0) == 3.5)
    assert(out.getDouble(1) == 4.0)
    assert(out.getDouble(2) == 0.0)
    assert(out.isNullAt(3))
  }

  test("float_dot yields null for mismatched lengths, like the zip_with fold") {
    val out = spark.sql(
      """SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                 array(CAST(3.0 AS FLOAT))) AS d""".stripMargin).collect()(0)
    assert(out.isNullAt(0))
  }
}
