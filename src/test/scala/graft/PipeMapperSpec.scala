package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipeMapper

/** External-executable mapper: TSV over stdin/stdout, one process per
  * partition, arbitrary row fan-out — the Hadoop Streaming contract
  * (`README.rst:22-27` in the reference). */
class PipeMapperSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("identity pipe (cat) preserves every row across partitions") {
    import spark.implicits._
    val df = spark.range(0, 1000).select($"id", concat(lit("v"), $"id").as("s"))
      .repartition(7)
    val out = PipeMapper.pipe(df, Seq("cat"), StructType(Seq(
      StructField("id", LongType), StructField("s", StringType))))
    assert(out.count() == 1000)
    assert(out.filter($"s" === concat(lit("v"), $"id")).count() == 1000)
  }

  test("transforming pipe (tr) matches the SQL twin") {
    import spark.implicits._
    val df = spark.createDataset(Seq((1L, "hello world"), (2L, "Spark PIPE")))
      .toDF("id", "t")
    val out = PipeMapper.pipe(df, Seq("tr", "a-z", "A-Z"), StructType(Seq(
      StructField("id", LongType), StructField("t", StringType))))
      .orderBy("id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("HELLO WORLD", "SPARK PIPE"))
  }

  test("row fan-out and numeric decode (awk emits two rows per input)") {
    import spark.implicits._
    val df = spark.createDataset(Seq(3L, 5L)).toDF("n")
    // each input line n -> two lines: (n, n*2) and (n, n*3)
    val out = PipeMapper.pipe(df,
      Seq("awk", "{print $1\"\\t\"($1*2); print $1\"\\t\"($1*3)}"),
      StructType(Seq(StructField("n", LongType), StructField("m", LongType))))
    assert(out.count() == 4)
    assert(out.filter($"m" === $"n" * 2).count() == 2)
    assert(out.filter($"m" === $"n" * 3).count() == 2)
  }

  private def concat(cs: org.apache.spark.sql.Column*) =
    org.apache.spark.sql.functions.concat(cs: _*)
  private def lit(v: Any) = org.apache.spark.sql.functions.lit(v)
}
