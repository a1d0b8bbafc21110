package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: both fact tables bucketed on the
  * join key join with NO shuffle exchange — the pre-partitioning idiom
  * for repeated large-scale joins (each side's bucketing is reused
  * across every downstream join on that key). */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed join has no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("ord_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b").join(spark.table("ord_b"), Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      val expected = {
        val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        li.join(o, li("l_orderkey") === o("o_orderkey")).count()
      }
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
