package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Salting

class SaltingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted join equals plain join") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumnRenamed("l_partkey", "p_partkey")
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select($"p_partkey", $"p_brand")
    val salted = Salting.saltedJoin(li, part, "p_partkey", "l_orderkey", 8)
      .groupBy($"p_brand").agg(count(lit(1)).as("n"))
    val plain = li.join(part, Seq("p_partkey"))
      .groupBy($"p_brand").agg(count(lit(1)).as("n"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("two-phase collect_set equals direct collect_set") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val twoPhase = Salting.twoPhaseCollectSet(ev, "user_id", "event_type", "event_id", 4)
    val direct = ev.groupBy($"user_id")
      .agg(array_sort(collect_set($"event_type")).as("event_type_set"))
    assert(twoPhase.except(direct).isEmpty && direct.except(twoPhase).isEmpty)
  }
}
