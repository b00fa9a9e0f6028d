package graft

import org.apache.spark.sql.functions._
import graft.operators.Split
import graft.sources.Tables

class SplitSpec extends SparkSpec {
  import spark.implicits._

  private def orders = Tables.table(spark, sf, "orders")

  test("assignSplit: total partition, deterministic, independent of partitioning") {
    val splits = Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0)
    val assigned = Split.assignSplit(orders, col("o_orderkey"), splits, seed = "s1")
    val n = orders.count()
    assert(assigned.count() === n) // every row gets exactly one split
    val byCounts = assigned.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byCounts.keySet === Set("train", "val", "test"))
    // ~8/1/1 by weight (loose bounds; 1500 keys at sf0.001)
    assert(byCounts("train").toDouble / n > 0.7 && byCounts("train").toDouble / n < 0.9)
    // identical assignment after an arbitrary repartition — the property
    // DataFrame.randomSplit does NOT have
    val reassigned = Split.assignSplit(orders.repartition(13, col("o_custkey")),
      col("o_orderkey"), splits, seed = "s1")
    assert(assigned.select("o_orderkey", "split").except(
      reassigned.select("o_orderkey", "split")).count() === 0)
  }

  test("assignSplit: re-weighting moves only the boundary (stability)") {
    // growing val at train's expense: no row may jump train<->test
    val a = Split.assignSplit(orders, col("o_orderkey"), Seq("train" -> 8.0, "val" -> 2.0))
      .select(col("o_orderkey"), col("split").as("s_a"))
    val b = Split.assignSplit(orders, col("o_orderkey"), Seq("train" -> 7.0, "val" -> 3.0))
      .select(col("o_orderkey"), col("split").as("s_b"))
    val moved = a.join(b, "o_orderkey").filter($"s_a" =!= $"s_b")
      .select("s_a", "s_b").distinct().as[(String, String)].collect().toSet
    assert(moved.subsetOf(Set(("train", "val"))), s"unexpected moves: $moved")
  }

  test("sampleByHash: monotone in fraction, subset semantics, seed-sensitive") {
    val k = col("o_orderkey")
    val s10 = Split.sampleByHash(orders, k, 0.1).select("o_orderkey")
    val s30 = Split.sampleByHash(orders, k, 0.3).select("o_orderkey")
    assert(s10.except(s30).count() === 0) // sample(0.1) ⊆ sample(0.3)
    val n = orders.count().toDouble
    val r = s30.count() / n
    assert(r > 0.2 && r < 0.4, s"30% sample came back at $r")
    val other = Split.sampleByHash(orders, k, 0.3, seed = "x").select("o_orderkey")
    assert(other.except(s30).count() > 0) // a different seed samples differently
  }

  test("hashFraction: uniform-ish and in [0,1)") {
    val fr = orders.select(Split.hashFraction(col("o_orderkey")).as("u"))
      .agg(min($"u"), max($"u"), avg($"u")).as[(Double, Double, Double)].head()
    assert(fr._1 >= 0.0 && fr._2 < 1.0)
    assert(math.abs(fr._3 - 0.5) < 0.05, s"mean fraction ${fr._3} far from 0.5")
  }
}
