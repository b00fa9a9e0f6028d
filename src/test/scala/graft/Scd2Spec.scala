package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd2

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("collapses runs, half-open intervals, one current row per key") {
    val updates = Seq(
      (1L, "bronze", 10L), (1L, "bronze", 20L), (1L, "silver", 30L),
      (1L, "silver", 40L), (1L, "bronze", 50L),
      (2L, "gold", 15L)
    ).toDF("id", "tier", "ts")
    val got = Scd2.buildScd2(updates, Seq("id"), Seq("tier"), "ts")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().sortBy(r => (r._1, r._3))
    assert(got.toSeq === Seq(
      (1L, "bronze", 10L, Some(30L), false),
      (1L, "silver", 30L, Some(50L), false),
      (1L, "bronze", 50L, None, true),
      (2L, "gold", 15L, None, true)))
  }

  test("null attribute is a state of its own (null-safe change detection)") {
    val updates = Seq(
      (1L, Option("a"), 1L), (1L, Option.empty[String], 2L),
      (1L, Option.empty[String], 3L), (1L, Option("a"), 4L)
    ).toDF("id", "attr", "ts")
    val got = Scd2.buildScd2(updates, Seq("id"), Seq("attr"), "ts").collect()
    assert(got.length === 3) // a → null → a; the repeated null collapses
  }

  test("multi-attribute change on ANY column opens a new interval") {
    val updates = Seq(
      (1L, "a", 10, 1L), (1L, "a", 20, 2L), (1L, "b", 20, 3L)
    ).toDF("id", "x", "y", "ts")
    val got = Scd2.buildScd2(updates, Seq("id"), Seq("x", "y"), "ts").collect()
    assert(got.length === 3)
    assert(got.count(_.getAs[Boolean]("is_current")) === 1)
  }
}
