package graft

import org.apache.spark.sql.functions._
import graft.operators.TableDiff
import graft.sources.Tables

class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  private def base = Tables.table(spark, sf, "orders")
    .select("o_orderkey", "o_orderstatus", "o_totalprice")

  test("snapshotDiff: classifies inserts, deletes, updates; drops unchanged") {
    val oldSnap = base.filter($"o_orderkey" % 7 =!= 0)
    val newSnap = base.filter($"o_orderkey" % 5 =!= 0)
      .withColumn("o_totalprice",
        when($"o_orderkey" % 3 === 0, $"o_totalprice" * 1.1).otherwise($"o_totalprice"))
    val diff = TableDiff.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey")).cache()
    val byType = diff.groupBy("change_type").count().as[(String, Long)].collect().toMap
    // expected classes from the key arithmetic
    val inserts = base.filter($"o_orderkey" % 7 === 0 && $"o_orderkey" % 5 =!= 0).count()
    val deletes = base.filter($"o_orderkey" % 7 =!= 0 && $"o_orderkey" % 5 === 0).count()
    val updates = base.filter($"o_orderkey" % 7 =!= 0 && $"o_orderkey" % 5 =!= 0 &&
      $"o_orderkey" % 3 === 0).count()
    assert(byType.getOrElse("insert", 0L) === inserts)
    assert(byType.getOrElse("delete", 0L) === deletes)
    assert(byType.getOrElse("update", 0L) === updates)
    // unchanged keys never appear
    val unchanged = base.filter($"o_orderkey" % 7 =!= 0 && $"o_orderkey" % 5 =!= 0 &&
      $"o_orderkey" % 3 =!= 0).select("o_orderkey")
    assert(diff.join(unchanged, "o_orderkey").count() === 0)
    // old/new sides populated per class
    assert(diff.filter($"change_type" === "insert" && $"o_totalprice_old".isNotNull).count() === 0)
    assert(diff.filter($"change_type" === "delete" && $"o_totalprice_new".isNotNull).count() === 0)
    assert(diff.filter($"change_type" === "update" &&
      ($"o_totalprice_old".isNull || $"o_totalprice_new".isNull)).count() === 0)
    diff.unpersist()
  }

  test("snapshotDiff: empty diff on identical snapshots; null keys pair null-safely") {
    assert(TableDiff.snapshotDiff(base, base, Seq("o_orderkey")).count() === 0)
    val withNull = Seq((Some(1L), "a"), (None, "b")).toDF("k", "v")
    val changedNull = Seq((Some(1L), "a"), (None, "c")).toDF("k", "v")
    val d = TableDiff.snapshotDiff(withNull, changedNull, Seq("k"))
      .select("k", "change_type", "v_old", "v_new")
      .as[(Option[Long], String, String, String)].collect()
    // the null-key row exists in both snapshots → ONE update, not a
    // delete+insert pair
    assert(d.toSeq === Seq((None, "update", "b", "c")))
  }

  test("snapshotDiff feeds keyedUpsert: applying the diff reproduces the new snapshot") {
    val oldSnap = base.filter($"o_orderkey" % 7 =!= 0)
    val newSnap = base.filter($"o_orderkey" % 5 =!= 0)
      .withColumn("o_totalprice",
        when($"o_orderkey" % 3 === 0, $"o_totalprice" * 1.1).otherwise($"o_totalprice"))
    val diff = TableDiff.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"))
    // upserts = inserts+updates (new side), deletes applied as anti-join
    val upserts = diff.filter($"change_type".isin("insert", "update"))
      .select($"o_orderkey", $"o_orderstatus_new".as("o_orderstatus"),
        $"o_totalprice_new".as("o_totalprice"))
    val deletes = diff.filter($"change_type" === "delete").select("o_orderkey")
    val applied = graft.operators.Upsert.keyedUpsert(oldSnap, upserts, Seq("o_orderkey"))
      .join(deletes, Seq("o_orderkey"), "left_anti")
    assert(applied.except(newSnap).count() === 0)
    assert(newSnap.except(applied).count() === 0)
  }
}
