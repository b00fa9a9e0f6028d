package graft

import org.apache.spark.sql.functions._
import graft.operators.Upsert

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
    .toDF("id", "name", "v")
  private def source = Seq((2, "B2", 99.0), (4, "d", 40.0))
    .toDF("id", "name", "v")

  test("keyedUpsert: source wins on key match, unmatched target survives, new keys insert") {
    val got = Upsert.keyedUpsert(target, source, Seq("id"))
      .orderBy("id").as[(Int, String, Double)].collect().toSeq
    assert(got === Seq((1, "a", 10.0), (2, "B2", 99.0), (3, "c", 30.0), (4, "d", 40.0)))
  }

  test("keyedUpsert is idempotent: upsert(upsert(t,s),s) == upsert(t,s)") {
    val once = Upsert.keyedUpsert(target, source, Seq("id"))
    val twice = Upsert.keyedUpsert(once, source, Seq("id"))
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("allColumnsUpsert equals dedup-union (insert-if-row-absent)") {
    val t = target
    val s = target.limit(2).unionByName(Seq((5, "e", 50.0)).toDF("id", "name", "v"))
    val got = Upsert.allColumnsUpsert(t, s)
    val expected = t.unionByName(s).dropDuplicates("id", "name", "v")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    assert(got.count() === 4) // 3 original + 1 new, overlapping rows deduped
  }

  test("allColumnsUpsert treats null fields as equal (idempotent re-load of null-bearing rows)") {
    val t = Seq((1, Option("a"), Option(10.0)), (2, Option.empty[String], Option(20.0)),
      (3, Option("c"), Option.empty[Double])).toDF("id", "name", "v")
    // identical re-ship, including rows with nulls
    val got = Upsert.allColumnsUpsert(t, t, auditCols = Nil)
    assert(got.count() === 3, "null-bearing rows must not duplicate on re-load")
    val twice = Upsert.allColumnsUpsert(got, t, auditCols = Nil)
    assert(twice.count() === 3)
  }

  test("mergeStaging folds N increments left-to-right (later staging wins)") {
    val s1 = Seq((1, "x", 1.0)).toDF("id", "name", "v")
    val s2 = Seq((1, "y", 2.0)).toDF("id", "name", "v")
    val got = Upsert.mergeStaging(target, Seq(s1, s2), Seq("id"))
    val row1 = got.filter($"id" === 1).as[(Int, String, Double)].head()
    assert(row1 === ((1, "y", 2.0)))
  }

  test("distinctOn keeps exactly one row per key, chosen by tiebreak") {
    val df = Seq((1, "b", 2), (1, "a", 1), (2, "c", 3)).toDF("k", "s", "o")
    val got = Upsert.distinctOn(df, Seq("k"), Seq(col("o").asc))
      .orderBy("k").as[(Int, String, Int)].collect().toSeq
    assert(got === Seq((1, "a", 1), (2, "c", 3)))
  }
}
