package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.DataFrame
import graft.operators.Upsert

/** Property tests for the MERGE-emulation kernels (SURVEY §5): idempotence,
  * source-wins, and all-columns ≡ dedup-union, over randomized small
  * relations (plain ScalaCheck generators, fixed seeds for reproducibility).
  */
class UpsertPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = for {
    k <- Gen.choose(0, 8)
    v <- Gen.choose(0, 100)
    s <- Gen.oneOf("a", "b", "c")
  } yield (k, s, v)

  private val relGen: Gen[List[(Int, String, Int)]] = Gen.listOfN(12, rowGen)

  private def cases(n: Int): Seq[(List[(Int, String, Int)], List[(Int, String, Int)])] =
    (0 until n).map { i =>
      (relGen.apply(Gen.Parameters.default, Seed(i * 2L)).get,
        relGen.apply(Gen.Parameters.default, Seed(i * 2L + 1)).get)
    }

  private def df(rows: List[(Int, String, Int)]): DataFrame =
    rows.toDF("k", "s", "v")

  private def sorted(d: DataFrame): Seq[(Int, String, Int)] =
    d.as[(Int, String, Int)].collect().toSeq.sorted

  test("keyedUpsert is idempotent for key-unique sources") {
    cases(10).foreach { case (t, sRaw) =>
      // MERGE requires a key-unique source (DuckDB errors on dup-key source)
      val s = sRaw.distinctBy(_._1)
      val once = Upsert.keyedUpsert(df(t), df(s), Seq("k"))
      val twice = Upsert.keyedUpsert(once, df(s), Seq("k"))
      assert(sorted(once) === sorted(twice), s"t=$t s=$s")
    }
  }

  test("keyedUpsert is idempotent and source-wins on null keys (null-safe matching)") {
    val t = Seq((Some(1), "a", 1), (None, "b", 2), (Some(3), "c", 3))
      .toDF("k", "s", "v")
    val s = Seq((Some(1), "a2", 10), (None, "b2", 20)).toDF("k", "s", "v")
    def rows(d: DataFrame) =
      d.as[(Option[Int], String, Int)].collect().toSeq.sortBy(r => (r._1, r._2))
    val once = Upsert.keyedUpsert(t, s, Seq("k"))
    // null key matches null key: target's null-key row is replaced, not kept
    assert(rows(once) === Seq((None, "b2", 20), (Some(1), "a2", 10), (Some(3), "c", 3)))
    val twice = Upsert.keyedUpsert(once, s, Seq("k"))
    assert(rows(twice) === rows(once))
  }

  test("keyedUpsert: source rows verbatim; target rows survive iff key unmatched") {
    cases(10).foreach { case (t, sRaw) =>
      val s = sRaw.distinctBy(_._1)
      val got = sorted(Upsert.keyedUpsert(df(t), df(s), Seq("k")))
      val sKeys = s.map(_._1).toSet
      val expected = (s ++ t.filterNot(r => sKeys.contains(r._1))).sorted
      assert(got === expected, s"t=$t s=$s")
    }
  }

  test("allColumnsUpsert ≡ union + distinct on data columns") {
    cases(10).foreach { case (t, s) =>
      val got = sorted(Upsert.allColumnsUpsert(df(t), df(s), auditCols = Nil))
      val expected = (t ++ s).distinct.sorted
      assert(got === expected, s"t=$t s=$s")
    }
  }

  test("distinctOn emits exactly one row per key: the tiebreak minimum") {
    import org.apache.spark.sql.functions.col
    cases(10).foreach { case (t, _) =>
      val got = sorted(Upsert.distinctOn(df(t), Seq("k"), Seq(col("s").asc, col("v").asc)))
      val expected = t.groupBy(_._1).map { case (_, rows) =>
        rows.minBy(r => (r._2, r._3))
      }.toSeq.sorted
      assert(got === expected, s"t=$t")
    }
  }
}
