package graft

import org.apache.spark.sql.functions._
import graft.operators.Report

class ReportSpec extends SparkSpec {
  import spark.implicits._

  test("corpusReport: counts, token totals, and the exact lower-median length") {
    // source A/en: lengths 1, 3, 5 (median = 3); source B/en: lengths 2, 4
    // (lower median of even n = the n/2-th = 2)
    val docs = Seq(
      ("A", "en", "x"),
      ("A", "en", "a b"),
      ("A", "en", "a b c"),
      ("B", "en", "ab"),
      ("B", "en", "a bc")).toDF("source", "lang", "text")
    val rep = Report.corpusReport(docs, "source", "lang", "text")
      .select($"source", $"n_docs", $"n_tokens", $"median_len")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rep("A") === ("A", 3L, 1L + 2L + 3L, 3L))
    assert(rep("B") === ("B", 2L, 1L + 2L, 2L))
  }

  test("topFractionBy: exactly ceil(frac*n) survivors per block, best-ranked first") {
    // block p: 5 rows scored 50..10 → ceil(0.6*5)=3 kept (top scores 50,40,30)
    // block q: 1 row → ceil(0.6)=1 kept (a block is never emptied)
    val rows = Seq(
      ("p", 1L, 10.0), ("p", 2L, 20.0), ("p", 3L, 30.0), ("p", 4L, 40.0), ("p", 5L, 50.0),
      ("q", 6L, 5.0)).toDF("blk", "id", "score")
    val kept = Report.topFractionBy(rows, Seq("blk"), "id", fraction = 0.6, rankBy = $"score")
      .select($"id").as[Long].collect().toSet
    assert(kept === Set(3L, 4L, 5L, 6L))
    // ties break by ascending id: ceil(0.33*3) = 1 slot, two rows tied at
    // the cut score — the smaller id survives, deterministically
    val tied = Seq(("t", 1L, 9.0), ("t", 2L, 9.0), ("t", 3L, 1.0))
      .toDF("blk", "id", "score")
    val keptTied = Report.topFractionBy(tied, Seq("blk"), "id", fraction = 0.33, rankBy = $"score")
      .select($"id").as[Long].collect().toSet
    assert(keptTied === Set(1L))
  }
}
