package graft

import org.apache.spark.sql.functions._
import graft.operators.Repetition

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def signals(rows: (Long, String)*) =
    Repetition.repetitionSignals(rows.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("repetitionSignals: hand-computed fixtures") {
    val s = signals(
      1L -> "aaa\nbbb\naaa\nccc",          // 4 lines, 'aaa' twice
      2L -> "x y x y x y",                  // bigram loop
      3L -> "unique lines\nonly here",      // no repetition
      4L -> "",                             // degenerate
      5L -> "one\n\n \none")                // blank lines dropped, 'one' twice
    // doc 1: 4 lines, 1 repeat → dup_line_frac 1/4; chars: aaa repeated =
    // 3 of 12 → 0.25; tokens [aaa bbb aaa ccc] → 3 distinct bigrams → 1/3
    assert(s(1L) === ((4L, 0.25, 0.25, 1.0 / 3)))
    // doc 2: bigrams of [x y x y x y]: "x y"×3, "y x"×2 → top 3/5
    assert(s(2L)._4 === 3.0 / 5)
    assert(s(2L)._2 === 0.0) // single line → no line repeats ... (1 line)
    // doc 3: nothing repeats; 3 distinct bigrams of 3 occurrences → top 1/3
    assert(s(3L) === ((2L, 0.0, 0.0, 1.0 / 3)))
    // doc 4: no lines, no bigrams → all zero
    assert(s(4L) === ((0L, 0.0, 0.0, 0.0)))
    // doc 5: two non-blank lines, both 'one' → dup 1/2 by count and chars
    assert(s(5L)._1 === 2L)
    assert(s(5L)._2 === 0.5 && s(5L)._3 === 0.5)
  }

  test("repetitionSignals: every doc scored once, fractions in range, on the fixture") {
    val docs = graft.sources.Tables.table(spark, sf, "documents")
      .withColumn("text", regexp_replace(col("text"), "(\\S+ \\S+) ", "$1\n"))
    val sig = Repetition.repetitionSignals(docs, "doc_id", "text").cache()
    assert(sig.count() === docs.count())
    assert(sig.filter(
      col("dup_line_frac") < 0 || col("dup_line_frac") > 1 ||
      col("dup_line_char_frac") < 0 || col("dup_line_char_frac") > 1 ||
      col("top_bigram_frac") < 0 || col("top_bigram_frac") > 1).count() === 0)
    // the small-vocabulary fixture must show real repetition signal
    assert(sig.filter(col("top_bigram_frac") > 0.05).count() > 0)
    sig.unpersist()
  }
}
