package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount ignores repeated whitespace and empties") {
    val got = Seq("a  b   c ", "", "   ", "one").toDF("t")
      .select(TextFns.tokenCount($"t").as("n")).as[Int].collect().toSeq
    assert(got === Seq(3, 0, 0, 1))
  }

  test("native tokenCount/stopwordRatio/langId ≡ Column-form twins on edge rows") {
    // the native kernels (byte-scan count, one-pass profile hits) against
    // the interpreted-HOF Column forms they replaced, on the hazards:
    // multi-byte UTF-8 (no false whitespace inside continuation bytes),
    // the non-ASCII profile word "für" (needs real Unicode lowercase),
    // decomposed accents (exact code-unit comparison on both sides),
    // tabs/newlines/vertical-tab separators, empty, blank, null
    val rows = Seq(
      Some("the quick brown fox and the lazy dog"),
      Some("FÜR alle Daten ist der Weg und die Zeit"),
      Some("für decomposed umlaut und der test"),
      Some("el gato\tde la casa\ny los perros"),
      Some("multibyte éé café 中文 tokens"),
      Some("   "), Some(""), None)
    val df = rows.toDF("t")
    val stops = TextFns.LangId.profiles.flatMap(_._2).distinct
    val got = df.select(
        TextFns.tokenCount($"t").as("n"), TextFns.tokenCountColumns($"t").as("nc"),
        TextFns.stopwordRatio($"t", stops).as("r"),
        TextFns.stopwordRatioColumns($"t", stops).as("rc"),
        TextFns.LangId.langId($"t").as("l"),
        TextFns.LangId.langIdColumns($"t").as("lc"))
      .as[(Option[Int], Option[Int], Option[Double], Option[Double],
           Option[String], Option[String])].collect()
    got.zip(rows).foreach { case ((n, nc, r, rc, l, lc), in) =>
      assert(n === nc, s"tokenCount diverged on $in")
      assert(r === rc, s"stopwordRatio diverged on $in")
      assert(l === lc, s"langId diverged on $in")
    }
  }

  test("punctRatio counts ASCII punctuation share") {
    val got = Seq("ab,.", "abcd").toDF("t")
      .select(TextFns.punctRatio($"t").as("r")).as[Double].collect().toSeq
    assert(got === Seq(0.5, 0.0))
  }

  test("langId picks the profile with most stopword hits, 'und' when none") {
    val got = Seq(
      "the cat is in the house and it is warm",
      "el gato de la casa y los perros",
      "le chat dans le jardin et les fleurs",
      "qwerty zxcvb asdf").toDF("t")
      .select(TextFns.LangId.langId($"t").as("l")).as[String].collect().toSeq
    assert(got === Seq("en", "es", "fr", "und"))
  }

  test("fingerprint is whitespace/case-insensitive, content-sensitive") {
    val fps = Seq("Hello  World", "hello world", "hello worlds").toDF("t")
      .select(TextFns.fingerprint($"t").as("f")).as[String].collect().toSeq
    assert(fps(0) === fps(1)); assert(fps(0) != fps(2))
  }

  test("qualityScore in [0,1]; clean prose beats punctuation soup") {
    val scores = Seq(
      "the quick brown fox jumps over the lazy dog and it is a fine day in the park",
      "!!! ### $$$ %%% ^^^ &&& *** ((( ))) @@@").toDF("t")
      .select(TextFns.qualityScore($"t").as("q")).as[Double].collect().toSeq
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
  }

  test("subwordCount splits on word/punct boundaries, ignores all whitespace kinds") {
    val got = Seq("don't stop-me now123").toDF("t")
      .select(TextFns.subwordCount($"t").as("n")).as[Int].head()
    assert(got >= 6) // don ' t stop - me now 123
    val ws = Seq("a\tb\nc").toDF("t").select(TextFns.subwordCount($"t").as("n")).as[Int].head()
    assert(ws === 3) // tabs/newlines are separators, not tokens
  }

  test("fingerprint64 is whitespace/case-insensitive, content-sensitive") {
    val fps = Seq("Hello  World", "hello world", "hello worlds").toDF("t")
      .select(TextFns.fingerprint64($"t").as("f")).as[Long].collect().toSeq
    assert(fps(0) === fps(1)); assert(fps(0) != fps(2))
  }

  test("null text: null out everywhere, never -1 counts, 'en' labels, or phantom quality") {
    // the ANSI-off session's legacy size(null) = -1 must not leak through
    // any counting function (a -1 token count scored null docs as 100%
    // stopwords and labeled them 'en')
    val df = Seq(Option.empty[String], Some("the quick brown fox and the dog today ok fine")).toDF("t")
    val got = df.select(
      TextFns.tokenCount($"t").as("n"),
      TextFns.subwordCount($"t").as("sw"),
      TextFns.stopwordRatio($"t", Seq("the")).as("sr"),
      TextFns.LangId.langId($"t").as("lang"),
      TextFns.qualityScore($"t").as("q"))
      .as[(Option[Int], Option[Int], Option[Double], Option[String], Option[Double])]
      .collect()
    assert(got(0) === ((None, None, None, None, None)))
    val (n, _, sr, lang, q) = got(1)
    assert(n === Some(10) && sr.get > 0 && lang === Some("en") && q.get > 0.5)
  }

  test("scriptCount / charCount: per-script character counts on mixed text") {
    val got = Seq("hello мир 你好 ok").toDF("t").select(
      TextFns.charCount($"t"),
      TextFns.scriptCount($"t", "Latin"),
      TextFns.scriptCount($"t", "Cyrillic"),
      TextFns.scriptCount($"t", "Han"))
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((12L, 7L, 3L, 2L))) // hello+ok=7 latin, мир=3, 你好=2
  }

  test("compressionRatio: repetition compresses below varied prose; empty text is 1.0; deterministic") {
    val rep = "spam spam spam spam " * 50
    val varied = (1 to 200).map(i => s"w${i * 7919 % 1000}x$i").mkString(" ")
    val df = Seq(("rep", rep), ("var", varied), ("empty", "")).toDF("k", "t")
      .select($"k", TextFns.compressionRatio($"t").as("r"))
    val got = df.as[(String, Double)].collect().toMap
    assert(got("rep") < got("var") / 2, s"repetitive ${got("rep")} should be far below varied ${got("var")}")
    assert(got("empty") === 1.0)
    assert(got("rep") > 0.0 && got("var") < 1.5)
    // same input → same ratio on a second evaluation (fixed level, one zlib)
    val again = Seq(("rep", rep)).toDF("k", "t")
      .select(TextFns.compressionRatio($"t")).as[Double].head()
    assert(again === got("rep"))
  }
}
