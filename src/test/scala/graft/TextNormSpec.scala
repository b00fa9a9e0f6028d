package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions
import graft.operators.Dedup

class TextNormSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeText: NFC composes, NFD decomposes, NFKC folds compatibility chars") {
    val decomposed = "été" // e + combining acute, twice
    val composed = "été"     // été with precomposed é
    val df = Seq((decomposed, composed, "ﬁn x")).toDF("dec", "comp", "compat")
    val r = df.select(
      Expressions.normalizeText($"dec", "NFC").as("nfc"),
      Expressions.normalizeText($"comp", "NFD").as("nfd"),
      Expressions.normalizeText($"compat", "NFKC").as("nfkc"),
      length(Expressions.normalizeText($"dec", "NFC")).as("nfc_len"),
      length($"dec").as("raw_len")).as[(String, String, String, Int, Int)].head()
    assert(r._1 === composed)      // NFC(decomposed) = composed
    assert(r._2 === decomposed)    // NFD(composed) = decomposed
    assert(r._3 === "fin x")       // ﬁ ligature + nbsp folded by NFKC
    assert(r._4 === 3 && r._5 === 5)
    // null propagates; unknown form rejected at construction
    assert(Seq(Option.empty[String]).toDF("s")
      .select(Expressions.normalizeText($"s")).head().isNullAt(0))
    intercept[IllegalArgumentException] {
      Expressions.normalizeText(lit("x"), "NFX")
    }
  }

  test("stripAccents: removes marks from composed AND decomposed input; single-codepoint letters pass") {
    val df = Seq(("café", "café", "straße øre")).toDF("comp", "dec", "single")
    val r = df.select(
      Expressions.stripAccents($"comp"),
      Expressions.stripAccents($"dec"),
      Expressions.stripAccents($"single")).as[(String, String, String)].head()
    assert(r._1 === "cafe" && r._2 === "cafe")
    // ß and ø are single code points, not base+mark — pass through (the
    // documented utf8proc-compatible contract)
    assert(r._3 === "straße øre")
  }

  test("normalization closes the dedup gap: composed/decomposed twins fingerprint identically after NFC") {
    val docs = Seq((1L, "café au lait"), (2L, "café au lait"), (3L, "tea"))
      .toDF("doc_id", "text")
    // without normalization: the visually identical docs hash apart
    val raw = Dedup.exactByFingerprint(docs, "text", "doc_id")
    assert(raw.count() === 3)
    // with NFC canonicalization first: they collapse
    val canon = Dedup.exactByFingerprint(
      docs.withColumn("text", Expressions.normalizeText($"text", "NFC")), "text", "doc_id")
    assert(canon.count() === 2)
    assert(canon.filter($"n_copies" === 2).count() === 1)
  }

  test("codegen-safe and SQL-callable") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val df = Seq("é", "x").toDF("s")
      assert(df.select(Expressions.normalizeText($"s", "NFC"),
        Expressions.stripAccents($"s")).count() === 2)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
    Seq("café").toDF("s").createOrReplaceTempView("norm_sql")
    val viaSql = spark.sql(
      "SELECT graft_normalize(s), graft_normalize(s, 'NFD'), graft_strip_accents(s) FROM norm_sql")
      .as[(String, String, String)].head()
    assert(viaSql._1 === "café" && viaSql._2 === "café" && viaSql._3 === "cafe")
  }
}
