package graft

import org.apache.spark.sql.functions._
import graft.operators.Pack

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: hand-checked chunking within one shard") {
    // one shard → deterministic linear layout; budget 10
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 7L), (4L, 10L), (5L, 1L))
      .toDF("doc_id", "n_tokens")
    val got = Pack.packSequences(docs, "doc_id", "n_tokens", budget = 10, shards = 1)
      .orderBy("doc_id", "seq")
      .select("doc_id", "seq", "tok_start", "tok_len")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // stream: d1[0,4) d2[4,8) d3[8,15) d4[15,25) d5[25,26)
    assert(got === Seq(
      (1L, 0L, 0L, 4L),            // fits seq 0
      (2L, 0L, 0L, 4L),            // fits seq 0
      (3L, 0L, 0L, 2L), (3L, 1L, 2L, 5L),   // straddles 0/1
      (4L, 1L, 0L, 5L), (4L, 2L, 5L, 5L),   // straddles 1/2
      (5L, 2L, 0L, 1L)))
  }

  test("packSequences: shard offsets continue the stream — the last partial sequence tops up") {
    // batch 1 in one shard, budget 10: d1[0,7) d2[7,13) — seq 1 is
    // partially filled to position 13
    val b1 = Pack.packSequences(Seq((1L, 7L), (2L, 6L)).toDF("doc_id", "n_tokens"),
      "doc_id", "n_tokens", budget = 10, shards = 1)
    val offs = Pack.shardOffsets(b1)
    assert(offs.as[(Int, Long)].collect().toSeq === Seq((0, 13L)))
    // batch 2 continues at 13: d3[13,18) lands entirely in seq 1 at
    // offset 3 INSIDE the doc's own token stream? no — tok_start is
    // doc-relative: greatest(13, 10) - 13 = 0, len = 18 - 13 = 5
    val b2 = Pack.packSequences(Seq((3L, 5L)).toDF("doc_id", "n_tokens"),
      "doc_id", "n_tokens", budget = 10, shards = 1, shardOffsets = Some(offs))
    val got = b2.select("doc_id", "shard", "seq", "tok_start", "tok_len")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(got === Seq((3L, 0, 1L, 0L, 5L)))
    // accumulated offsets: union of both batches' pieces
    val offs2 = Pack.shardOffsets(b1.unionByName(b2))
    assert(offs2.as[(Int, Long)].collect().toSeq === Seq((0, 18L)))
    // a shard with no offset row starts at 0 (left-join coalesce)
    val fresh = Pack.packSequences(Seq((4L, 4L)).toDF("doc_id", "n_tokens"),
      "doc_id", "n_tokens", budget = 10, shards = 1,
      shardOffsets = Some(Seq((99, 7L)).toDF("shard", "offset_tokens")))
    assert(fresh.select("seq", "tok_start", "tok_len").as[(Long, Long, Long)]
      .collect().toSeq === Seq((0L, 0L, 4L)))
  }

  test("packSequences: invariants on the fixture — conservation, exact fills, stability") {
    val docs = graft.sources.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), graft.functions.TextFns.tokenCount(col("text")).cast("long").as("n_tokens"))
    val packed = Pack.packSequences(docs, "doc_id", "n_tokens", budget = 128, shards = 8).cache()
    // token conservation: every document's tokens all land somewhere
    val inTokens = docs.filter($"n_tokens" > 0).agg(sum("n_tokens")).as[Long].head()
    assert(packed.agg(sum("tok_len")).as[Long].head() === inTokens)
    // piece offsets tile each document exactly: min start 0, contiguous
    val perDoc = packed.groupBy("doc_id")
      .agg(min("tok_start").as("mn"), max($"tok_start" + $"tok_len").as("mx"),
        sum("tok_len").as("tot"))
      .join(docs, "doc_id")
    assert(perDoc.filter($"mn" =!= 0 || $"mx" =!= $"n_tokens" || $"tot" =!= $"n_tokens")
      .count() === 0)
    // every sequence except a shard's last is filled to exactly the budget
    val stats = Pack.packingStats(packed, 128)
    assert(stats.filter($"n_seqs" - 1 =!= $"full_seqs" && $"n_seqs" =!= $"full_seqs")
      .count() === 0)
    // assignment independent of input partitioning
    val repacked = Pack.packSequences(docs.repartition(17), "doc_id", "n_tokens",
      budget = 128, shards = 8)
    assert(packed.except(repacked).count() === 0 && repacked.except(packed).count() === 0)
    packed.unpersist()
  }

  test("scrubPii: emails, IPs, phones redacted; clean text untouched") {
    val df = Seq(
      "write to jane.doe+x@corp.example.org today",
      "server 10.0.255.7 rebooted",
      "call +34 600 123 456 now",
      "or (555) 123-4567 ext",
      "just plain words 42 here").toDF("t")
    val got = df.select(graft.functions.TextFns.scrubPii($"t")).as[String].collect().toSeq
    assert(got === Seq(
      "write to <EMAIL> today",
      "server <IP> rebooted",
      "call <PHONE> now",
      "or <PHONE> ext",
      "just plain words 42 here"))
  }

  test("scrubPii: native expression ≡ prefiltered Column form ≡ raw regex chain") {
    import graft.functions.TextFns
    // three independent implementations must agree row-for-row: the
    // native one-pass expression (production path), the prefiltered
    // chained-built-ins form (differential baseline), and the raw chain
    // with no prefilter. The [@0-9] fast path must be OUTPUT-INVISIBLE:
    // every PII pattern requires an '@' or an ASCII digit, so all forms
    // must agree on digit-free prose, digit-bearing non-PII, real PII,
    // adjacent multi-PII, unicode digits (NOT ASCII — must take the slow
    // path only if [0-9] matches; '٣' does not), empty, and null
    val raw = (t: org.apache.spark.sql.Column) =>
      regexp_replace(regexp_replace(regexp_replace(t,
        TextFns.Pii.email, "<EMAIL>"), TextFns.Pii.ipv4, "<IP>"),
        TextFns.Pii.phone, "<PHONE>")
    val df = Seq(
      Some("clean prose with no digits at all"),
      Some("version 2 of 3 things"),
      Some("mail a@b.co or ping 10.0.0.1 or +1 555 123 4567"),
      Some("a@b.co c@d.org back to back 1.2.3.4 5.6.7.8"),
      Some("digits inside email local 99bottles@wall.example then 0800 555 0199"),
      Some("arabic digits ٣٤٥ only"),
      Some(""), None).toDF("t")
    val all = df.select(TextFns.scrubPii($"t").as("native"),
        TextFns.scrubPiiColumns($"t").as("cols"), raw($"t").as("slow"))
      .as[(Option[String], Option[String], Option[String])].collect()
    all.foreach { case (n, c, s) => assert(n === c && c === s) }
  }

  test("chunkTokens: overlapping windows, clamped tail, empty doc emits nothing") {
    val d = Seq((1L, "t1 t2 t3 t4 t5"), (2L, "solo"), (3L, "  ")).toDF("id", "text")
    val got = graft.operators.Pack.chunkTokens(d, "id", "text", window = 3, stride = 2)
      .as[(Long, Long, Long, String)].collect().toSeq.sorted
    assert(got === Seq(
      (1L, 0L, 3L, "t1 t2 t3"),
      (1L, 1L, 3L, "t3 t4 t5"), // overlap of window - stride = 1 token
      (1L, 2L, 1L, "t5"),       // tail clamped at the document end
      (2L, 0L, 1L, "solo")))    // doc 3 is whitespace-only: no chunks
  }
}
