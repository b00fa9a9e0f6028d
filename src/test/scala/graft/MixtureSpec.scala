package graft

import org.apache.spark.sql.functions._
import graft.operators.{BloomJoin, Mixture}
import graft.sources.Tables

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.table(spark, sf, "documents")

  test("mixCorpora: epoch structure — floor(w) full copies + nested fractional epoch") {
    val en = docs.filter($"lang" === "en").select("doc_id")
    val nEn = en.count()
    val mixed = Mixture.mixCorpora(Seq(("en", en, 2.5)), key = $"doc_id").cache()
    val byEpoch = mixed.groupBy("mix_epoch").count().as[(Long, Long)].collect().toMap
    // epochs 0 and 1 are complete copies; epoch 2 is the ~50% sample
    assert(byEpoch(0L) === nEn && byEpoch(1L) === nEn)
    assert(byEpoch(2L) > 0 && byEpoch(2L) < nEn)
    // raising the weight only ADDS rows (nested fractional epochs)
    val wider = Mixture.mixCorpora(Seq(("en", en, 2.8)), key = $"doc_id")
    assert(mixed.except(wider).count() === 0)
    // weight < 1 → single partial epoch
    val sub = Mixture.mixCorpora(Seq(("en", en, 0.3)), key = $"doc_id")
    assert(sub.select("mix_epoch").distinct().as[Long].collect().toSeq === Seq(0L))
    val r = sub.count().toDouble / nEn
    assert(r > 0.15 && r < 0.45, s"0.3 weight sampled at $r")
    mixed.unpersist()
  }

  test("mixCorpora: multi-source union tags provenance; same key samples independently per source") {
    val en = docs.filter($"lang" === "en").select("doc_id")
    val es = docs.filter($"lang" === "es").select("doc_id")
    val mixed = Mixture.mixCorpora(Seq(("en", en, 0.5), ("es", es, 0.5)), key = $"doc_id")
    val bySource = mixed.groupBy("mix_source").count().as[(String, Long)].collect().toMap
    assert(bySource.keySet === Set("en", "es"))
    // deterministic: re-running yields the identical multiset
    val again = Mixture.mixCorpora(Seq(("en", en, 0.5), ("es", es, 0.5)), key = $"doc_id")
    assert(mixed.except(again).count() === 0 && again.except(mixed).count() === 0)
  }

  test("bloomPrunedJoin: exactly the plain join's rows; composite keys too") {
    val li = Tables.table(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_suppkey".as("s_suppkey"), $"l_quantity")
    val small = Tables.table(spark, sf, "supplier")
      .filter($"s_nationkey" === 3).select("s_suppkey", "s_name")
    val pruned = BloomJoin.bloomPrunedJoin(li, small, Seq("s_suppkey"))
    val plain = li.join(small, "s_suppkey")
    assert(pruned.except(plain).count() === 0 && plain.except(pruned).count() === 0)
    assert(pruned.count() === plain.count() && pruned.count() > 0)
    // composite key path
    val liC = li.withColumn("part", $"l_orderkey" % 3)
    val smallC = small.withColumn("part", lit(0))
    val prunedC = BloomJoin.bloomPrunedJoin(liC, smallC, Seq("s_suppkey", "part"))
    val plainC = liC.join(smallC, Seq("s_suppkey", "part"))
    assert(prunedC.except(plainC).count() === 0 && plainC.except(prunedC).count() === 0)
  }

  test("bloomPrunedJoin: the filter actually prunes the big side before the join") {
    val li = Tables.table(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_suppkey".as("s_suppkey"))
    val small = Tables.table(spark, sf, "supplier")
      .filter($"s_nationkey" === 3).select("s_suppkey", "s_name")
    val keyCount = small.count()
    // at fpp 1% the surviving fraction must be close to the true match
    // fraction, far below 1 (the whole point of the reduction)
    val bloom = li.select($"s_suppkey".cast("string").as("__k"))
      .stat.bloomFilter("__k", math.max(1, keyCount), 0.01)
    assert(bloom.bitSize() > 0) // sketch is fixed-size, independent of li rows
    val survivors = BloomJoin.bloomPrunedJoin(li, small, Seq("s_suppkey"))
    val matchRows = li.join(small.select("s_suppkey"), "s_suppkey").count()
    assert(survivors.count() === matchRows)
  }

  test("sourceQuota: caps each source at quota, best-ranked first; two-phase ≡ plain window") {
    val docs = Tables.table(spark, sf, "documents")
    val plain = Mixture.sourceQuota(docs, "source", "doc_id", quota = 7,
      rankBy = $"n_chars")
    // every source at most 7 docs; a source with >= 7 docs is exactly 7
    val perSource = plain.groupBy("source").count().as[(String, Long)].collect().toMap
    val sizes = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    sizes.foreach { case (s, n) =>
      assert(perSource.getOrElse(s, 0L) === math.min(n, 7L), s"source $s") }
    // kept docs are each source's longest (no kept doc is outranked by a
    // dropped doc of the same source)
    val minKept = plain.groupBy("source").agg(min($"n_chars").as("mn"))
    val violations = docs.join(plain.select($"doc_id").withColumn("__k", lit(1)),
        Seq("doc_id"), "left").filter($"__k".isNull)
      .join(minKept, "source").filter($"n_chars" > $"mn").count()
    assert(violations === 0L)
    // the skew-safe two-phase path is row-identical for every bucket count
    for (b <- Seq(2, 8, 64)) {
      val two = Mixture.sourceQuota(docs, "source", "doc_id", quota = 7,
        rankBy = $"n_chars", preBuckets = b)
      assert(two.exceptAll(plain).isEmpty && plain.exceptAll(two).isEmpty,
        s"two-phase (preBuckets=$b) diverged from the plain window")
    }
  }
}
