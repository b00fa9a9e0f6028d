package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Dsir, Mixture, Pack, Retrieval, Similarity}
import graft.sources.Tables

/** Parameter-fuzz over the parameterized operators: the oracle catalog
  * proves each operator at ONE parameter point (the DuckDB twin bakes the
  * literals in); this spec re-runs the parameterized families at
  * non-default settings against INDEPENDENT references — driver-side Scala
  * brute force over the collected sf0.001 fixture, sibling Spark
  * implementations that must agree pairwise, or exactness invariants that
  * hold for every parameter (PQ with a full-corpus rerank shortlist IS
  * brute force). The grid is fixed and deterministic (seeded by writing it
  * down); any divergence found here becomes a pinned regression.
  *
  * Reference-fidelity notes (the traps the catalog oracles already
  * document): Spark `round(x, 6)` is BigDecimal HALF_UP — the references
  * use the same; BM25's per-doc score folds contributions sorted by term
  * (ASCII fixture tokens, so UTF8String byte order == String order);
  * shingles split on ASCII whitespace with the <n-token whole-text
  * fallback.
  */
class FuzzSpec extends SparkSpec {
  import spark.implicits._

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def docs() = Tables.table(spark, sf, "documents")

  // --- shared Scala-side text machinery (independent re-implementation) ---

  private def tokensOf(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  private def shinglesOf(text: String, n: Int): Set[String] = {
    val t = tokensOf(text)
    if (t.isEmpty) Set.empty
    else if (t.length < n) Set(t.mkString(" "))
    else t.sliding(n).map(_.mkString(" ")).toSet
  }

  // --- 1. n-gram Jaccard: 3 Spark formulations + Scala brute force ------

  for ((n, t) <- Seq((2, 0.3), (4, 0.5), (3, 0.85))) {
    test(s"fuzz jaccard n=$n t=$t: quadratic ≡ indexed ≡ prefix ≡ Scala brute force") {
      val d = docs().select("doc_id", "text")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, Double)].collect().toSeq.sorted
      val quad = canon(Dedup.ngramJaccardPairs(d, "doc_id", "text", n, t))
      val idx = canon(Dedup.ngramJaccardPairsIndexed(d, "doc_id", "text", n, t))
      val pfx = canon(Dedup.ngramJaccardPairsPrefix(d, "doc_id", "text", n, t))
      assert(quad === idx, "indexed formulation diverged from quadratic")
      assert(quad === pfx, "prefix formulation diverged from quadratic")
      val rows = d.as[(Long, String)].collect()
      val ref = (for {
        (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
        sa = shinglesOf(ta, n); sb = shinglesOf(tb, n)
        if sa.nonEmpty && sb.nonEmpty
        inter = (sa & sb).size.toDouble
        j = round6(inter / (sa.size + sb.size - inter))
        if j >= t
      } yield (ia, ib, j)).toSeq.sorted
      assert(quad === ref, "Spark jaccard diverged from the Scala reference")
    }
  }

  // --- 2. BM25 at non-default (k1, b, maxDf) vs Scala reference ---------

  for ((k1, b, maxDf) <- Seq((0.9, 0.4, None), (1.8, 0.9, Some(20.0)))) {
    test(s"fuzz bm25 k1=$k1 b=$b maxDf=$maxDf vs Scala reference") {
      val d = docs().select("doc_id", "text")
      val queries = d.filter($"doc_id" % 13 === 0)
        .select($"doc_id".as("query_id"), $"text".as("qtext"))
      val got = Retrieval.bm25TopK(d, queries, k = 5, k1 = k1, b = b, maxDf = maxDf)
        .as[(Long, Long, Double, Int)].collect().toSeq.sorted
      // reference: same formula, independent machinery. N/avgdl count only
      // docs that produced tokens (the index derives both from docLens,
      // and token-less docs never reach the postings aggregate).
      val rows = d.as[(Long, String)].collect()
        .filter { case (_, t) => tokensOf(t).nonEmpty }
      val toks = rows.map { case (id, t) => id -> tokensOf(t) }.toMap
      val dl = toks.map { case (id, ts) => id -> ts.length.toDouble }
      val nDocs = rows.length.toDouble
      val avgdl = dl.values.sum / nDocs
      val dfm = toks.values.flatMap(_.distinct).groupBy(identity)
        .map { case (term, o) => term -> o.size.toDouble }
      val qrows = queries.as[(Long, String)].collect()
      val ref = qrows.flatMap { case (qid, qt) =>
        val qterms = tokensOf(qt).distinct
          .filter(dfm.contains) // join on dfreq drops unindexed terms
          .filter(term => maxDf.forall(dfm(term) <= _))
        val scores = toks.keys.flatMap { did =>
          val tf = toks(did).groupBy(identity).map { case (w, o) => w -> o.length.toDouble }
          val contribs = qterms.filter(tf.contains).map { term =>
            val idf = math.log(1.0 + (nDocs - dfm(term) + 0.5) / (dfm(term) + 0.5))
            term -> idf * tf(term) * (k1 + 1) /
              (tf(term) + k1 * ((1.0 - b) + b * dl(did) / avgdl))
          }
          if (contribs.isEmpty) None
          else Some(did -> round6(contribs.sortBy(_._1).map(_._2).sum))
        }.toSeq
        scores.sortBy { case (did, s) => (-s, did) }.take(5).zipWithIndex
          .map { case ((did, s), i) => (qid, did, s, i + 1) }
      }.toSeq.sorted
      assert(got === ref, s"bm25($k1,$b,$maxDf) diverged from the Scala reference")
    }
  }

  // --- 3. PQ exactness invariant: full-corpus rerank IS brute force -----

  for ((m, ksub) <- Seq((2, 4), (4, 16), (8, 16))) {
    test(s"fuzz pq m=$m ksub=$ksub: rerank ≥ |corpus| recovers brute-force top-k") {
      val e = Tables.table(spark, sf, "embeddings")
      val q = e.filter($"vec_id" < 8)
      val nCorpus = e.count().toInt
      val brute = Similarity.bruteForceTopK(e, q, k = 5)
        .select($"query_id", $"corpus_id", $"rnk").as[(Long, Long, Int)]
        .collect().toSeq.sorted
      val pq = Similarity.pqTopK(e, q, k = 5, m = m, ksub = ksub,
          lloydIters = 1, rerank = nCorpus, oracleMode = true)
        .select($"query_id", $"corpus_id", $"rnk").as[(Long, Long, Int)]
        .collect().toSeq.sorted
      assert(pq === brute,
        s"PQ($m,$ksub) with full rerank must equal exact ranking regardless of codebook")
    }
  }

  // --- 4. chunkTokens at non-default (window, stride) vs Scala ----------

  for ((w, s) <- Seq((4, 3), (7, 7), (5, 1))) {
    test(s"fuzz chunk w=$w s=$s vs Scala sliding-window reference") {
      val d = docs().select("doc_id", "text")
      val got = Pack.chunkTokens(d, "doc_id", "text", window = w, stride = s)
        .as[(Long, Long, Long, String)].collect().toSeq.sorted
      val ref = d.as[(Long, String)].collect().flatMap { case (id, t) =>
        val ts = tokensOf(t)
        (0 until ts.length by s).map { start =>
          val chunk = ts.slice(start, math.min(start + w, ts.length))
          (id, (start / s).toLong, chunk.length.toLong, chunk.mkString(" "))
        }
      }.toSeq.sorted
      assert(got === ref, s"chunkTokens($w,$s) diverged from the Scala reference")
    }
  }

  // --- 5. DSIR top-fraction cut at non-default fractions ----------------

  for (frac <- Seq(0.1, 0.5)) {
    test(s"fuzz dsir frac=$frac: selected set is the exact top-weight subset") {
      val d = docs()
      val weights = Dsir.importanceWeights(d, $"lang" === "en", "doc_id", "text")
      val got = Dsir.selectTopFraction(weights, frac, "doc_id")
        .select($"doc_id", $"selected").as[(Long, Boolean)].collect().toMap
      val collected = weights.as[(Long, Double)].collect()
      val keep = math.ceil(frac * collected.length).toLong
      val sel = collected.sortBy { case (id, w) => (-w, id) }.take(keep.toInt)
        .map(_._1).toSet
      assert(got.count(_._2) === sel.size)
      got.foreach { case (id, s) => assert(s === sel.contains(id),
        s"doc $id selection flag diverged at frac=$frac") }
    }
  }

  // --- 6. sourceQuota: pre-bucketed path ≡ plain path; exact caps -------

  for ((quota, preBuckets) <- Seq((3, 4), (17, 2))) {
    test(s"fuzz quota=$quota preBuckets=$preBuckets: bucketed ≡ plain, caps exact") {
      val d = docs()
      val rank = length($"text").cast("long")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select($"doc_id").as[Long].collect().toSeq.sorted
      val plain = canon(Mixture.sourceQuota(d, "lang", "doc_id", quota, rank))
      val bucketed = canon(Mixture.sourceQuota(d, "lang", "doc_id", quota, rank,
        preBuckets = preBuckets))
      assert(plain === bucketed, "pre-bucketed pruning changed the selected set")
      val sizes = d.groupBy($"lang").count().as[(String, Long)].collect().toMap
      val kept = Mixture.sourceQuota(d, "lang", "doc_id", quota, rank)
        .groupBy($"lang").count().as[(String, Long)].collect().toMap
      sizes.foreach { case (lang, nSrc) =>
        assert(kept.getOrElse(lang, 0L) === math.min(quota.toLong, nSrc),
          s"source $lang kept ${kept.getOrElse(lang, 0L)} of $nSrc at quota $quota") }
    }
  }

  // --- 7. PageRank / personalized: non-default (damping, iters) vs a ----
  // driver-side Scala power iteration (the catalog oracle unrolls exactly
  // 3 iterations at d=0.85 in SQL; this is the independent reference at
  // other parameter points, production-mode folds, tolerance one ulp of
  // the 6-decimal rounding)

  private def refPageRank[N](edges: Seq[(N, N)], d: Double, iters: Int,
                             seeds: Option[Set[N]]): Map[N, Double] = {
    val dist = edges.distinct
    val nodes = (dist.map(_._1) ++ dist.map(_._2)).distinct
    val odeg = dist.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    val n = nodes.size
    val t: Map[N, Double] = seeds match {
      case Some(s) =>
        val present = s.intersect(nodes.toSet); val ns = present.size
        nodes.map(x => x -> (if (present(x)) 1.0 / ns else 0.0)).toMap
      case None => nodes.map(x => x -> 1.0 / n).toMap
    }
    var rank = t
    for (_ <- 1 to iters) {
      val inflow = dist.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => rank(s) / odeg(s) }.sum
      }
      val dmass = nodes.filterNot(odeg.contains).map(rank).sum
      rank = seeds match {
        case Some(_) => nodes.map(x => x ->
          ((1 - d) * t(x) + d * (inflow.getOrElse(x, 0.0) + dmass * t(x)))).toMap
        case None => nodes.map(x => x ->
          ((1 - d) / n + d * (inflow.getOrElse(x, 0.0) + dmass / n))).toMap
      }
    }
    rank
  }

  private def tradeEdges(): Seq[(Long, Long)] =
    graft.queries.Extras.buildTradeEdges(spark, sf)
      .as[(Long, Long)].collect().toSeq

  for ((d, iters) <- Seq((0.7, 5), (0.9, 2))) {
    test(s"fuzz pagerank d=$d iters=$iters: Spark ≡ Scala power iteration") {
      val edges = tradeEdges()
      val got = graft.operators.PageRank.pageRank(
          edges.toDF("src", "dst"), "src", "dst", iters = iters, damping = d)
        .as[(Long, Double)].collect().toMap
      val ref = refPageRank(edges, d, iters, None)
      assert(got.keySet === ref.keySet, "node set diverged")
      ref.foreach { case (node, r) =>
        assert(math.abs(got(node) - r) <= 1e-6,
          s"rank diverged at $node: spark=${got(node)} ref=$r (d=$d iters=$iters)") }
    }
  }

  // --- 8. connected components: seeded random pair graphs vs a Scala ---
  // union-find (the catalog exercises CC only on near-dup pair shapes;
  // this is the independent reference on arbitrary sparse graphs,
  // including chains longer than any near-dup cluster produces)

  for (seed <- Seq(7, 42)) {
    test(s"fuzz connected components seed=$seed: Spark min-label ≡ Scala union-find") {
      val rnd = new scala.util.Random(seed)
      val n = 150
      val edges = Seq.fill(300)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val ra = find(a.toInt); val rb = find(b.toInt)
        if (ra != rb) parent(ra) = rb
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.groupBy(x => find(x.toInt)).values
        .flatMap { ns => val m = ns.min; ns.map(_ -> m) }.toMap
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"), maxIter = 60)
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"component labeling diverged from union-find (seed=$seed)")
    }
  }

  test("fuzz personalized pagerank d=0.6 iters=4: Spark ≡ Scala power iteration") {
    val edges = tradeEdges()
    // supplier nodes are the sign-tagged negatives (node = -(suppkey+1))
    val seedSet = edges.map(_._1).filter(_ < 0).distinct.sorted.take(5).toSet
    val got = graft.operators.PageRank.personalizedPageRank(
        edges.toDF("src", "dst"), seedSet.toSeq.toDF("node"),
        "src", "dst", "node", iters = 4, damping = 0.6)
      .as[(Long, Double)].collect().toMap
    val ref = refPageRank(edges, 0.6, 4, Some(seedSet))
    assert(got.keySet === ref.keySet, "node set diverged")
    ref.foreach { case (node, r) =>
      assert(math.abs(got(node) - r) <= 1e-6,
        s"rank diverged at $node: spark=${got(node)} ref=$r") }
  }
}
