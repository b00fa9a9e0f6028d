package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: orthogonal=0, identical=1, opposite=-1") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f)),
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f))).toDF("a", "b")
    val got = df.select(round(Similarity.cosine($"a", $"b"), 9).as("c")).as[Double].collect().toSeq
    assert(got === Seq(0.0, 1.0, -1.0))
  }

  test("bruteForceTopK: k neighbors per query, ranked by similarity desc") {
    val e = Tables.table(spark, sf, "embeddings")
    val got = Similarity.bruteForceTopK(e, e.filter($"vec_id" < 5), k = 3)
    val byQuery = got.groupBy("query_id").agg(count(lit(1)).as("n"), max("rnk").as("maxr"))
      .as[(Long, Long, Int)].collect()
    assert(byQuery.length === 5 && byQuery.forall(r => r._2 === 3 && r._3 === 3))
    // rank 1 has the highest sim within each query group
    val sims = got.filter($"query_id" === 0).orderBy($"rnk").select("sim").as[Double].collect()
    assert(sims.sorted.reverse.toSeq === sims.toSeq)
  }

  test("encoder seam: ANN through encodeText(HashTextEncoder) ≡ the direct column path") {
    // the seam contract: a pipeline that swaps the direct hashEmbedding
    // column for the batched mapPartitions encoder must reproduce the
    // SAME vectors — and therefore the same ANN results — bit-for-bit
    val docs = Tables.table(spark, sf, "documents").select("doc_id", "text")
    val direct = docs.select(col("doc_id"),
      Similarity.hashEmbedding(col("text"), 16).as("embedding"))
    // batchSize 7 deliberately misaligns with partition sizes so the
    // grouped-iterator batching itself is exercised (ragged final batch)
    val seam = Similarity.encodeText(docs, "doc_id", "text",
      Similarity.HashTextEncoder(16), batchSize = 7)
    assert(seam.schema("embedding").dataType ===
      direct.schema("embedding").dataType)
    assert(seam.exceptAll(direct).isEmpty && direct.exceptAll(seam).isEmpty)
    // and an ANN entry served from each embedding frame agrees exactly
    def ann(e: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(e, e.filter($"doc_id" < 5), k = 3,
          idCol = "doc_id")
        .select("query_id", "corpus_id", "rnk")
        .as[(Long, Long, Int)].collect().toSet
    assert(ann(direct) === ann(seam))
    // codec rule: a null text yields a null vector, never a crash
    val withNull = Seq((1L, "some text"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val enc = Similarity.encodeText(withNull, "doc_id", "text",
      Similarity.HashTextEncoder(16))
    assert(enc.filter($"doc_id" === 2 && $"embedding".isNull).count() === 1)
    assert(enc.filter($"embedding".isNotNull).count() === 1)
  }

  test("encodeTextRows: schema-preserving seam ≡ direct column path (struct keys survive)") {
    // the qr03 shape: the RAG chunk store keys by a STRUCT, so the seam
    // must append the vector while carrying arbitrary columns through
    val docs = Tables.table(spark, sf, "documents")
      .select(struct($"doc_id", ($"doc_id" % 3).as("chunk_id")).as("ck"),
        $"text", $"lang")
    val direct = docs.withColumn("embedding",
      Similarity.hashEmbedding($"text", 16))
    val seam = Similarity.encodeTextRows(docs, "text",
      Similarity.HashTextEncoder(16), batchSize = 7)
    assert(seam.columns.toSeq === direct.columns.toSeq)
    assert(seam.exceptAll(direct).isEmpty && direct.exceptAll(seam).isEmpty)
    // codec rule through the row seam: null text → null vector, the other
    // columns intact
    val withNull = Seq((1L, "some text"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val enc = Similarity.encodeTextRows(withNull, "text",
      Similarity.HashTextEncoder(16))
    assert(enc.filter($"id" === 2 && $"embedding".isNull).count() === 1)
    assert(enc.filter($"embedding".isNotNull).count() === 1)
    // contract guards fail loudly instead of corrupting silently: an
    // existing outCol would duplicate the schema field...
    intercept[IllegalArgumentException] {
      Similarity.encodeTextRows(direct, "text", Similarity.HashTextEncoder(16))
    }
    // ...and a length-violating encoder would zip-truncate (drop rows)
    val shortEncoder = new Similarity.TextEncoder {
      def dim = 4
      def encodeBatch(texts: Array[String]): Array[Array[Float]] =
        texts.take(1).map(_ => Array(0f, 0f, 0f, 0f))
    }
    val err = intercept[org.apache.spark.SparkException] {
      Similarity.encodeTextRows(docs, "text", shortEncoder, batchSize = 7).count()
    }
    assert(err.getMessage.contains("index-aligned") ||
      Option(err.getCause).exists(_.getMessage.contains("index-aligned")))
    val err2 = intercept[org.apache.spark.SparkException] {
      Similarity.encodeText(docs.select($"ck.doc_id".as("doc_id"), $"text"),
        "doc_id", "text", shortEncoder, batchSize = 7).count()
    }
    assert(err2.getMessage.contains("index-aligned") ||
      Option(err2.getCause).exists(_.getMessage.contains("index-aligned")))
  }

  test("ivfTopK probes a fraction of cells with useful recall@5") {
    val e = Tables.table(spark, sf, "embeddings")
    val q = e.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(e, q, k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(e, q, k = 5, nlist = 8, nProbe = 4)
    val got = approx.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    // probing half the cells (4/8) on near-random vectors: expect roughly
    // ≥ the probe fraction; far above the 1% noise floor
    assert(recall > 0.3, s"recall@5 = $recall")
    assert(approx.groupBy("query_id").count().count() === 20)
  }

  test("ivfTopK oracleMode: order-deterministic means ≈ production avg means") {
    // oracleMode exists for the DuckDB oracle (bit-reproducible fp order),
    // not as a different algorithm: both modes average the same cell
    // members, differing only in summation order (error ~1 ulp per dim).
    // Pin that the two modes return essentially the same neighbor sets on
    // the fixture — a large divergence would mean oracleMode is verifying
    // something other than the production path.
    val e = Tables.table(spark, sf, "embeddings")
    val q = e.filter($"vec_id" < 20)
    def pairs(oracle: Boolean) =
      Similarity.ivfTopK(e, q, k = 5, nlist = 16, nProbe = 4, lloydIters = 1,
          oracleMode = oracle)
        .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val prod = pairs(oracle = false)
    val orc = pairs(oracle = true)
    val overlap = (prod intersect orc).size.toDouble / math.max(prod.size, orc.size)
    assert(overlap > 0.95, s"oracleMode diverged from production: overlap = $overlap")
  }

  test("ivfTopK sampled training (trainFraction) keeps useful recall@5") {
    // the 100 TB training path: k-means on a 25% deterministic hash-slice;
    // cells only need the density shape, so recall should stay in the same
    // band as full-corpus training (qt10r records the exact values)
    val e = Tables.table(spark, sf, "embeddings")
    val q = e.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(e, q, k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(e, q, k = 5, nlist = 16, nProbe = 4,
        lloydIters = 1, trainFraction = 0.25)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.2, s"recall@5 with sampled training = $recall")
  }

  test("lshTopK achieves reasonable recall@5 vs brute force on real embeddings") {
    // Fixture embeddings are near-random (top-5 sim ≈ 0.32 → per-bit
    // collision prob ≈ 0.6), so parameters must be generous: 4 planes ×
    // 8 tables → expected pair recall ≈ 1-(1-0.6⁴)⁸ ≈ 0.67. On clustered
    // real-world embeddings the same budget yields much higher recall.
    val e = Tables.table(spark, sf, "embeddings")
    val q = e.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(e, q, k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(e, q, k = 5, planes = 4, tables = 8)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.35, s"recall@5 = $recall") // ≫ noise floor (5/500 = 1%)
  }

  test("lshTopK multi-probe: candidate superset of single-probe → recall never drops") {
    val e = Tables.table(spark, sf, "embeddings")
    val q = e.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(e, q, k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    def recallOf(probes: Int): Double = {
      val approx = Similarity.lshTopK(e, q, k = 5, planes = 6, tables = 4, probes = probes)
        .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val r1 = recallOf(1)
    val r4 = recallOf(4)
    // probing 3 extra lowest-margin buckets can only ADD candidates; the
    // exact rerank keeps the best k, so recall is monotone in probes
    assert(r4 >= r1, s"multi-probe recall $r4 < single-probe $r1")
    // and on the near-random fixture the boost should be material, not noise
    assert(r4 > r1 + 0.05, s"expected a material multi-probe boost: $r1 -> $r4")
  }

  test("lshTopKInt8: exhaustive rerank ≡ float path; shortlist recall monotone in rerank") {
    val e = Tables.table(spark, sf, "embeddings")
    val q = e.filter($"vec_id" < 20)
    // with a shortlist larger than any bucket's candidate set, the exact
    // float rerank sees every candidate — the quantized shortlisting can
    // exclude nothing, so the result must be IDENTICAL to the float path
    val float = Similarity.lshTopK(e, q, k = 5, planes = 6, tables = 4, probes = 4)
      .select("query_id", "corpus_id", "sim", "rnk").as[(Long, Long, Double, Int)]
      .collect().toSet
    val int8Full = Similarity.lshTopKInt8(e, q, k = 5, planes = 6, tables = 4, probes = 4,
        rerank = 1000000)
      .select("query_id", "corpus_id", "sim", "rnk").as[(Long, Long, Double, Int)]
      .collect().toSet
    assert(int8Full === float, "exhaustive-rerank int8 path diverged from the float path")
    // a tight shortlist can only lose neighbors relative to a wide one
    def hits(rerank: Int): Int =
      Similarity.lshTopKInt8(e, q, k = 5, planes = 6, tables = 4, probes = 4, rerank = rerank)
        .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
        .intersect(float.map(t => (t._1, t._2))).size
    assert(hits(25) >= hits(5), "recall not monotone in the rerank budget")
  }

  test("ivfTopKInt8: exhaustive rerank ≡ float ivfTopK (same centroids, same probes)") {
    val e = Tables.table(spark, sf, "embeddings")
    val q = e.filter($"vec_id" < 20)
    val float = Similarity.ivfTopK(e, q, k = 5, nlist = 16, nProbe = 4, lloydIters = 1,
        oracleMode = true)
      .select("query_id", "corpus_id", "sim", "rnk").as[(Long, Long, Double, Int)]
      .collect().toSet
    val int8Full = Similarity.ivfTopKInt8(e, q, k = 5, nlist = 16, nProbe = 4,
        lloydIters = 1, rerank = 1000000, oracleMode = true)
      .select("query_id", "corpus_id", "sim", "rnk").as[(Long, Long, Double, Int)]
      .collect().toSet
    assert(int8Full === float, "exhaustive-rerank int8 IVF diverged from the float path")
  }

  test("pqEncode: m codes per vector, each within its codebook; encode is deterministic") {
    val e = Tables.table(spark, sf, "embeddings")
    val c = e.filter($"embedding".isNotNull)
      .select($"vec_id".as("corpus_id"), $"embedding".as("cv"))
    val cb = Similarity.trainPq(c, m = 4, ksub = 16, lloydIters = 1,
      trainFraction = 1.0, oracleMode = true)
    assert(cb.length === 4 && cb.forall(_.length === 16))
    val dsub = cb(0)(0).length
    assert(cb.forall(_.forall(_.length === dsub)))
    val codes = Similarity.pqEncode(e, cb).select($"vec_id", $"codes")
      .as[(Long, Seq[Int])].collect()
    assert(codes.length.toLong === e.filter($"embedding".isNotNull).count())
    assert(codes.forall { case (_, cs) => cs.length == 4 && cs.forall(x => x >= 0 && x < 16) })
    val again = Similarity.pqEncode(e, cb).select($"vec_id", $"codes")
      .as[(Long, Seq[Int])].collect()
    assert(codes.toSet === again.toSet)
  }

  test("pqTopK: exhaustive rerank ≡ bruteForceTopK; rerank recall ≥ pure ADC") {
    val e = Tables.table(spark, sf, "embeddings")
    val q = e.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(e, q, k = 5)
      .select("query_id", "corpus_id", "sim", "rnk").as[(Long, Long, Double, Int)]
      .collect().toSet
    // PQ generates no candidates — it's a full scan over codes — so a
    // shortlist wider than the corpus makes the exact rerank see every
    // pair: the result must be IDENTICAL to brute force
    val full = Similarity.pqTopK(e, q, k = 5, m = 4, ksub = 16, lloydIters = 1,
        rerank = 1000000, oracleMode = true)
      .select("query_id", "corpus_id", "sim", "rnk").as[(Long, Long, Double, Int)]
      .collect().toSet
    assert(full === exact, "exhaustive-rerank PQ diverged from brute force")
    val exactIds = exact.map(t => (t._1, t._2))
    def hits(df: org.apache.spark.sql.DataFrame): Int =
      df.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
        .intersect(exactIds).size
    val adcOnly = hits(Similarity.pqTopK(e, q, k = 5, m = 4, ksub = 16,
      lloydIters = 1, rerank = 0, oracleMode = true))
    val reranked = hits(Similarity.pqTopK(e, q, k = 5, m = 4, ksub = 16,
      lloydIters = 1, rerank = 25, oracleMode = true))
    assert(reranked >= adcOnly, "exact rerank of a wider shortlist lost recall vs pure ADC")
    assert(adcOnly > 0, "pure-ADC ranking found nothing — scoring is broken")
  }

  test("PQ index round-trip: persisted codes+codebooks serve a bit-identical ranking") {
    val e = Tables.table(spark, sf, "embeddings")
    val q = e.filter($"vec_id" < 20)
    val built = Similarity.pqIndex(e, m = 4, ksub = 16, lloydIters = 1,
      oracleMode = true)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_idx").toString
    Similarity.savePqIndex(built, dir)
    val loaded = Similarity.loadPqIndex(spark, dir)
    // codebooks round-trip float-exact, codes row-for-row
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      built.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    assert(loaded.codes.count() === built.codes.count())
    // both the pure-ADC branch and the reranked branch serve the same
    // ranking from the reloaded artifact as from the in-session index
    for (rerank <- Seq(0, 25)) {
      val mem = Similarity.pqTopKIndexed(built, e, q, k = 5, rerank = rerank)
        .select("query_id", "corpus_id", "sim", "rnk")
        .as[(Long, Long, Double, Int)].collect().toSet
      val disk = Similarity.pqTopKIndexed(loaded, e, q, k = 5, rerank = rerank)
        .select("query_id", "corpus_id", "sim", "rnk")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(disk === mem, s"persisted PQ index diverged at rerank=$rerank")
    }
  }

  test("IVF centroid round-trip: persisted centroids serve a bit-identical ranking") {
    val e = Tables.table(spark, sf, "embeddings")
    val q = e.filter($"vec_id" < 20)
    val c = e.select($"vec_id".as("corpus_id"), $"embedding".as("cv"))
    val cents = Similarity.trainCentroids(c, nlist = 16, lloydIters = 1,
      trainFraction = 1.0, oracleMode = true)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_cent").toString
    Similarity.saveCentroids(cents, dir, spark)
    val loaded = Similarity.loadCentroids(spark, dir)
    assert(loaded.map(_.toSeq).toSeq === cents.map(_.toSeq).toSeq)
    val mem = Similarity.ivfTopKCentroids(cents, e, q, k = 5, nProbe = 4)
      .select("query_id", "corpus_id", "sim", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    val disk = Similarity.ivfTopKCentroids(loaded, e, q, k = 5, nProbe = 4)
      .select("query_id", "corpus_id", "sim", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(disk === mem, "persisted IVF centroids diverged from in-session")
  }

  test("trainPq / pqIndex: empty or all-null corpus fails fast with a clear message") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val err = intercept[IllegalArgumentException] {
      Similarity.pqIndex(empty, m = 2, ksub = 2, lloydIters = 0)
    }
    assert(err.getMessage.contains("PQ training corpus is empty"))
    val allNull = Seq((1L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding")
    val err2 = intercept[IllegalArgumentException] {
      Similarity.pqIndex(allNull, m = 2, ksub = 2, lloydIters = 0)
    }
    assert(err2.getMessage.contains("PQ training corpus is empty"))
  }

  test("pqTopKIndexed: null-embedding corpus rows never rank (pure-ADC branch)") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, null.asInstanceOf[Seq[Float]]),
      (4L, Seq(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = Seq((10L, Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val idx = Similarity.pqIndex(corpus, m = 2, ksub = 2, lloydIters = 1)
    val got = Similarity.pqTopKIndexed(idx, corpus, q, k = 4, rerank = 0)
      .select("corpus_id").as[Long].collect().toSet
    assert(!got.contains(3L), "null-embedding row ranked in the pure-ADC branch")
    assert(got === Set(1L, 2L, 4L))
  }

  test("quantizeInt8: |q| ≤ 127, known values, zero vector, dequant error ≤ scale/2") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f)),
      (3L, Seq(3.0f))).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df).orderBy("vec_id")
      .as[(Long, Double, Seq[Int])].collect()
    // max|x|=1 → scale 1/127; q = round-half-up(x·127): (64, -127, 32)
    assert(got(0)._3 === Seq(64, -127, 32) && math.abs(got(0)._2 - 1.0 / 127) < 1e-15)
    assert(got(1)._3 === Seq(0, 0) && got(1)._2 === 0.0) // zero vector
    assert(got(2)._3 === Seq(127)) // the max element always hits ±127
    // empty vector → empty quantized array + scale 0 (the zero-vector
    // contract), not silent nulls; null vector stays null end to end
    val edge = Seq((4L, Some(Seq.empty[Float])), (5L, Option.empty[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val edgeGot = Similarity.quantizeInt8(edge).orderBy("vec_id")
      .as[(Long, Option[Double], Option[Seq[Int]])].collect()
    assert(edgeGot(0)._2 === Some(0.0) && edgeGot(0)._3 === Some(Seq.empty[Int]))
    assert(edgeGot(1)._2.isEmpty && edgeGot(1)._3.isEmpty)
    // reconstruction bound on real fixture vectors: |x − q·s| ≤ s/2 + eps
    val e = Tables.table(spark, sf, "embeddings")
    val bad = Similarity.quantizeInt8(e)
      .join(e, "vec_id")
      .select(exists(zip_with($"embedding", $"quantized",
        (x, q) => abs(x.cast("double") - q.cast("double") * $"scale") > $"scale" * 0.5 + lit(1e-12)),
        c => c).as("violated"))
      .filter($"violated").count()
    assert(bad === 0, "a quantized value reconstructs outside the half-step bound")
    // every quantized magnitude fits int8
    val over = Similarity.quantizeInt8(e)
      .select(exists($"quantized", q => abs(q) > 127).as("over"))
      .filter($"over").count()
    assert(over === 0)
  }

  test("filtered ANN: pre-filtering the code store keeps the k guarantee; post-filter loses it") {
    val e = Tables.table(spark, sf, "embeddings")
    val q = e.filter($"vec_id" < 10)
    val idx = Similarity.ivfPqIndex(e, nlist = 16, m = 4, ksub = 16,
      lloydIters = 1, oracleMode = true)
    // the pattern: the metadata predicate applies to the code STORE before
    // ranking — the index serves the filtered subset with full k results
    val l3 = e.filter($"label" === 3).select($"vec_id".as("corpus_id"))
    val filteredIdx = Similarity.IvfPqIndex(idx.centroids,
      idx.pq.copy(codes = idx.pq.codes.join(l3, "corpus_id")))
    val served = Similarity.ivfPqTopKIndexed(filteredIdx, e, q, k = 5,
        nProbe = 16, rerank = 25)
      .as[(Long, Long, Double, Int)].collect()
    // exactly k results per query, all from the filtered subset
    assert(served.groupBy(_._1).forall(_._2.length == 5))
    val allowed = l3.as[Long].collect().toSet
    assert(served.forall(r => allowed.contains(r._2)))
    // post-filtering an unfiltered top-5 cannot guarantee k: some query
    // keeps fewer than 5 label-3 rows (label 3 is ~10% of the corpus)
    val post = Similarity.ivfPqTopKIndexed(idx, e, q, k = 5, nProbe = 16, rerank = 25)
      .as[(Long, Long, Double, Int)].collect()
      .filter(r => allowed.contains(r._2))
    assert(post.groupBy(_._1).values.forall(_.length <= 5) &&
      post.groupBy(_._1).values.exists(_.length < 5))
  }

  test("ivfPqTopK: full probe ≡ exhaustive-ADC pqTopK; index round-trips bit-identical") {
    val e = Tables.table(spark, sf, "embeddings")
    val q = e.filter($"vec_id" < 20)
    // probing EVERY cell makes the cell pruning a no-op: the composed path
    // must equal the exhaustive ADC scan exactly, in both ranking branches
    for (rerank <- Seq(0, 25)) {
      val composed = Similarity.ivfPqTopK(e, q, k = 5, nlist = 16, nProbe = 16,
          m = 4, ksub = 16, lloydIters = 1, rerank = rerank, oracleMode = true)
        .as[(Long, Long, Double, Int)].collect().toSet
      val exhaustive = Similarity.pqTopK(e, q, k = 5, m = 4, ksub = 16,
          lloydIters = 1, rerank = rerank, oracleMode = true)
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(composed === exhaustive, s"full-probe IVFPQ != exhaustive ADC at rerank=$rerank")
    }
    // persisted round-trip: centroids + codebooks + cell-tagged codes
    val idx = Similarity.ivfPqIndex(e, nlist = 16, m = 4, ksub = 16,
      lloydIters = 1, oracleMode = true)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    Similarity.saveIvfPqIndex(idx, dir)
    val loaded = Similarity.loadIvfPqIndex(spark, dir)
    val mem = Similarity.ivfPqTopKIndexed(idx, e, q, k = 5, nProbe = 4, rerank = 25)
      .as[(Long, Long, Double, Int)].collect().toSet
    val disk = Similarity.ivfPqTopKIndexed(loaded, e, q, k = 5, nProbe = 4, rerank = 25)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(disk === mem, "persisted IVFPQ index diverged from in-session")
    // pruned serve returns k rows per query like the exhaustive path
    assert(mem.groupBy(_._1).forall(_._2.size == 5))
  }

  test("contrastivePairs: positives share the label, negatives are the hardest wrong-label hits") {
    // label 0 clusters near +x, label 1 near +y; vec 3 (label 1) sits close
    // to +x — the designed hard negative for the label-0 query.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), 0),
      (1L, Seq(0.9f, 0.1f, 0.0f), 0),
      (2L, Seq(0.0f, 1.0f, 0.0f), 1),
      (3L, Seq(0.8f, 0.6f, 0.0f), 1),
      (4L, Seq(0.0f, 0.9f, 0.1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.contrastivePairs(emb, emb.filter($"vec_id" === 0L),
        kPos = 1, kNeg = 2)
      .as[(Long, Long, String, Double, Int)].collect()
    val pos = got.filter(_._3 == "pos").map(_._2).toSet
    val neg = got.filter(_._3 == "neg")
    assert(pos === Set(1L), "positive must be the same-label nearest")
    assert(neg.map(_._2).toSet === Set(3L, 2L))
    assert(neg.minBy(_._5)._2 === 3L, "hardest negative (rank 1) must be vec 3")
    // roles partition the labels correctly
    assert(got.forall(r => (r._3 == "pos") == Set(0L, 1L).contains(r._2)))
  }
}
