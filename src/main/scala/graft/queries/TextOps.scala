package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFns
import graft.operators.{Dedup, Similarity}

/** Training-data-pipeline query catalog over `documents` / `embeddings`:
  * text statistics, language ID, quality scoring, fingerprinting, exact +
  * near dedup, vector similarity. SQL-expressible ops carry a DuckDB oracle;
  * hash-family ops (MinHash/SimHash/LSH use xxhash64, which DuckDB lacks)
  * are declared without an oracle → driver's rows-only check, with ScalaTest
  * cross-checks against the exact variants instead.
  */
object TextOps {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Shared stopword list literal for the SQL oracles. */
  private val langProfilesSql: Map[String, String] =
    TextFns.LangId.profiles.toMap.map { case (k, ws) =>
      k -> ws.map(w => s"'$w'").mkString("(", ",", ")")
    }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting + basic text stats (all codegen'd column ops).
    "qt01_token_stats" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val toks = TextFns.tokens(col("text"))
      docs.select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("long").as("n_chars_nospace"),
        round(length(regexp_replace(col("text"), "\\s+", "")).cast("double") /
          size(toks).cast("double"), 6).as("mean_word_len"))
    }),

    // Language-ID heuristic: stopword-profile scoring, deterministic argmax.
    "qt02_langid" -> ((s, d) => {
      T(s, d, "documents").select(
        col("doc_id"),
        TextFns.LangId.langId(col("text")).as("lang_guess"))
    }),

    // Composite quality score (length/word-length/punctuation/stopword
    // components, equal-weighted).
    "qt11_quality" -> ((s, d) => {
      T(s, d, "documents").select(
        col("doc_id"), TextFns.qualityScore(col("text")).as("quality"))
    }),

    // Document fingerprint: md5 of whitespace-normalized lowercase text.
    "qt03_fingerprint" -> ((s, d) => {
      T(s, d, "documents").select(
        col("doc_id"), TextFns.fingerprint(col("text")).as("fp"))
    }),

    // Exact dedup via fingerprint grouping (the 100 TB path: shuffle carries
    // 16-byte hashes, not document text).
    "qt04_dedup_exact" -> ((s, d) =>
      Dedup.exactByFingerprint(T(s, d, "documents"), "text", "doc_id")),

    // Exact word-3-gram Jaccard ≥ 0.15 within a language block, via the
    // inverted-index join (identical results to all-pairs, sub-quadratic;
    // Dedup.ngramJaccardPairs remains the quadratic verification baseline,
    // cross-checked in DedupSpec).
    "qt05_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairsIndexed(T(s, d, "documents"), "doc_id", "text",
        n = 3, threshold = 0.15, blockCols = Seq("lang"))),

    // MinHash + LSH banding near-dup candidates (no oracle: xxhash64 family).
    "qt06_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLshPairs(T(s, d, "documents"), "doc_id", "text",
        shingleN = 3, bands = 8, rowsPerBand = 2, threshold = 0.15)),

    // SimHash hamming-distance near-dups (no oracle: xxhash64 family).
    "qt07_simhash" -> ((s, d) =>
      Dedup.simhashPairs(T(s, d, "documents"), "doc_id", "text", maxDist = 3)),

    // Brute-force cosine top-5 neighbors for the first 20 vectors.
    "qt08_cosine_topk" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 20), k = 5)
        .withColumn("rnk", col("rnk").cast("long"))
    }),

    // LSH-bucketed approximate top-5 (no oracle: xxhash64-derived planes;
    // recall vs brute force is asserted in ScalaTest). 6 planes × 4 tables
    // ≈ 6% of the corpus scanned per query.
    "qt09_lsh_topk" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      Similarity.lshTopK(e, e.filter(col("vec_id") < 20), k = 5, planes = 6, tables = 4)
        .withColumn("rnk", col("rnk").cast("long"))
    }),

    // IVF ANN scale path (no oracle: k-means cells; recall asserted in
    // SimilaritySpec): probe 4 of 16 cells per query, exact rerank inside.
    "qt10_ivf_topk" -> ((s, d) => {
      val e = T(s, d, "embeddings")
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 20), k = 5, nlist = 16, nProbe = 4,
        lloydIters = 1)
        .withColumn("rnk", col("rnk").cast("long"))
    }),

    // Multimodal plumbing over deterministic synthetic assets (no fixture
    // table exists for binary payloads; rows-only check — semantics tested
    // in MultimodalSpec). Fixed asset count: an eager count() here would
    // fold an extra table scan into every bench timing.
    "qm01_payload_stats" -> ((s, _) =>
      graft.multimodal.Multimodal.payloadStats(
        graft.multimodal.Multimodal.syntheticAssets(s, 600))),
    "qm02_frame_sample" -> ((s, _) =>
      graft.multimodal.Multimodal.sampleFrames(
        graft.multimodal.Multimodal.syntheticAssets(s, 600), everyMs = 10000)))

  // \s+ split matches TextFns.tokens (tabs/newlines are separators too)
  private val tokensSql = "list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '')"

  val oracle: Map[String, String] = Map(
    "qt01_token_stats" ->
      s"""SELECT doc_id, len($tokensSql)::BIGINT AS n_tokens,
         | length(regexp_replace(text, '\\s+', '', 'g'))::BIGINT AS n_chars_nospace,
         | round(length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE / len($tokensSql), 6) AS mean_word_len
         |FROM documents""".stripMargin,
    "qt02_langid" -> {
      val toks = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t != '')"
      def score(lang: String) =
        s"len(list_filter($toks, t -> t IN ${langProfilesSql(lang)}))"
      s"""WITH sc AS (SELECT doc_id, ${score("en")} AS s_en, ${score("es")} AS s_es,
         |  ${score("fr")} AS s_fr, ${score("de")} AS s_de FROM documents)
         |SELECT doc_id,
         | CASE WHEN s_en = 0 AND s_es = 0 AND s_fr = 0 AND s_de = 0 THEN 'und'
         |      WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
         |      WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
         |      WHEN s_fr >= s_de THEN 'fr'
         |      ELSE 'de' END AS lang_guess
         |FROM sc""".stripMargin
    },
    "qt11_quality" -> {
      val stopList = TextFns.LangId.profiles.flatMap(_._2).distinct
        .map(w => s"'$w'").mkString("(", ",", ")")
      s"""WITH t AS (SELECT doc_id, text,
         |  len($tokensSql)::DOUBLE AS n_tok,
         |  length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE AS n_chars,
         |  CASE WHEN length(text) = 0 THEN 0.0
         |       ELSE length(regexp_replace(text, '[^[:punct:]]', '', 'g'))::DOUBLE / length(text) END AS punct_ratio
         | FROM documents),
         | s AS (SELECT doc_id, n_tok, punct_ratio,
         |  CASE WHEN n_tok = 0 THEN 0.0 ELSE n_chars / n_tok END AS mwl,
         |  CASE WHEN n_tok = 0 THEN 0.0
         |       ELSE len(list_filter(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t != ''),
         |              w -> w IN $stopList))::DOUBLE / n_tok END AS stop_ratio
         | FROM t)
         |SELECT doc_id,
         | (CASE WHEN n_tok >= 10 AND n_tok <= 100000 THEN 1.0 ELSE 0.3 END) * 0.25
         | + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.3 END) * 0.25
         | + (1.0 - least(punct_ratio * 4, 1.0)) * 0.25
         | + least(stop_ratio * 5, 1.0) * 0.25 AS quality
         |FROM s""".stripMargin
    },
    "qt03_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents""".stripMargin,
    "qt04_dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        | min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "qt05_ngram_jaccard" ->
      s"""WITH toks AS (SELECT doc_id, lang, $tokensSql AS ts FROM documents),
         | sh AS (SELECT doc_id, lang,
         |   CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
         |        ELSE list_distinct(list_transform(range(1, len(ts) - 1),
         |               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) END AS sh
         |  FROM toks),
         | sized AS (SELECT doc_id, lang, sh, len(sh) AS n FROM sh WHERE len(sh) > 0),
         | posts AS (SELECT doc_id, lang, n, unnest(sh) AS shingle FROM sized),
         | cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
         |   count(*) AS inter
         |  FROM posts a JOIN posts b
         |   ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT id_a, id_b, round(inter/(na + nb - inter), 6) AS jaccard
         |FROM cand WHERE round(inter/(na + nb - inter), 6) >= 0.15""".stripMargin,
    "qt08_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
        | c AS (SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings),
        | p AS (SELECT query_id, corpus_id,
        |   list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i]::DOUBLE * cv[i]::DOUBLE)) AS dot,
        |   sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE))) AS nq,
        |   sqrt(list_sum(list_transform(cv, x -> x::DOUBLE * x::DOUBLE))) AS nc
        |  FROM q JOIN c ON query_id != corpus_id),
        | s AS (SELECT query_id, corpus_id, round(dot/(nq*nc), 6) AS sim FROM p),
        | r AS (SELECT query_id, corpus_id, sim,
        |   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, corpus_id ASC) AS rnk FROM s)
        |SELECT query_id, corpus_id, sim, rnk::BIGINT AS rnk FROM r WHERE rnk <= 5""".stripMargin)
}
