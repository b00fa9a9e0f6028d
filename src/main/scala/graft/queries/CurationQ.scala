package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Curation
import graft.sources.Tables

/** The COMPOSED LLM-curation pipeline under the oracle — the qp01
  * treatment applied to `Curation.curate` (the workload this library
  * exists for): one catalog entry runs every stage of the composition —
  * canonicalize → quality/repetition gates → exact dedup → near-dup
  * clusters WITH the edit-distance verify stage on → benchmark
  * decontamination → split → pack — and emits the per-stage survivor
  * counts plus packed-sequence stats, each re-derived independently in
  * DuckDB SQL from the same fixtures. Stage-composition bugs (ordering,
  * a gate applied to the wrong survivor set, a stage silently dropped)
  * hash-mismatch here even though every stage is also individually
  * oracled on its own entry (qt04/qt05/qt11/qt14/qt15/qt16/qt23/q43).
  *
  * Fixture construction (all precedented): corpus = documents with
  * doc_id % 17 != 0 plus RE-SUBMITTED copies of docs < 50 under id+10000
  * (qt21's shape — the copies are exact duplicates the exact-dedup stage
  * must kill); benchmark = the doc_id % 17 == 0 slice (qt15's split).
  * Gates are set where the fixture actually discriminates (minTokens 20,
  * minQuality 0.76, maxTopBigramFrac 0.12, J ≥ 0.85, edit-ratio ≤ 0.02,
  * containment ≥ 0.8): at sf0.01 every stage drops rows — 517 → 381 →
  * 346 → 333 → 332 — and the edit-ratio verify genuinely rejects 6 of
  * the 23 candidate pairs, so a verify stage that stopped rejecting (or
  * rejected everything) flips the count.
  *
  * Oracle note: the fixture text is printable ASCII with no digits
  * (checked), so stage 1's NFC-normalize + PII-scrub canonicalization is
  * the identity on it and the SQL twin reads raw text; the non-identity
  * behavior of those two ops is differentially verified on their own
  * entries (qt13 manufactures composed/decomposed accents, qt17 embeds
  * synthetic PII). The SQL uses MATERIALIZED CTE hints: each stage
  * references the previous one several times, and without the hint
  * DuckDB's inlining re-evaluates the upstream chain per reference —
  * exponential in stage depth (measured: >120 s vs 0.7 s at sf0.01).
  */
object CurationQ {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** The qc01 configuration — one place, so the Spark entry and any spec
    * pinning its behavior agree by construction.
    */
  val cfg: Curation.Config = Curation.Config(
    minTokens = 20, minQuality = 0.76,
    maxDupLineFrac = 0.5, maxTopBigramFrac = 0.12,
    ngramN = 3, nearDupJaccard = 0.85,
    maxEditRatio = Some(0.02), contaminationMax = 0.8,
    splits = Seq("train" -> 98.0, "val" -> 1.0, "test" -> 1.0),
    trainSplit = "train", seqBudget = 2048, packShards = 64)

  /** The qc01 fixture — ONE definition (ScaleProbe's qc01 decomposition
    * probe reuses it, so what the probe times is by construction the
    * workload the bench entry runs): corpus = the doc_id % 17 != 0 slice
    * plus re-submitted copies of docs < 50 under id+10000; benchmark =
    * the doc_id % 17 == 0 slice.
    */
  def fixture(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val docs = T(s, d, "documents")
    val corpus = docs.filter(col("doc_id") % 17 =!= 0).select("doc_id", "text")
      .unionByName(docs.filter(col("doc_id") < 50 && col("doc_id") % 17 =!= 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val bench = docs.filter(col("doc_id") % 17 === 0).select("doc_id", "text")
    (corpus, bench)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qc01_curation" -> ((s, d) => {
      val (corpus, bench) = fixture(s, d)
      // persist = true: the 11 count branches below share one lineage;
      // fully lazy, every branch re-executes the full upstream chain
      // (~11× the pipeline — the sf0.1 bench measured 115 s). The
      // persist-at-every-arrow mode materializes each stage once (the
      // component loop that runs during construction warms the caches);
      // the bench's inter-entry isolation reclaims the blocks.
      val st = Curation.stages(corpus, bench, "doc_id", "text", cfg, persist = true)
      def cnt(stage: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).cast("long").as("n"))
          .select(lit(stage).as("stage"), col("n"))
      cnt("00_input", st.input)
        .unionByName(cnt("01_quality", st.quality))
        .unionByName(cnt("02_exact", st.exact))
        .unionByName(cnt("03_neardup", st.deduped))
        .unionByName(cnt("04_clean", st.clean))
        .unionByName(st.split.groupBy(col("split"))
          .agg(count(lit(1)).cast("long").as("n"))
          .select(concat(lit("05_split_"), col("split")).as("stage"), col("n")))
        .unionByName(cnt("06_pieces", st.packed))
        .unionByName(st.packed.select("shard", "seq").distinct()
          .agg(count(lit(1)).cast("long").as("n"))
          .select(lit("06_sequences").as("stage"), col("n")))
        .unionByName(st.packed.agg(sum(col("tok_len")).cast("long").as("n"))
          .select(lit("06_packed_tokens").as("stage"), col("n")))
    }))

  private val toks = "list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '')"
  private val ltoks = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t != '')"
  private val stopList = graft.functions.TextFns.LangId.profiles.flatMap(_._2).distinct
    .map(w => s"'$w'").mkString("(", ",", ")")
  private val hashFrac =
    "(('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT)::DOUBLE / 281474976710656.0"

  private def shingleSql(src: String): String =
    s"""SELECT doc_id, CASE WHEN len(ts) = 0 THEN []
       |    WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
       |    ELSE list_distinct(list_transform(range(1, len(ts) - 1),
       |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) END AS sh
       |  FROM (SELECT doc_id, $toks AS ts FROM $src)""".stripMargin

  val oracle: Map[String, String] = Map(
    "qc01_curation" ->
      s"""WITH RECURSIVE corpus AS MATERIALIZED (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 17 != 0
         |  UNION ALL
         |  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 50 AND doc_id % 17 != 0),
         | bench AS MATERIALIZED (SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0),
         | q AS (SELECT doc_id, text, len($toks)::DOUBLE AS n_tok,
         |   length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE AS n_chars,
         |   CASE WHEN length(text) = 0 THEN 0.0
         |        ELSE length(regexp_replace(text, '[^[:punct:]]', '', 'g'))::DOUBLE / length(text) END AS pr,
         |   CASE WHEN len($toks) = 0 THEN 0.0
         |        ELSE len(list_filter($ltoks, w -> w IN $stopList))::DOUBLE / len($toks) END AS sr
         |  FROM corpus),
         | qs AS (SELECT doc_id, text, n_tok,
         |   (CASE WHEN n_tok >= 10 AND n_tok <= 100000 THEN 1.0 ELSE 0.3 END) * 0.25
         |   + (CASE WHEN (CASE WHEN n_tok = 0 THEN 0.0 ELSE n_chars / n_tok END) >= 2.0
         |           AND (CASE WHEN n_tok = 0 THEN 0.0 ELSE n_chars / n_tok END) <= 12.0
         |      THEN 1.0 ELSE 0.3 END) * 0.25
         |   + (1.0 - least(pr * 4, 1.0)) * 0.25 + least(sr * 5, 1.0) * 0.25 AS quality
         |  FROM q),
         | gated AS MATERIALIZED (SELECT doc_id, text FROM qs WHERE n_tok >= 20 AND quality >= 0.76),
         | lraw AS (SELECT doc_id, trim(l) AS line
         |  FROM gated, unnest(string_split(text, chr(10))) AS u(l) WHERE trim(l) != ''),
         | lcnt AS (SELECT doc_id, line, count(*) AS cnt FROM lraw GROUP BY 1, 2),
         | lstat AS (SELECT doc_id, sum(cnt - 1)::DOUBLE / sum(cnt) AS dlf FROM lcnt GROUP BY 1),
         | bg AS (SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS g
         |  FROM (SELECT doc_id, $toks AS ts FROM gated), unnest(range(1, len(ts))) r(i)
         |  WHERE len(ts) >= 2),
         | bgc AS (SELECT doc_id, g, count(*) AS cnt FROM bg GROUP BY 1, 2),
         | bgs AS (SELECT doc_id, max(cnt)::DOUBLE / sum(cnt) AS tbf FROM bgc GROUP BY 1),
         | quality AS MATERIALIZED (SELECT g.doc_id, g.text FROM gated g
         |   LEFT JOIN lstat USING (doc_id) LEFT JOIN bgs USING (doc_id)
         |   WHERE coalesce(dlf, 0.0) <= 0.5 AND coalesce(tbf, 0.0) <= 0.12),
         | fps AS (SELECT doc_id, text,
         |   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp FROM quality),
         | exact AS MATERIALIZED (SELECT doc_id, text FROM
         |   (SELECT doc_id, text, min(doc_id) OVER (PARTITION BY fp) AS k FROM fps)
         |  WHERE doc_id = k),
         | sized AS MATERIALIZED (SELECT doc_id, sh, len(sh) AS n
         |  FROM (${shingleSql("exact")}) WHERE len(sh) > 0),
         | posts AS (SELECT doc_id, n, unnest(sh) AS s FROM sized),
         | cand AS (SELECT a.doc_id AS ia, b.doc_id AS ib, a.n AS na, b.n AS nb, count(*) AS inter
         |   FROM posts a JOIN posts b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2, 3, 4),
         | rawpairs AS (SELECT ia, ib FROM cand WHERE round(inter / (na + nb - inter), 6) >= 0.85),
         | -- edit-distance VERIFY: multiplication form (d <= r * maxlen), matching
         | -- the Spark comparison bit-for-bit (a division twin rounds differently)
         | pairs AS MATERIALIZED (SELECT ia, ib FROM rawpairs
         |   JOIN exact ea ON ea.doc_id = ia JOIN exact eb ON eb.doc_id = ib
         |   WHERE levenshtein(ea.text, eb.text)::DOUBLE <=
         |     0.02 * greatest(length(ea.text), length(eb.text))::DOUBLE),
         | edges AS MATERIALIZED (SELECT ia AS src, ib AS dst FROM pairs
         |   UNION SELECT ib, ia FROM pairs),
         | reach(id, l) AS (SELECT src, src FROM edges
         |   UNION SELECT e.src, r.l FROM edges e JOIN reach r ON r.id = e.dst),
         | comp AS MATERIALIZED (SELECT id, min(l) AS component FROM reach GROUP BY id),
         | neardup AS MATERIALIZED (SELECT e.doc_id, e.text FROM exact e
         |   LEFT JOIN comp c ON e.doc_id = c.id
         |   WHERE coalesce(c.component, e.doc_id) = e.doc_id),
         | bsized AS MATERIALIZED (SELECT doc_id AS bench_id, sh, len(sh) AS nb
         |  FROM (${shingleSql("bench")}) WHERE len(sh) > 0),
         | cposts AS (SELECT doc_id, unnest(sh) AS s FROM (${shingleSql("neardup")}) WHERE len(sh) > 0),
         | bposts AS (SELECT bench_id, nb, unnest(sh) AS s FROM bsized),
         | cont AS MATERIALIZED (SELECT DISTINCT doc_id FROM (
         |   SELECT c.doc_id, b.bench_id, b.nb, count(*) AS inter
         |    FROM cposts c JOIN bposts b USING (s) GROUP BY 1, 2, 3)
         |  WHERE round(inter / nb, 6) >= 0.8),
         | clean AS MATERIALIZED (SELECT n.doc_id, n.text FROM neardup n
         |   WHERE n.doc_id NOT IN (SELECT doc_id FROM cont)),
         | su AS (SELECT doc_id, text, $hashFrac AS u FROM clean),
         | split AS MATERIALIZED (SELECT doc_id, text,
         |   CASE WHEN u < 0.98 THEN 'train' WHEN u < 0.99 THEN 'val' ELSE 'test' END AS split
         |  FROM su),
         | tr AS (SELECT doc_id, len($toks)::BIGINT AS n_tokens FROM split WHERE split = 'train'),
         | sharded AS (SELECT doc_id, n_tokens, floor($hashFrac * 64)::INT AS shard
         |  FROM tr WHERE n_tokens > 0),
         | cums AS (SELECT doc_id, shard, n_tokens,
         |   sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM sharded),
         | spans AS (SELECT doc_id, shard, cum, cum - n_tokens AS prev FROM cums),
         | pieces AS MATERIALIZED (SELECT doc_id, shard, prev, cum,
         |   unnest(generate_series(floor(prev / 2048)::BIGINT, floor((cum - 1) / 2048)::BIGINT)) AS seq
         |  FROM spans)
         |SELECT '00_input' AS stage, count(*)::BIGINT AS n FROM corpus
         |UNION ALL SELECT '01_quality', count(*) FROM quality
         |UNION ALL SELECT '02_exact', count(*) FROM exact
         |UNION ALL SELECT '03_neardup', count(*) FROM neardup
         |UNION ALL SELECT '04_clean', count(*) FROM clean
         |UNION ALL SELECT '05_split_' || split, count(*) FROM split GROUP BY split
         |UNION ALL SELECT '06_pieces', count(*) FROM pieces
         |UNION ALL SELECT '06_sequences', count(*) FROM (SELECT DISTINCT shard, seq FROM pieces)
         |UNION ALL SELECT '06_packed_tokens',
         |  sum(least(cum, (seq + 1) * 2048) - greatest(prev, seq * 2048))::BIGINT FROM pieces""".stripMargin)
}
