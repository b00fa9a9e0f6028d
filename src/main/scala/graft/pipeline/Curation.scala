package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Expressions, TextFns}
import graft.operators.{Dedup, Pack, Split}

/** The operators composed into the pipeline they exist for: raw crawl →
  * training sequences. Each stage is one of the library's scale-shaped
  * primitives; the composition adds NO new shuffles beyond what the
  * stages themselves declare, and every stage's semantics is already
  * oracle-verified on its own catalog query — this file is the
  * integration, tested end-to-end on planted fixtures (CurationSpec).
  *
  * Stage order matters and is the standard one:
  * canonicalize first (hashes must see one byte representation),
  * cheap row-local gates before pairwise ops (shrink the pair space),
  * exact dedup before near-dup (exact copies would bloat every posting
  * list), decontamination last among filters (a contaminated doc must
  * not survive via a near-dup twin: the filter runs on the deduped
  * survivor set that ships), then split/pack on what remains.
  *
  * At 100 TB each arrow between stages is where a production run would
  * persist (checkpoint tables, as the reference's medallion layers do);
  * the composition itself stays lazy so small runs execute as one job.
  */
object Curation {

  case class Config(
      minTokens: Int = 10,
      minQuality: Double = 0.5,
      maxDupLineFrac: Double = 0.5,
      maxTopBigramFrac: Double = 0.5,
      ngramN: Int = 3,
      nearDupJaccard: Double = 0.85,
      // when set, near-dup candidate pairs are CONFIRMED by Levenshtein
      // before clustering: pairs whose edit distance exceeds this fraction
      // of the longer text are rejected as shingle-coincidence false
      // positives. Runs on candidates only — never n².
      maxEditRatio: Option[Double] = None,
      contaminationMax: Double = 0.8,
      splits: Seq[(String, Double)] = Seq("train" -> 98.0, "val" -> 1.0, "test" -> 1.0),
      trainSplit: String = "train",
      seqBudget: Long = 2048,
      packShards: Int = 64) {
    require(splits.exists(_._1 == trainSplit),
      s"trainSplit '$trainSplit' must be one of the configured splits: ${splits.map(_._1)}")
  }

  /** Curated output: `documents` — the surviving rows (id, canonical
    * text, split); `sequences` — the train split packed into
    * `cfg.seqBudget`-token sequences.
    */
  case class Curated(documents: DataFrame, sequences: DataFrame)

  /** Every intermediate survivor set of one [curate] run — the stage
    * frames a production run would checkpoint between arrows. Exposed so
    * the composed pipeline can be verified STAGE BY STAGE (qc01): each
    * frame is lazy and shares the plan subtree of the previous one, so
    * counting all of them is one job per frame over a common lineage, not
    * a re-run per stage.
    */
  case class Stages(input: DataFrame, quality: DataFrame, exact: DataFrame,
                    deduped: DataFrame, clean: DataFrame, split: DataFrame,
                    packed: DataFrame)

  def curate(docs: DataFrame, benchmark: DataFrame, idCol: String, textCol: String,
             cfg: Config = Config()): Curated = {
    val st = stages(docs, benchmark, idCol, textCol, cfg)
    Curated(st.split, st.packed)
  }

  /** `persist = true` caches each stage frame as it is built — the
    * "persist at every arrow" mode the object doc describes for
    * production runs (and for anything that observes more than one stage,
    * like qc01's count union: without it every observer re-executes the
    * shared upstream chain, and the near-dup stage's component loop —
    * which runs eagerly during construction — would pay the quality/exact
    * chain a second time). `false` (default) keeps the composition fully
    * lazy so small single-output runs execute as one job and leak no
    * cache entries.
    */
  def stages(docs: DataFrame, benchmark: DataFrame, idCol: String, textCol: String,
             cfg: Config = Config(), persist: Boolean = false): Stages = {
    def mark(df: DataFrame): DataFrame = if (persist) df.persist() else df
    val id = col(idCol)

    // 1. canonicalize: one byte representation (NFC) with PII gone, BEFORE
    // any hash sees the text
    val canon = docs.select(id,
      TextFns.scrubPii(Expressions.normalizeText(col(textCol), "NFC")).as(textCol))

    // 2. row-local quality gates (narrow, no shuffle), then the doc-keyed
    // repetition signals — cheap filters shrink every pairwise stage after
    val gated = canon
      .filter(TextFns.tokenCount(col(textCol)) >= cfg.minTokens &&
        TextFns.qualityScore(col(textCol)) >= cfg.minQuality)
    val rep = graft.operators.Repetition.repetitionSignals(gated, idCol, textCol)
      .filter(col("dup_line_frac") <= cfg.maxDupLineFrac &&
        col("top_bigram_frac") <= cfg.maxTopBigramFrac)
      .select(id)
    val quality = mark(gated.join(rep, Seq(idCol), "left_semi"))

    // 3. exact dedup (fingerprint aggregate), keep the min-id copy
    val exactKeep = Dedup.exactByFingerprint(quality, textCol, idCol)
      .select(col("keep_id").as(idCol))
    val exact = mark(quality.join(exactKeep, Seq(idCol), "left_semi"))

    // 4. near-dup clusters over the survivors, keep canonical members.
    // Prefix-filtered pair generation (exact — identical output to the
    // plain inverted index, the DedupSpec-pinned equivalence): at a
    // production dedup threshold the prefix indexes ~15-30% of each doc
    // and hot boilerplate shingles sort to the unindexed tail, which is
    // the regime a real corpus (and this fixture's ~31-word vocabulary)
    // lives in — see ScaleProbe `jaccard` / docs/SCALE.md.
    // Optional verify stage: confirm Jaccard candidates by edit distance
    // (normalized by the longer text) before they merge clusters
    val rawPairs = Dedup.ngramJaccardPairsPrefix(exact, idCol, textCol,
      n = cfg.ngramN, threshold = cfg.nearDupJaccard)
    val pairs = cfg.maxEditRatio.fold(rawPairs) { maxRatio =>
      val ta = exact.select(id.as("id_a"), col(textCol).as("__ta"))
      val tb = exact.select(id.as("id_b"), col(textCol).as("__tb"))
      // BOUNDED Levenshtein: the DP early-exits (and returns -1) once the
      // distance exceeds ⌈maxRatio·max(|a|,|b|)⌉ — O(bound·min) per pair
      // instead of O(|a|·|b|), which matters when candidates are long
      // documents. -1 (exceeded) fails the ≤ comparison like any
      // over-bound distance; the exact unrounded ratio check stays.
      val bound = ceil(lit(maxRatio) *
        greatest(length(col("__ta")), length(col("__tb"))).cast("double")).cast("int")
      val dist = org.apache.spark.sql.graftbridge.Bridge.column(
        org.apache.spark.sql.catalyst.expressions.Levenshtein(
          org.apache.spark.sql.graftbridge.Bridge.expression(col("__ta")),
          org.apache.spark.sql.graftbridge.Bridge.expression(col("__tb")),
          Some(org.apache.spark.sql.graftbridge.Bridge.expression(bound))))
      rawPairs.join(ta, "id_a").join(tb, "id_b")
        .filter(dist >= 0 && dist.cast("double") <=
          lit(maxRatio) * greatest(length(col("__ta")), length(col("__tb"))).cast("double"))
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }
    val canonical = Dedup.nearDupClusters(exact, idCol, pairs)
      .filter(col("is_canonical")).select(id)
    val deduped = mark(exact.join(canonical, Seq(idCol), "left_semi"))

    // 5. decontaminate against the benchmark (containment, not Jaccard).
    // The benchmark goes through the SAME canonicalization as stage 1 —
    // shingles must compare canonical bytes to canonical bytes, or a
    // decomposed-Unicode benchmark item (or one containing PII the corpus
    // copy had rewritten to <EMAIL>/<IP>/<PHONE>) could never match its
    // contaminated twin and would silently ship in the training set
    val benchCanon = benchmark.select(col(idCol),
      TextFns.scrubPii(Expressions.normalizeText(col(textCol), "NFC")).as(textCol))
    val contaminated = Dedup.ngramContainmentPairs(deduped, benchCanon, idCol, textCol,
      n = cfg.ngramN, threshold = cfg.contaminationMax)
      .select(col("doc_id").as(idCol)).distinct()
    val clean = mark(deduped.join(contaminated, Seq(idCol), "left_anti"))

    // 6. deterministic split, 7. pack the configured train split
    val split = mark(Split.assignSplit(clean, id, cfg.splits))
    val trainTokens = split.filter(col("split") === lit(cfg.trainSplit))
      .select(id, TextFns.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val packed = mark(Pack.packSequences(trainTokens, idCol, "n_tokens",
      cfg.seqBudget, cfg.packShards))
    Stages(canon, quality, exact, deduped, clean, split, packed)
  }
}
