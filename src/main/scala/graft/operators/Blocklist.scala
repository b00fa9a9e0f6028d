package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Blocklist gating — the unsexy workhorse of every production curation
  * stack: a list of banned terms (NSFW wordlists, spam markers) scored
  * against each document as a hit RATIO, not a binary contains — one
  * unlucky token must not kill a long document (the mistake naive LIKE
  * filters make), while a short document that is mostly banned terms must
  * die.
  *
  * Scale shape: the blocklist is a DataFrame (production lists are
  * thousands of phrases, maintained as a table, not a literal) that
  * broadcasts; the corpus side is one explode + broadcast equi-join + one
  * count aggregate — no regex scan of the full text per banned term
  * (a |list|×|corpus| regex pass is the anti-pattern this operator
  * replaces).
  */
object Blocklist {

  /** Per-document blocklist score against `terms` (a one-column frame of
    * banned tokens; matching is token-exact, case-insensitive). Output:
    * (idCol, n_tokens, n_hits, hit_ratio, blocked) for every input row,
    * blocked ⇔ hit_ratio > maxRatio.
    */
  def termHits(df: DataFrame, idCol: String, textCol: String,
               terms: DataFrame, maxRatio: Double): DataFrame = {
    require(maxRatio >= 0, s"maxRatio must be >= 0: $maxRatio")
    val termCol = terms.columns.head
    val banned = terms.select(lower(col(termCol)).as("__term")).distinct()
    val toks = df.select(col(idCol), TextFns.tokens(lower(col(textCol))).as("ts"))
    val hits = toks.select(col(idCol), explode(col("ts")).as("__term"))
      .join(broadcast(banned), Seq("__term"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    toks.select(col(idCol), size(col("ts")).cast("long").as("n_tokens"))
      .join(hits, Seq(idCol), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("hit_ratio", round(
        when(col("n_tokens") > 0,
          col("n_hits").cast("double") / col("n_tokens")).otherwise(lit(0.0)), 6))
      .withColumn("blocked", col("hit_ratio") > lit(maxRatio))
  }

  /** The gate itself: rows of `df` whose blocklist ratio passes. */
  def filterClean(df: DataFrame, idCol: String, textCol: String,
                  terms: DataFrame, maxRatio: Double): DataFrame =
    df.join(termHits(df, idCol, textCol, terms, maxRatio)
        .filter(!col("blocked")).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** Map-only keep-predicate for LITERAL term lists (config-sized): the
    * same rounded hit-ratio semantics as [termHits], evaluated as an
    * array_contains filter over the token array — no explode, no join, no
    * state, so it drops into row-local gate chains (batch Curation) and
    * streaming front-gates unchanged. Use the DataFrame forms above when
    * the list is a table.
    */
  def keepPredicate(text: Column, terms: Seq[String], maxRatio: Double): Column = {
    require(terms.nonEmpty, "empty blocklist: gate would be a no-op, omit it instead")
    // one native pass (graft_profile_hits with the banned list as the
    // single profile) — the Column twin below kept an interpreted
    // filter-HOF on the row-local gate path (BlocklistSpec pins equality)
    val h = graft.functions.Expressions.profileHits(text,
      Seq(terms.map(_.toLowerCase)))
    val ratio = round(when(h.getItem(0) > 0,
      h.getItem(1).cast("double") / h.getItem(0)).otherwise(lit(0.0)), 6)
    ratio <= lit(maxRatio)
  }

  /** Column form of [keepPredicate] — the differential baseline. */
  private[graft] def keepPredicateColumns(text: Column, terms: Seq[String],
                                          maxRatio: Double): Column = {
    val banned = array(terms.map(t => lit(t.toLowerCase)): _*)
    val ts = TextFns.tokens(lower(text))
    val ratio = round(when(size(ts) > 0,
      size(filter(ts, t => array_contains(banned, t))).cast("double") / size(ts))
      .otherwise(lit(0.0)), 6)
    ratio <= lit(maxRatio)
  }
}
