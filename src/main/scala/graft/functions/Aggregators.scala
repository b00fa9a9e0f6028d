package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY §2.11): custom aggregates written as
  * `Aggregator`s, which Catalyst plans as real two-phase aggregates —
  * partial buffers per partition, merge at the shuffle — the same
  * map-side-combine shape as built-in aggs, so they hold at 100 TB where
  * a collect-then-fold would not.
  */
object Aggregators {

  /** Most frequent non-null value; ties break to the SMALLEST value,
    * making the result deterministic where SQL `mode()` leaves the
    * tiebreak unspecified (the same determinism discipline as the
    * DISTINCT ON tiebreak, Upsert.scala A2). The buffer is a value→count
    * map, bounded by the column's distinct-value count — meant for
    * bounded-domain columns (flags, categories, language codes), not free
    * text; at 100 TB the shuffle then carries one small map per
    * (partition, group), not rows.
    */
  object ModeAgg extends Aggregator[String, Map[String, Long], String] {

    /** Hard cap on the buffer's distinct-value count. The bounded-domain
      * contract above is ENFORCED, not advisory: a caller aggregating free
      * text fails fast with a diagnosable message on the first partition
      * that crosses the cap, instead of growing a per-group map until an
      * executor dies of OOM mid-shuffle at 100 TB. 64k distinct values is
      * far above any flag/category/language domain and far below OOM.
      */
    val MaxDistinct = 65536

    private def checkBound(m: Map[String, Long]): Map[String, Long] = {
      require(m.size <= MaxDistinct,
        s"graft_mode buffer exceeded $MaxDistinct distinct values — this " +
          "aggregate is for bounded-domain columns (flags, categories, " +
          "language codes), not free text; use approx top-k instead")
      m
    }

    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      if (v == null) b else checkBound(b.updated(v, b.getOrElse(v, 0L) + 1L))
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      if (a.size < b.size) merge(b, a)
      else checkBound(
        b.foldLeft(a) { case (acc, (k, n)) => acc.updated(k, acc.getOrElse(k, 0L) + n) })
    def finish(m: Map[String, Long]): String =
      if (m.isEmpty) null
      else m.minBy { case (k, n) => (-n, k) }._1
    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** The Column form, usable with no session-level registration. */
  val mode: org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    val u = udaf(ModeAgg, Encoders.STRING)
    c => u(c)
  }

  /** Misra–Gries heavy hitters (Misra & Gries 1982; merge rule per
    * Agarwal et al., "Mergeable Summaries" 2012) — the approx top-k that
    * [ModeAgg]'s bounded-domain contract points free-text callers at. The
    * buffer holds at most k−1 counters REGARDLESS of the column's
    * distinct-value count, so the shuffle carries O(k) per (partition,
    * group) even over an unbounded vocabulary; merge sums counters and
    * re-prunes by subtracting the k-th largest count.
    *
    * Guarantee (survives merging): for every value,
    * est ≤ f_true ≤ est + n/k — so every value with f_true > n/k is IN
    * the summary. The summary's exact content depends on partition order
    * (the estimates are lower bounds, not exact counts); downstream
    * consumers restore exactness with a verification count over the
    * candidate set only — the same candidate-generation + verify pattern
    * as the LSH/IVF rerank family (entry qt50).
    */
  case class MisraGriesAgg(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 2, s"k must be >= 2: $k")

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      if (v == null) b
      else b.get(v) match {
        case Some(n) => b.updated(v, n + 1L)
        case None if b.size < k - 1 => b.updated(v, 1L)
        case None => // decrement-all step: the O(k) amortized classic
          b.collect { case (t, n) if n > 1L => t -> (n - 1L) }
      }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val m = if (a.size >= b.size)
        b.foldLeft(a) { case (acc, (t, n)) => acc.updated(t, acc.getOrElse(t, 0L) + n) }
      else merge(b, a)
      if (m.size <= k - 1) m
      else {
        // subtract the k-th largest counter from all; ≤ k−1 stay positive
        val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k - 1)
        m.collect { case (t, n) if n - cut > 0L => t -> (n - cut) }
      }
    }

    def finish(m: Map[String, Long]): Map[String, Long] = m
    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** Column form of [MisraGriesAgg]. */
  def heavyHitters(k: Int): org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    val u = udaf(MisraGriesAgg(k), Encoders.STRING)
    c => u(c)
  }

  /** SQL-surface registration (idempotent): `SELECT graft_mode(col) ...`.
    * A UserDefinedAggregateFunction registers per session, unlike the
    * native expressions GraftExtensions injects at extension time.
    */
  def register(spark: SparkSession): Unit =
    spark.udf.register("graft_mode", udaf(ModeAgg, Encoders.STRING))
}
