package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** MERGE-upsert emulation + DISTINCT ON (SURVEY §2.1 S9/S10, §2.4 A2).
  *
  * The reference's incremental loading is DuckDB `MERGE INTO`
  * (/root/reference/airflow/dags/bronze/utils.py:348-366 all-columns key;
  * :442-454 explicit keys). Vanilla Spark has no MERGE; these kernels
  * reproduce the exact semantics with anti-join + union — both are single
  * shuffle-join plans, broadcast-able when the source increment is small
  * (the common case: daily increments vs a big target).
  */
object Upsert {

  /** S9: MERGE with every data column as key. `UPDATE SET *` on full-row
    * match is a no-op, so semantics degenerate to insert-if-row-absent:
    * union + distinct over the key columns.
    */
  def allColumnsUpsert(target: DataFrame, source: DataFrame,
                       auditCols: Seq[String] = Seq("loaded_at", "source_file", "source_url")): DataFrame = {
    val keys = target.columns.filterNot(auditCols.contains).toSeq
    // Matched keys keep the TARGET row. Data columns are identical either
    // way (they ARE the match key); audit columns are a DOCUMENTED
    // DEVIATION: the reference's UPDATE SET * refreshes loaded_at/
    // source_file from the re-shipped load (bronze/utils.py:348-366),
    // while this kernel keeps the FIRST load's audit values — "when did
    // this row first arrive", which is the more useful lineage fact and
    // keeps re-runs byte-identical. Matching is NULL-SAFE (<=>): all-string bronze rows
    // carry real nulls for empty CSV fields, and a plain equi-anti-join
    // would re-insert such rows on every idempotent re-run. (Literal SQL
    // MERGE shares that null blindness; the reference's intent — idempotent
    // re-loads — requires nulls-equal matching, SURVEY §7.4 item 1.)
    val s = source.alias("__s")
    val t = target.alias("__t")
    val cond = keys.map(k => col(s"__s.$k") <=> col(s"__t.$k")).reduce(_ && _)
    val incoming = s.join(t, cond, "left_anti")
      .select(source.columns.map(c => col(s"__s.$c")): _*)
      .dropDuplicates(keys)
    target.unionByName(incoming, allowMissingColumns = true)
  }

  /** S10: keyed MERGE — source wins on key collision (`WHEN MATCHED UPDATE
    * SET *`), unmatched target rows survive, unmatched source rows insert.
    *   result = source ∪ (target ⟕anti source on keys)
    * One shuffle (or zero, if the source increment broadcasts).
    * Idempotent: upsert(upsert(t, s), s) == upsert(t, s) — including null
    * keys: matching is null-safe (`<=>`) like `allColumnsUpsert`, because a
    * plain equi-anti-join never matches a null key, so a null-keyed source
    * row would re-insert on every re-run.
    */
  def keyedUpsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val t = target.alias("__t")
    val s = source.alias("__s")
    val cond = keys.map(k => col(s"__t.$k") <=> col(s"__s.$k")).reduce(_ && _)
    val survivors = t.join(s, cond, "left_anti")
      .select(target.columns.map(c => col(s"__t.$c")): _*)
    source.unionByName(survivors)
  }

  /** S12: consolidate N staging increments into a target (bronze/utils.py:718-793). */
  def mergeStaging(target: DataFrame, stagings: Seq[DataFrame], keys: Seq[String]): DataFrame =
    stagings.foldLeft(target)((acc, s) => keyedUpsert(acc, s, keys))

  /** A2: DuckDB `SELECT DISTINCT ON (keys) ... ORDER BY tiebreak` — one row
    * per key group, chosen by the tiebreak ordering. The reference's usage
    * is nondeterministic (no ORDER BY); we impose a deterministic tiebreak
    * so results are oracle-testable (SURVEY §7.4 item 2).
    * Window + row_number = single shuffle on the partition keys, streaming
    * rank within partition — no global sort, scales linearly.
    */
  def distinctOn(df: DataFrame, keys: Seq[String], tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
