package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot differencing — the change-data-capture primitive for pipelines
  * that receive full table reloads (the reference's bronze layer re-downloads
  * whole CSVs per run; reference `airflow/dags/bronze/utils.py` MERGEs them
  * blindly): diff two snapshots keyed on a primary key and emit one row per
  * changed key, labeled insert / delete / update. Feeding the diff (instead
  * of the full reload) into [Upsert.keyedUpsert] turns an O(table) daily
  * merge into an O(changes) one — at 100 TB the difference between
  * rewriting the lake and touching a few files.
  *
  * Plan shape: one full outer join on the key (single co-partitioned
  * shuffle; null-safe `<=>` so null keys pair up instead of duplicating),
  * then a null-safe any-column comparison to drop unchanged keys. No
  * window, no collect; AQE handles skewed keys.
  */
object TableDiff {

  /** Diff `newDf` against `oldDf` on `keys`. Output: the key columns, then
    * `change_type` ∈ {insert, delete, update}, then every non-key column
    * twice as `<col>_old` / `<col>_new` (null on the absent side for
    * inserts/deletes). Unchanged keys (all non-key columns null-safe-equal)
    * are dropped. Both inputs must share the schema; key values must be
    * unique per snapshot (enforced upstream, as in any MERGE source).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    require(oldDf.columns.toSeq == newDf.columns.toSeq,
      s"snapshot schemas differ: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    val nonKeys = oldDf.columns.filterNot(keys.contains).toSeq
    // presence markers, not key-null checks: a row whose key columns are all
    // null still EXISTS in its snapshot (and null-safe-joins its twin)
    val o = oldDf.withColumn("__in_old", lit(true)).as("o")
    val n = newDf.withColumn("__in_new", lit(true)).as("n")
    val joinCond = keys.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    val inOld = col("o.__in_old").isNotNull
    val inNew = col("n.__in_new").isNotNull
    val changed: Column = nonKeys
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, joinCond, "full_outer")
      .withColumn("change_type",
        when(!inOld, lit("insert"))
          .when(!inNew, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .select(
        keys.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k)) ++
          Seq(col("change_type")) ++
          nonKeys.flatMap(c =>
            Seq(col(s"o.$c").as(s"${c}_old"), col(s"n.$c").as(s"${c}_new"))): _*)
  }
}
