package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CurationQ, Events, Extras, Relational, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` aggregates the per-family catalogs; every SQL-expressible entry
  * has a DuckDB oracle in `oracleSql` with identical output column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.defs("q01_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ TextOps.defs ++ Events.defs ++ Extras.defs ++ CurationQ.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables (the fnv1a64/splitmix64 hash family — and the
    * sign-LSH hyperplanes derived from it — is re-derived in SQL, see
    * TextOps.HashSql; the Lloyd-trained IVF path is oracled via
    * order-deterministic oracle-mode means, see TextOps.ivfCtes). Every
    * query entry has an oracle; qt49's is an INVARIANT oracle (DuckDB
    * predicts zlib-bound booleans from text length, Spark computes them
    * from real DEFLATE output) since the raw ratio is JVM-zlib-specific.
    */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ TextOps.oracle ++ Events.oracle ++ Extras.oracle ++ CurationQ.oracle
}
