package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard layout: the last step of a curation pipeline is writing
  * the corpus as N shards a data loader can stream independently — every
  * production format (WebDataset tars, Megatron bins, parquet shard dirs)
  * needs (a) a deterministic row→shard assignment and (b) a manifest the
  * loader trusts without re-scanning the data. Assignment reuses the
  * engine-independent md5 fraction of the split family ([Split
  * .hashFraction]): a pure column function of the key — map-only, no
  * shuffle, stable under repartitioning and cluster size, reproducible
  * outside Spark (the DuckDB oracle re-derives it). Shard sizes are then
  * binomial(n, 1/N) — balanced to ~±3·√(n/N) rows without any global sort
  * or window, which is the only shape that survives 100 TB (a
  * size-balancing greedy packer is inherently sequential; the law of
  * large numbers does the balancing here).
  */
object Shards {

  /** Deterministic shard id in [0, nShards) from the row key. */
  def assignShard(key: Column, nShards: Int, seed: String = ""): Column = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    floor(Split.hashFraction(key, seed) * nShards).cast("long")
  }

  /** 48-bit key hash used for the manifest's membership fingerprint —
    * bit_xor-folded so the aggregate is commutative, associative, and
    * overflow-free (order-insensitive by algebra, not by sorting).
    */
  private def keyHash48(key: Column, seed: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(seed))), 1, 12), 16, 10)
      .cast("long")

  /** Per-shard manifest: row count, total weight (token count — what a
    * loader budgets batches by), and a membership fingerprint (bit_xor of
    * the 48-bit key hashes — any added/dropped/moved row flips it). One
    * hash-aggregate over a map-only assignment.
    * Output: (shard, n_docs, n_tokens, fp).
    */
  def manifest(df: DataFrame, idCol: String, weight: Column,
               nShards: Int, seed: String = ""): DataFrame =
    df.select(
        assignShard(col(idCol), nShards, seed).as("shard"),
        weight.cast("long").as("__w"),
        keyHash48(col(idCol), seed).as("__h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__w")).as("n_tokens"),
        expr("bit_xor(__h)").as("fp"))

  /** Write the corpus as a shard-partitioned parquet layout
    * (`path/shard=K/…`) and return the manifest OF WHAT WAS WRITTEN —
    * recomputed by scanning `path` back, not echoed from the input, so a
    * lost/partial write cannot produce a clean manifest. The partitioned
    * write is the same one-pass sink as the silver tables (S8); readers
    * prune to single shards via partition pruning.
    */
  def writeShards(df: DataFrame, idCol: String, weight: Column,
                  nShards: Int, path: String, seed: String = ""): DataFrame = {
    df.withColumn("shard", assignShard(col(idCol), nShards, seed))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val back = df.sparkSession.read.parquet(path)
    back.select(col("shard").cast("long").as("shard"), col(idCol),
        weight.cast("long").as("__w"),
        keyHash48(col(idCol), seed).as("__h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__w")).as("n_tokens"),
        expr("bit_xor(__h)").as("fp"))
  }

  /** JSONL twin of [writeShards] — the format most tokenizer/trainer
    * loaders actually ingest: `path/shard=K/…` text files, one JSON
    * object per line serialized with `to_json` (schema-stable field
    * order: struct field order is the DataFrame's column order). The
    * manifest is again recomputed FROM DISK by reading the JSONL back
    * with the input's schema pinned (no inference pass) — a lost shard or
    * truncated file shows up as a count/fingerprint mismatch, exactly as
    * in the parquet layout.
    */
  def writeJsonlShards(df: DataFrame, idCol: String, weight: Column,
                       nShards: Int, path: String, seed: String = ""): DataFrame = {
    val sharded = df.withColumn("shard", assignShard(col(idCol), nShards, seed))
    val payload = df.columns.map(col)
    sharded.select(col("shard"), to_json(struct(payload: _*)).as("value"))
      .write.mode("overwrite").partitionBy("shard").text(path)
    val spark = df.sparkSession
    import spark.implicits._
    val back = spark.read.schema(df.schema)
      .json(spark.read.text(path).select(col("value")).as[String])
    // partition column is not in the JSON payload — recompute it from the
    // key, which is the same pure function the writer used
    back.select(col(idCol),
        assignShard(col(idCol), nShards, seed).as("shard"),
        weight.cast("long").as("__w"),
        keyHash48(col(idCol), seed).as("__h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__w")).as("n_tokens"),
        expr("bit_xor(__h)").as("fp"))
  }
}
