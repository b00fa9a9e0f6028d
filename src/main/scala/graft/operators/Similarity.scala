package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - brute-force cosine top-k — exact baseline, O(n·m) pairs; fine when
  *     one side broadcasts (queries ≪ corpus) — correctness oracle;
  *   - LSH-bucketed (random-hyperplane signs) — the 100 TB path: corpus is
  *     bucketed once (shuffle on bucket key), probes join only their bucket.
  * Dot products are pure column `aggregate`/`zip_with` — codegen-friendly,
  * no UDF.
  */
object Similarity {

  /** Cosine similarity of two equal-length numeric arrays, computed in
    * double precision: dot / (||a||·||b||).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (na * nb)
  }

  /** Exact brute-force top-k cosine neighbors for every vector of `queries`
    * against `corpus`. Self-pairs excluded when ids collide. The corpus side
    * should be the big one; Spark broadcasts `queries` when small.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = q.join(c, col("query_id") =!= col("corpus_id"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("corpus_id"), col("sim"), col("rnk"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a fixed hash mapped to [-1, 1]. Reproducible across engines/runs
    * without a random number generator.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(2000001L)).cast("double") / 1000000.0) - 1.0

  /** Sign-random-projection LSH bucket id: `planes` hyperplanes → one bit
    * each (dot ≥ 0) → integer bucket. Vectors in the same bucket are
    * cosine-similar with probability rising in their angle. `family` selects
    * an independent hyperplane set (one per hash table).
    */
  def lshBucket(vec: Column, planes: Int, family: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      val dot = aggregate(zip_with(vec, sequence(lit(0), size(vec) - 1),
        (v, i) => v.cast("double") * planeComponent(family * 10007 + p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** IVF (inverted-file) ANN: coarse-quantize the corpus into `nlist`
    * cells with a few Lloyd iterations of k-means (deterministic seeding:
    * the vectors with the smallest hashed ids), then probe only the
    * `nProbe` nearest cells per query and exact-rerank inside them.
    *
    * At 100 TB the corpus is partitioned by cell id (one shuffle at index
    * build); each query touches nProbe/nlist of the data. Training runs on
    * the corpus itself via posexplode→per-dim mean — all DataFrame ops, no
    * driver-side vectors except the (nlist × dim) centroid table, which is
    * broadcast.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nProbe: Int = 4, lloydIters: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    // deterministic seeds: nlist vectors with smallest hash(id)
    // Centroid tables are tiny (nlist × dim); pin each training round to the
    // driver so the final plan doesn't embed the whole Lloyd lineage twice
    // (once under the corpus assignment, once under the query probes) and
    // re-train on every action.
    def pinned(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)
    }
    var centroids = pinned(c.withColumn("__h", xxhash64(col("corpus_id")))
      .orderBy(col("__h")).limit(nlist)
      .select(monotonically_increasing_id().as("cell"), col("cv").as("centroid")))
    var iter = 0
    while (iter < lloydIters) {
      val assigned = assignCells(c, centroids, 1)
      centroids = pinned(assigned
        .select(col("cell"), posexplode(col("cv")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col").cast("double")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), x => x.getField("m").cast("float")).as("centroid")))
      iter += 1
    }
    val indexed = assignCells(c, centroids, 1) // corpus: home cell only
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probes = assignCells(q.withColumnRenamed("query_id", "corpus_id")
        .withColumnRenamed("qv", "cv"), centroids, nProbe)
      .select(col("corpus_id").as("query_id"), col("cv").as("qv"), col("cell"))
    val scored = probes.join(indexed, Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), col("qv"), col("cv")).distinct()
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("corpus_id"), col("sim"), col("rnk"))
  }

  /** Attach the `take` nearest cells (by cosine to centroid) to each vector
    * row of (corpus_id, cv). Centroid table is tiny → broadcast join.
    */
  private def assignCells(vecs: DataFrame, centroids: DataFrame, take: Int): DataFrame = {
    val joined = vecs.crossJoin(broadcast(centroids))
      .withColumn("__d", cosine(col("cv"), col("centroid")))
    val w = Window.partitionBy(col("corpus_id")).orderBy(col("__d").desc, col("cell").asc)
    joined.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= take)
      .select(vecs.columns.map(col) :+ col("cell"): _*)
  }

  /** Approximate top-k: bucket corpus and queries with `planes`-bit LSH
    * (optionally multiple tables via `tables` different plane offsets),
    * join within buckets only, exact cosine re-rank inside the candidate
    * set. Recall < 1, cost ≪ brute force; candidates-per-query bounded by
    * bucket sizes, not corpus size.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 12, tables: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def bucketed(df: DataFrame, prefix: String): DataFrame =
      df.select(col(idCol).as(s"${prefix}_id"), col(vecCol).as(s"${prefix}v"))
        .withColumn("tb", explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"), lshBucket(col(s"${prefix}v"), planes, t).as("b"))): _*)))
        .select(col(s"${prefix}_id"), col(s"${prefix}v"),
          col("tb.t").as("table"), col("tb.b").as("bucket"))
    val c = bucketed(corpus, "c")
    val q = bucketed(queries, "q")
    val cands = q.join(c, Seq("table", "bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id").as("query_id"), col("c_id").as("corpus_id"),
        col("qv"), col("cv"))
      .distinct()
    val scored = cands.withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("corpus_id"), col("sim"), col("rnk"))
  }
}
