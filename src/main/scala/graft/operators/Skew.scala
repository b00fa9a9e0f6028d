package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (left) side into `salt` sub-keys
  * and replicate the right side once per salt value, so one hot key spreads
  * over `salt` shuffle partitions instead of one straggler task.
  *
  * Result is row-identical to `left.join(right, keys)` (inner). The salt
  * hashes the left row's content — fully DETERMINISTIC, so shuffle-retry
  * recomputation assigns the same salt to the same row (a nondeterministic
  * salt such as rand() or a row ordinal risks SPARK-23207-style row
  * loss/duplication under partial stage retries). Caveat: byte-identical
  * duplicate rows share a salt and still co-locate; pass `discriminator`
  * (a stable row-id column, e.g. a source offset) to spread them too.
  * AQE's skew-join handles moderate skew automatically; explicit salting is
  * for the pathological keys AQE can't split (e.g. one key = 30% of 100 TB).
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String], salt: Int,
                 discriminator: Option[String] = None): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // hash/xxhash64 rejects MapType (SPARK-27619) — exclude map-bearing
    // columns from the default salt input so the documented "drop-in for
    // left.join(right, keys)" claim holds for frames with map columns;
    // the remaining columns still spread same-key rows (and the
    // discriminator stays the full-duplicate escape hatch)
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val hashCols = discriminator.map(c => Seq(col(c))).getOrElse {
      val cols = left.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name)).toSeq
      require(cols.nonEmpty, "no hashable columns for the salt — pass a discriminator")
      cols
    }
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(hashCols: _*), lit(salt)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until salt).map(lit(_)): _*)))
    saltedLeft.join(saltedRight, keys :+ "__salt").drop("__salt")
  }

  /** [saltedJoin] restricted to the LISTED hot keys — the production shape
    * when the right side is too large to replicate ×salt wholesale
    * (replicating the whole right side is only cheap for dims). Rows whose
    * first key column is in `hotKeys` take the salted path; everything
    * else takes a plain equi-join with NO explode — the cold path's
    * shuffle volume is untouched. Row-identical to `left.join(right,
    * keys)` (inner): the two paths partition the left side by key
    * membership, so their union covers each joined row exactly once.
    *
    * The hot list is typically tiny (the heavy-hitter keys a
    * count-min/groupBy-topN pass surfaces — at 100 TB you know your
    * pathological keys); it broadcasts as two `isin` literals, adding no
    * shuffle. AQE's skew handling remains the first resort; this is for
    * the keys whose single value exceeds what one task can hold even
    * after AQE splitting.
    */
  def saltedJoinHot(left: DataFrame, right: DataFrame, keys: Seq[String], salt: Int,
                    hotKeys: Seq[Any], discriminator: Option[String] = None): DataFrame = {
    require(hotKeys.nonEmpty, "empty hotKeys — use a plain join")
    val k = col(keys.head)
    // null-safe complement: a null key never equals a hot key, but
    // !isin(nulls) evaluates NULL and would silently drop the row from
    // BOTH paths — inner-join semantics keep null-keyed rows out of the
    // result only via the join itself, never via the split
    def isHot(df: DataFrame) = df.filter(df(keys.head).isin(hotKeys: _*))
    def isCold(df: DataFrame) =
      df.filter(!df(keys.head).isin(hotKeys: _*) || df(keys.head).isNull)
    val hot = saltedJoin(isHot(left), isHot(right), keys, salt, discriminator)
    val cold = isCold(left).join(isCold(right), keys)
    // unionByName: saltedJoin's drop can reorder columns vs the plain join
    hot.unionByName(cold)
  }

  /** Sketch-based hot-key detection — the 100 TB feeder for
    * [saltedJoinHot]'s `hotKeys` list. The exact groupBy-count top-k a
    * fixture-scale caller can afford (q42h) shuffles every distinct key;
    * at full width the detector must be one COMBINABLE aggregate. Two
    * passes, both bounded:
    *
    *  1. one global Misra–Gries aggregate (`Aggregators.MisraGriesAgg`,
    *     O(k) state per partition, merged at the single reduce) plus the
    *     row count, in the same job — by the MG guarantee every key with
    *     f_true > n/k is IN the candidate summary, so no key above the
    *     threshold can be missed;
    *  2. an exact verification count over the ≤ k−1 candidate keys only
    *     (the sketch's estimates are lower bounds; the verify pass — the
    *     same candidate+verify pattern as the LSH/IVF rerank family —
    *     restores exact counts before the threshold cut).
    *
    * Returns keys whose EXACT frequency exceeds `minShare`·n, heaviest
    * first, in the key column's native type. The driver collect is
    * bounded at k−1 rows by construction. Keys are sketched through a
    * string cast (the MG aggregator's domain); the verify filter applies
    * the same cast, so any key type with a stable string form works.
    * Pick minShare ≥ 1/k — below that the sketch's containment guarantee
    * no longer covers the threshold and a qualifying key could be absent.
    */
  def hotKeysSketch(df: DataFrame, keyCol: String, k: Int,
                    minShare: Double): Seq[Any] = {
    require(k >= 2, s"k must be >= 2: $k")
    require(minShare >= 1.0 / k,
      f"minShare $minShare%.4f < 1/k=${1.0 / k}%.4f: keys between the two " +
        "could exceed the threshold yet be pruned from the sketch")
    val row = df.agg(
      graft.functions.Aggregators.heavyHitters(k)(col(keyCol).cast("string"))
        .as("mg"),
      count(lit(1)).as("n")).head()
    val cands = row.getMap[String, Long](0).keys.toSeq
    val n = row.getLong(1)
    if (cands.isEmpty) Seq.empty
    else df.filter(col(keyCol).cast("string").isin(cands: _*))
      .groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > lit(minShare * n))
      .orderBy(col("__n").desc, col(keyCol).asc)
      .collect().map(_.get(0)).toSeq // ≤ k−1 rows by construction
  }
}
