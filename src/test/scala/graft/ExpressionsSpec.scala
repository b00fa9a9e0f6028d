package graft

import org.apache.spark.sql.functions._
import graft.functions.{Expressions, Spatial}
import graft.operators.Dedup

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native Fnv1a64 matches the scalar implementation, null-safe") {
    val got = Seq("hello", "world", null).toDF("s")
      .select(Expressions.fnv1a64($"s").as("h")).as[Option[Long]].collect().toSeq
    assert(got === Seq(Some(Dedup.fnv1a64("hello")), Some(Dedup.fnv1a64("world")), None))
  }

  test("native SimHash64 matches the independent UDF implementation on fixture docs") {
    val docs = graft.sources.Tables.table(spark, sf, "documents").limit(50)
    val both = docs.select(
      Expressions.simhash64($"text").as("native"),
      Dedup.simhash64Udf($"text").as("viaUdf"))
    assert(both.filter($"native" =!= $"viaUdf").count() === 0)
  }

  test("native expressions are SQL-callable through GraftExtensions") {
    // TestSession is built via GraftSession.builder → extensions installed
    val h = spark.sql("SELECT graft_fnv1a64('abc') AS h").as[Long].head()
    assert(h === Dedup.fnv1a64("abc"))
    val c = spark.sql(
      "SELECT graft_wkt_centroid('POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))') AS c")
      .selectExpr("c.x", "c.y").as[(Double, Double)].head()
    assert(c === ((1.0, 1.0)))
    assert(spark.sql("SELECT graft_wkt_centroid('garbage') AS c").head().isNullAt(0))
  }

  test("graft_lsh_bucket is SQL-callable with literal plane parameters") {
    graft.sources.Tables.table(spark, sf, "embeddings").createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_lsh_bucket(embedding, 6, 1) AS b FROM emb_sql ORDER BY vec_id")
      .as[(Long, Long)].collect().toSeq
    val viaApi = graft.sources.Tables.table(spark, sf, "embeddings")
      .select($"vec_id", graft.operators.Similarity.lshBucket($"embedding", 6, 1).as("b"))
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    assert(viaSql === viaApi)
    // non-literal plane count is a plan-time error, not silent misbehavior
    val err = intercept[Exception] {
      spark.sql("SELECT graft_lsh_bucket(embedding, vec_id::INT, 0) FROM emb_sql").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      err.getCause != null && err.getCause.getMessage.contains("integer literal"))
  }

  test("simhash native expression stays inside whole-stage codegen") {
    // parquet-backed source: a local Seq would be constant-folded away
    val df = graft.sources.Tables.table(spark, sf, "documents")
      .select(Expressions.simhash64($"text").as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen span; the expression must sit inside
    // one, not fall back to interpreted projection
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_simhash64.*"), plan)
    // the plan string is printed BEFORE Janino compiles the generated code;
    // disabling the silent interpreter fallback proves compilation succeeds
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      assert(df.count() === 500)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("native ShingleSet matches the UDF implementation on fixture docs + edge cases") {
    val docs = graft.sources.Tables.table(spark, sf, "documents")
    val both = docs.select(
      Expressions.shingleSet($"text", 3).as("native"),
      Dedup.wordShinglesUdf($"text", lit(3)).as("viaUdf"))
    assert(both.filter(not($"native" <=> $"viaUdf")).count() === 0)
    val edge = Seq("", "   ", "one", "one two", "a  b\tc\nd")
      .toDF("t").select(
        Expressions.shingleSet($"t", 3).as("native"),
        Dedup.wordShinglesUdf($"t", lit(3)).as("viaUdf"))
    assert(edge.filter(not($"native" <=> $"viaUdf")).count() === 0)
    // null text: native null-propagates (SQL convention; the UDF baseline
    // returns [] — both drop the doc at every size(sh) > 0 / jaccard gate)
    assert(Seq(null.asInstanceOf[String]).toDF("t")
      .select(Expressions.shingleSet($"t", 3)).head().isNullAt(0))
  }

  test("native MinHashSig matches the UDF implementation on fixture shingles") {
    val docs = graft.sources.Tables.table(spark, sf, "documents")
      .select(Expressions.shingleSet($"text", 3).as("sh")).filter(size($"sh") > 0)
    val both = docs.select(
      Expressions.minhashSig($"sh", 16).as("native"),
      Dedup.minhashSigUdf($"sh", lit(16)).as("viaUdf"))
    assert(both.filter(not($"native" <=> $"viaUdf")).count() === 0)
  }

  test("native LshBucket is bit-identical to the Column formulation on fixture embeddings") {
    val e = graft.sources.Tables.table(spark, sf, "embeddings")
    val both = e.select(
      graft.operators.Similarity.lshBucket($"embedding", planes = 12, family = 3).as("native"),
      graft.operators.Similarity.lshBucketColumns($"embedding", planes = 12, family = 3).as("viaCols"))
    assert(both.filter($"native" =!= $"viaCols").count() === 0)
    // and it compiles inside whole-stage codegen (no silent interpreter fallback)
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      assert(e.select(graft.operators.Similarity.lshBucket($"embedding", 6, 0)).count() > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("native DotF32: bit-equal to the Column form on fixture vectors; null semantics; codegen-safe") {
    val e = graft.sources.Tables.table(spark, sf, "embeddings")
    // bit-exact against the independent zip_with+aggregate formulation
    // (same left-to-right fp accumulation) — including the self-dot used
    // by Similarity.norm
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter($"a.vec_id" < 6 && $"b.vec_id" < 6)
      .select(
        Expressions.dotF32($"a.embedding", $"b.embedding").as("native"),
        graft.operators.Similarity.dotProductColumns($"a.embedding", $"b.embedding").as("cols"))
    assert(pairs.filter($"native" =!= $"cols").count() === 0)
    assert(pairs.filter($"native".isNull).count() === 0)
    // ragged lengths and null elements → null (mirrors zip_with padding)
    val deg = Seq(
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)),
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .select(Expressions.dotF32($"a", $"b").as("d")).as[Option[Double]].collect().toSeq
    assert(deg === Seq(None, Some(5.0)))
    // compiles inside whole-stage codegen (no silent interpreter fallback)
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      assert(e.select(Expressions.dotF32($"embedding", $"embedding")).count() > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
    // SQL-callable through GraftExtensions
    e.createOrReplaceTempView("emb_dot_sql")
    val viaSql = spark.sql(
      "SELECT max(abs(graft_dot(embedding, embedding))) AS m FROM emb_dot_sql").as[Double].head()
    assert(viaSql > 0)
  }

  test("native DotI32: bit-equal to the Column form; null semantics; codegen-safe") {
    val q = graft.operators.Similarity
      .quantizeInt8(graft.sources.Tables.table(spark, sf, "embeddings"))
      .select($"vec_id", $"quantized".as("q"))
    val pairs = q.as("a").crossJoin(q.as("b"))
      .filter($"a.vec_id" < 6 && $"b.vec_id" < 6)
      .select(Expressions.dotI32($"a.q", $"b.q").as("native"),
        graft.operators.Similarity.intDotColumns($"a.q", $"b.q").as("cols"))
    assert(pairs.filter($"native" =!= $"cols").count() === 0)
    assert(pairs.filter($"native".isNull).count() === 0)
    val self = q.select(Expressions.dotI32($"q", $"q").as("native"),
      graft.operators.Similarity.intNorm2Columns($"q").as("cols"))
    assert(self.filter($"native" =!= $"cols").count() === 0)
    // ragged lengths → null (mirrors zip_with padding)
    val deg = Seq((Seq(1, 2), Seq(1, 2, 3)), (Seq(2, 3), Seq(4, 5)))
      .toDF("a", "b")
      .select(Expressions.dotI32($"a", $"b").as("d")).as[Option[Long]].collect().toSeq
    assert(deg === Seq(None, Some(23L)))
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      assert(q.select(Expressions.dotI32($"q", $"q")).count() > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("native FoldSumField: bit-equal to the aggregate(transform(...)) HOF; empty/null; codegen-safe") {
    // the ordered-fold kernel every oracle-mode sum now runs: must match
    // the interpreted HOF it replaced bit-for-bit on the same sorted input
    val docs = graft.sources.Tables.table(spark, sf, "documents")
    val contrib = docs
      .select($"lang", explode(Expressions.ngrams($"text", 1)).as("t"))
      .select($"lang", $"t", (length($"t").cast("double") * lit(0.1)).as("c"))
    val sorted = array_sort(collect_list(struct($"t", $"c")))
    val both = contrib.groupBy($"lang").agg(
      Expressions.foldSumField(sorted).as("native"),
      aggregate(transform(sorted, x => x.getField("c")),
        lit(0.0), (acc, v) => acc + v).as("viaCols"))
    assert(both.count() > 0)
    assert(both.filter($"native" =!= $"viaCols").count() === 0)
    // empty array → 0.0 (the fold's init); null field poisons to null
    val edge = Seq(
      (Seq.empty[(Long, Option[Double])], 1),
      (Seq((1L, Option(2.0)), (2L, Option.empty[Double])), 2))
      .toDF("arr", "id")
      .select($"id", Expressions.foldSumField($"arr").as("s"))
      .orderBy($"id").as[(Int, Option[Double])].collect().toSeq
    assert(edge === Seq((1, Some(0.0)), (2, None)))
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      assert(contrib.groupBy($"lang")
        .agg(Expressions.foldSumField(sorted).as("s")).count() > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("native LshProbes: base bucket first, one-bit flips ordered by margin, codegen-safe") {
    val e = graft.sources.Tables.table(spark, sf, "embeddings")
    val rows = e.orderBy("vec_id").select(
      graft.operators.Similarity.lshBucket($"embedding", planes = 8, family = 2).as("base"),
      Expressions.lshProbes($"embedding", planes = 8, family = 2, probes = 4).as("ps"))
      .as[(Long, Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (base, ps) =>
      assert(ps.length === 4)
      assert(ps.head === base) // element 0 is always the base bucket
      assert(ps.distinct.length === 4) // flipping distinct bits → distinct buckets
      // every probe differs from base in exactly one of the 8 plane bits
      ps.tail.foreach(p => assert(java.lang.Long.bitCount(p ^ base) === 1, s"$base vs $p"))
    }
    // probes capped at planes + 1 (base + one flip per plane)
    val capped = e.limit(1).select(
      Expressions.lshProbes($"embedding", 4, 0, 99).as("ps")).as[Seq[Long]].head()
    assert(capped.length === 5)
    // compiles inside whole-stage codegen (no silent interpreter fallback)
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      assert(e.select(Expressions.lshProbes($"embedding", 6, 0, 3)).count() > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
    // SQL-callable through GraftExtensions with literal int parameters
    e.createOrReplaceTempView("emb_probe_sql")
    val viaSql = spark.sql(
      "SELECT graft_lsh_probes(embedding, 8, 2, 4)[0] AS b FROM emb_probe_sql ORDER BY vec_id")
      .as[Long].collect().toSeq
    assert(viaSql === rows.map(_._1).toSeq)
  }

  test("barrier is a value-identity fence: equal outputs, nulls preserved, blocks re-nesting") {
    import graft.functions.TextFns
    // a Range source, not a local Seq: ConvertToLocalRelation would fold
    // a LocalRelation projection at plan time and leave nothing to fence
    val df = spark.range(100).select(
      when($"id" % 4 === 0, lit(null).cast("string"))
        .when($"id" % 4 === 1, lit(""))
        .otherwise(concat(lit("the doc text number "), $"id")).as("text"))
    // identity on values and nulls, through codegen
    val plain = df.select(TextFns.scrubPii(Expressions.normalizeText($"text", "NFC")).as("t"))
      .as[Option[String]].collect().toSeq
    val fenced = df.select(Expressions.barrier(
        TextFns.scrubPii(Expressions.normalizeText($"text", "NFC"))).as("t"))
      .as[Option[String]].collect().toSeq
    assert(fenced === plain)
    // the fence holds: a filter above the fenced projection must NOT be
    // pushed below it with the scrub subtree substituted into the
    // predicate — the optimized plan carries exactly ONE scrub call
    val shaped = df
      .withColumn("canon", Expressions.barrier(
        TextFns.scrubPii(Expressions.normalizeText($"text", "NFC"))))
      .filter(TextFns.tokenCount($"canon") >= 1 && length($"canon") > 3)
    val p = shaped.queryExecution.optimizedPlan.toString
    val scrubs = "graft_scrub_pii".r.findAllIn(p).length
    assert(scrubs === 1, s"fence failed — scrub re-nested $scrubs times:\n$p")
  }

  test("native wktCentroid equals the UDF path on polygons with holes") {
    val wkt = "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (0 0, 2 0, 2 2, 0 2, 0 0))"
    val native = Seq(wkt).toDF("w").select(Expressions.wktCentroid($"w").as("c"))
      .selectExpr("c.x", "c.y").as[(Double, Double)].head()
    val viaUdf = Spatial.wktCentroidXY(wkt).get
    assert(native === viaUdf)
  }
}
