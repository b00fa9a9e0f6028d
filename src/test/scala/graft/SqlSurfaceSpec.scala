package graft

import graft.sources.Tables

/** The reference's third entry point is ad-hoc SQL over the registered
  * tables (SURVEY §3.3, queries.ipynb). Parity: every fixture table is a
  * temp view and raw Spark SQL — including graft's registered functions —
  * answers over them.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("raw SQL over registered fixture views") {
    Tables.registerAll(spark, sf)
    val top = spark.sql(
      """SELECT n.n_name, count(*) AS n_orders
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n_orders DESC, n_name LIMIT 3""".stripMargin)
      .as[(String, Long)].collect()
    assert(top.length === 3 && top.head._2 >= top.last._2)
  }

  test("graft functions compose with SQL over views") {
    Tables.registerAll(spark, sf)
    val dup = spark.sql(
      """SELECT count(DISTINCT graft_simhash64(text)) AS n_distinct, count(*) AS n
        |FROM documents""".stripMargin).as[(Long, Long)].head()
    assert(dup._1 > 0 && dup._1 <= dup._2)
  }

  test("duplicate-span detection is expressible in plain SQL via graft_window_hashes") {
    Tables.registerAll(spark, sf)
    // the full Dedup.duplicateSpans shape — map pass, per-doc occurrence
    // count, distinct-doc filter, hash equi-join — as ad-hoc SQL; results
    // must agree with the operator row-for-row
    val sqlSpans = spark.sql(
      """WITH wins AS (
        |  SELECT doc_id, t.p + 1 AS pos, t.h
        |  FROM documents
        |  LATERAL VIEW posexplode(graft_window_hashes(text, 8)) t AS p, h
        |  WHERE text IS NOT NULL),
        | dups AS (
        |  SELECT h, count(*) AS n_docs, sum(occ) AS n_occ FROM (
        |    SELECT h, doc_id, count(*) AS occ FROM wins GROUP BY h, doc_id)
        |  GROUP BY h HAVING count(*) >= 2)
        |SELECT w.doc_id, CAST(w.pos AS BIGINT) AS pos, d.n_docs, d.n_occ
        |FROM wins w JOIN dups d USING (h)""".stripMargin)
    val op = graft.operators.Dedup.duplicateSpans(
      Tables.table(spark, sf, "documents"), "doc_id", "text", w = 8)
    assert(sqlSpans.exceptAll(op).isEmpty && op.exceptAll(sqlSpans).isEmpty,
      "SQL-surface span detection diverged from the operator")
    // BM25 needs no dedicated function: every building block (tokenize via
    // graft_ngrams(text, 1), the count aggregates, the term equi-join, ln)
    // is standard SQL — pinned by the qt28 DuckDB oracle's pure-SQL twin
    val terms = spark.sql(
      "SELECT count(*) AS n FROM (SELECT explode(graft_ngrams(text, 1)) FROM documents)")
      .as[Long].head()
    assert(terms > 0)
  }

  test("composed TextFns are SQL-callable and identical to the Column API") {
    Tables.registerAll(spark, sf)
    import org.apache.spark.sql.functions.col
    val fns = graft.functions.TextFns
    // SQL and Column sides share one definition via the extension factory;
    // this pins the wiring (arg threading, null handling) row-for-row
    val sql = spark.sql(
      """SELECT doc_id, graft_token_count(text) AS tc, graft_subword_count(text) AS sw,
        |  graft_quality_score(text) AS q, graft_lang_id(text) AS lang,
        |  graft_scrub_pii(text) AS scrubbed, graft_fingerprint(text) AS fp,
        |  graft_fingerprint64(text) AS fp64
        |FROM documents""".stripMargin)
    val api = Tables.table(spark, sf, "documents").select(col("doc_id"),
      fns.tokenCount(col("text")).as("tc"), fns.subwordCount(col("text")).as("sw"),
      fns.qualityScore(col("text")).as("q"), fns.LangId.langId(col("text")).as("lang"),
      fns.scrubPii(col("text")).as("scrubbed"), fns.fingerprint(col("text")).as("fp"),
      fns.fingerprint64(col("text")).as("fp64"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty,
      "SQL-registered composed functions diverged from the Column API")
    // null threading: composed functions must not throw on null text
    val n = spark.sql("SELECT graft_quality_score(NULL) AS q, graft_token_count(NULL) AS t")
      .collect()(0)
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("graft_minhash_sig is SQL-callable and identical to the expression API") {
    Tables.registerAll(spark, sf)
    import org.apache.spark.sql.functions.col
    val E = graft.functions.Expressions
    val sql = spark.sql(
      """SELECT doc_id, graft_minhash_sig(graft_shingle_set(text, 3), 16) AS sig
        |FROM documents""".stripMargin)
    val api = Tables.table(spark, sf, "documents").select(col("doc_id"),
      E.minhashSig(E.shingleSet(col("text"), 3), 16).as("sig"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty,
      "SQL-registered graft_minhash_sig diverged from the expression API")
  }

  test("script profiling is SQL-callable and identical to the Column API") {
    Tables.registerAll(spark, sf)
    import org.apache.spark.sql.functions.col
    val fns = graft.functions.TextFns
    val sql = spark.sql(
      """SELECT doc_id, graft_char_count(text) AS nc,
        |  graft_script_count(text, 'Latin') AS lat,
        |  graft_script_count(text, 'Cyrillic') AS cyr
        |FROM documents""".stripMargin)
    val api = Tables.table(spark, sf, "documents").select(col("doc_id"),
      fns.charCount(col("text")).as("nc"),
      fns.scriptCount(col("text"), "Latin").as("lat"),
      fns.scriptCount(col("text"), "Cyrillic").as("cyr"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty,
      "graft_script_count/char_count diverged from the Column API")
    // script must be a literal — a column reference is a plan-time error
    val err = intercept[Exception](
      spark.sql("SELECT graft_script_count(text, text) FROM documents").collect())
    assert(err.getMessage.contains("string literal"))
  }

  test("graft_deflate_len is SQL-callable and identical to the expression API") {
    Tables.registerAll(spark, sf)
    import org.apache.spark.sql.functions.col
    val sql = spark.sql(
      "SELECT doc_id, graft_deflate_len(text, 6) AS dl FROM documents")
    val api = Tables.table(spark, sf, "documents").select(col("doc_id"),
      graft.functions.Expressions.deflateLen(col("text"), 6).as("dl"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty,
      "graft_deflate_len diverged from the expression API")
    val err = intercept[Exception](
      spark.sql("SELECT graft_deflate_len(text, doc_id) FROM documents").collect())
    assert(err.getMessage.contains("integer literal"))
  }
}
