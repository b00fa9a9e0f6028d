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
}
