package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int,
                    oracleMode: Boolean = false): Map[String, Double] =
    PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", iters,
        oracleMode = oracleMode)
      .as[(String, Double)].collect().toMap

  test("symmetric ring: uniform ranks, mass conserved") {
    val ring = Seq("a" -> "b", "b" -> "c", "c" -> "a",
      "b" -> "a", "c" -> "b", "a" -> "c")
    val r = ranks(ring, iters = 5)
    assert(r.values.forall(v => math.abs(v - 1.0 / 3) < 1e-6))
    assert(math.abs(r.values.sum - 1.0) < 1e-5)
  }

  test("star graph: the hub outranks the spokes") {
    // spokes point at the hub; hub points back (no dangling nodes)
    val star = Seq("s1" -> "h", "s2" -> "h", "s3" -> "h",
      "h" -> "s1", "h" -> "s2", "h" -> "s3")
    val r = ranks(star, iters = 10)
    assert(r("h") > r("s1") * 2)
    assert(math.abs(r.values.sum - 1.0) < 1e-5)
  }

  test("dangling sink keeps total mass at 1") {
    // 'sink' has no out-edges: its rank must redistribute, not vanish
    val g = Seq("a" -> "sink", "b" -> "sink", "a" -> "b", "b" -> "a")
    val r = ranks(g, iters = 5)
    assert(math.abs(r.values.sum - 1.0) < 1e-5)
    assert(r("sink") > r("a"))
  }

  test("oracle mode and production mode agree to float noise") {
    val g = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c", "c" -> "b")
    val fast = ranks(g, iters = 3)
    val exact = ranks(g, iters = 3, oracleMode = true)
    exact.foreach { case (k, v) => assert(math.abs(fast(k) - v) < 1e-9) }
  }
}
