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

  test("personalized: unreachable nodes score 0, teleport favors the seed side") {
    // path seed ↔ a ↔ b, plus an isolated pair x ↔ y unreachable from seed
    val g = Seq("seed" -> "a", "a" -> "seed", "a" -> "b", "b" -> "a",
      "x" -> "y", "y" -> "x")
    val seeds = Seq("seed").toDF("node")
    val r = PageRank.personalizedPageRank(g.toDF("src", "dst"), seeds,
        "src", "dst", "node", iters = 12)
      .as[(String, Double)].collect().toMap
    assert(r("x") === 0.0 && r("y") === 0.0)
    // seed and b receive identical link inflow (half of a's rank each);
    // the teleport is exactly the seed's surplus
    assert(r("seed") > r("b"))
    // mass conservation on the reachable component
    assert(math.abs(r("seed") + r("a") + r("b") - 1.0) < 1e-5)
  }

  test("personalized requires a seed present in the graph") {
    val g = Seq("a" -> "b").toDF("src", "dst")
    intercept[IllegalArgumentException] {
      PageRank.personalizedPageRank(g, Seq("zz").toDF("node"),
        "src", "dst", "node", iters = 2).count()
    }
  }

  test("oracle mode and production mode agree to float noise") {
    val g = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c", "c" -> "b")
    val fast = ranks(g, iters = 3)
    val exact = ranks(g, iters = 3, oracleMode = true)
    exact.foreach { case (k, v) => assert(math.abs(fast(k) - v) < 1e-9) }
  }

  test("reliable-checkpoint mode: identical ranks, durable per-iteration snapshots") {
    // cluster-scale option: localCheckpoint blocks die unrecoverably with
    // an executor — checkpointDir round-trips the rank frame through
    // durable storage instead. Doubles round-trip parquet bit-exactly, so
    // the two modes must agree EXACTLY (not to tolerance); oracle mode on
    // both sides makes the comparison deterministic.
    val dir = java.nio.file.Files.createTempDirectory("graft_pr_ckpt").toString
    val g = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c",
      "c" -> "b", "b" -> "sink")
    val local = PageRank.pageRank(g.toDF("src", "dst"), "src", "dst",
        iters = 4, oracleMode = true)
      .as[(String, Double)].collect().toMap
    val durable = PageRank.pageRank(g.toDF("src", "dst"), "src", "dst",
        iters = 4, oracleMode = true, checkpointDir = Some(dir))
      .as[(String, Double)].collect().toMap
    assert(durable === local)
    // the ping-pong slots landed on storage under a per-call subdir
    // (bounded: two node-sized snapshots per call)
    val calls = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(calls.size === 1 && calls.head.startsWith("call_"), calls.toString)
    val slots = new java.io.File(s"$dir/${calls.head}").listFiles()
      .map(_.getName).toSet
    assert(slots === Set("rank_0", "rank_1"))
    // a SECOND call sharing the dir must not clobber the first call's
    // final slot while its (lazy) result frame is still unconsumed
    val first = PageRank.pageRank(g.toDF("src", "dst"), "src", "dst",
      iters = 4, oracleMode = true, checkpointDir = Some(dir))
    val second = PageRank.pageRank(g.toDF("src", "dst"), "src", "dst",
        iters = 3, oracleMode = true, checkpointDir = Some(dir))
      .as[(String, Double)].collect().toMap
    assert(first.as[(String, Double)].collect().toMap === local,
      "second durable call clobbered the first call's unconsumed result")
    assert(second !== local) // different iters really ran
    // personalized variant threads the option too
    val seeds = Seq("a").toDF("node")
    val pl = PageRank.personalizedPageRank(g.toDF("src", "dst"), seeds,
        "src", "dst", "node", iters = 3, oracleMode = true)
      .as[(String, Double)].collect().toMap
    val pd = PageRank.personalizedPageRank(g.toDF("src", "dst"), seeds,
        "src", "dst", "node", iters = 3, oracleMode = true,
        checkpointDir = Some(dir + "/ppr"))
      .as[(String, Double)].collect().toMap
    assert(pd === pl)
  }
}
