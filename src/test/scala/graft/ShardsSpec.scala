package graft

import graft.operators.Shards

class ShardsSpec extends SparkSpec {
  import spark.implicits._

  test("writeShards: shard-partitioned layout on disk; written manifest ≡ input manifest") {
    val d = (1L to 200L).map(i => (i, s"doc number $i body tokens")).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val w = graft.functions.TextFns.tokenCount($"text")
    val written = Shards.writeShards(d, "id", w, 8, dir, seed = "t")
      .as[(Long, Long, Long, Long)].collect().toSet
    val direct = Shards.manifest(d, "id", w, 8, seed = "t")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(written === direct) // manifest is recomputed from disk, not echoed
    assert(written.map(_._1).subsetOf((0L until 8L).toSet) && written.nonEmpty)
    assert(written.toSeq.map(_._2).sum === 200L) // every row landed exactly once
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(written.map(r => s"shard=${r._1}") === dirs.filter(_.startsWith("shard=")))
  }

  test("writeJsonlShards: JSONL layout round-trips; manifest ≡ parquet twin ≡ input") {
    val d = (1L to 120L).map(i => (i, s"doc $i with \"quotes\" and ünïcode"))
      .toDF("id", "text")
    val w = graft.functions.TextFns.tokenCount($"text")
    val jdir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val jm = Shards.writeJsonlShards(d, "id", w, 4, jdir, seed = "t")
      .as[(Long, Long, Long, Long)].collect().toSet
    val direct = Shards.manifest(d, "id", w, 4, seed = "t")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(jm === direct, "JSONL round-trip lost or mutated rows")
    // the layout is text files under shard=K dirs, one JSON object per line
    val shardDirs = new java.io.File(jdir).listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    val aLine = shardDirs.head.listFiles().filter(_.getName.endsWith(".txt"))
      .headOption.map(f => scala.io.Source.fromFile(f, "UTF-8").getLines().next())
    assert(aLine.exists(l => l.startsWith("{") && l.contains("\"id\":")),
      s"not JSONL: $aLine")
  }

  test("manifest fingerprint flips when a row moves or is dropped") {
    val d = (1L to 50L).map(i => (i, 1L)).toDF("id", "w")
    val base = Shards.manifest(d, "id", $"w", 4, seed = "t")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    val dropped = Shards.manifest(d.filter($"id" =!= 7L), "id", $"w", 4, seed = "t")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    // exactly the shard that held id=7 changes fp; all others identical
    val diff = base.keySet.filter(k => base.get(k) != dropped.get(k))
    assert(diff.size === 1)
  }
}
