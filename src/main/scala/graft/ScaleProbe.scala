package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** ANN headroom probe (not part of the driver contract; feeds docs/SCALE.md):
  * deterministic synthetic embeddings at a configurable corpus size, timing
  * the exact baseline vs sign-LSH vs IVF top-k. The fixture embeddings cap
  * out at 2 000 vectors, where brute force wins on fixed overhead alone —
  * this probe shows the crossover where the bucketed paths take over, i.e.
  * the regime the 100 TB design targets.
  *
  * Usage: sbt "runMain graft.ScaleProbe [corpusSize] [dim]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = GraftSession.get()
    // deterministic pseudo-random vectors in [-1, 1] (hash-derived; no RNG)
    val corpus = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => (pmod(xxhash64(col("id"), j), lit(2000001L)).cast("double") / 1000000.0 - 1.0)
          .cast("float")).as("embedding"))
      .persist()
    corpus.count() // materialize once: all paths then read identical input
    val queries = corpus.filter(col("vec_id") < 20)
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = df.count()
      println(f"""{"probe":"$name","n":$n,"dim":$dim,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$rows}""")
    }
    time("brute_force")(Similarity.bruteForceTopK(corpus, queries, k = 5))
    time("lsh_12x2")(Similarity.lshTopK(corpus, queries, k = 5, planes = 12, tables = 2))
    time("ivf_64_probe8")(Similarity.ivfTopK(corpus, queries, k = 5, nlist = 64, nProbe = 8, lloydIters = 1))
    time("ivf_64_probe8_sampled")(Similarity.ivfTopK(corpus, queries, k = 5,
      nlist = 64, nProbe = 8, lloydIters = 1, trainFraction = 0.1))
    spark.stop()
  }
}
