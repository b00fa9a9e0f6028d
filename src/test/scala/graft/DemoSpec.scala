package graft

import java.nio.file.Files
import graft.pipeline.Demo

class DemoSpec extends SparkSpec {
  import spark.implicits._

  test("file-based reference pipeline runs end-to-end with idempotent bronze loads") {
    val counts = Demo.run(spark, Files.createTempDirectory("graft_demo_test"))
    // OD rows per level per day: n*(n-1)*2; two days; the overlapping
    // re-load of day 1 must NOT duplicate (all-columns MERGE semantics)
    assert(counts("silver_od") === (3 * 2 * 2 + 2 * 1 * 2 + 2 * 1 * 2) * 2)
    assert(counts("silver_zones") === 7)
    assert(counts("silver_distances") === 3 * 2 + 2 * 1 + 2 * 1)
    assert(counts("bronze_spanish_holidays") === 1)
    assert(counts("silver_business") === 1 && counts("silver_population") === 1 &&
      counts("silver_income") === 1)
    // enrichment sanity over the registered views
    val hol = spark.sql(
      "SELECT count(*) FROM silver_od WHERE is_holiday AND date(datetime) = DATE '2022-03-06'")
      .as[Long].head()
    assert(hol > 0)
  }
}
