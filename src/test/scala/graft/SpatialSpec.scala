package graft

import org.apache.spark.sql.functions._
import graft.functions.Spatial

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  test("UTM↔WGS84 round-trips to sub-mm over the Spanish UTM-30 extent") {
    // grid over zone 30N (Spain's zonification CRS, EPSG:25830-like)
    for (lon <- Seq(-5.9, -3.0, -0.1); lat <- Seq(36.0, 40.4, 43.7)) {
      val (e, n) = Spatial.wgs84ToUtm(lon, lat, zone = 30)
      val (lon2, lat2) = Spatial.utmToWgs84(e, n, zone = 30)
      assert(math.abs(lon2 - lon) < 1e-8 && math.abs(lat2 - lat) < 1e-8,
        s"round-trip drift at ($lon, $lat): ($lon2, $lat2)")
    }
    // southern hemisphere false-northing branch
    val (e, n) = Spatial.wgs84ToUtm(-58.4, -34.6, zone = 21) // Buenos Aires
    val (lon2, lat2) = Spatial.utmToWgs84(e, n, zone = 21, northern = false)
    assert(math.abs(lon2 - -58.4) < 1e-8 && math.abs(lat2 - -34.6) < 1e-8)
  }

  test("UTM zone-30 sanity: Madrid's known coordinates land within meters") {
    // Madrid ≈ (-3.7038, 40.4168) ↔ UTM 30N ≈ (440300 E, 4474300 N); the
    // loose 1 km gate guards gross errors (sign/zone/series mistakes),
    // the round-trip test above pins self-consistency
    val (e, n) = Spatial.wgs84ToUtm(-3.7038, 40.4168, zone = 30)
    assert(math.abs(e - 440300) < 1000 && math.abs(n - 4474300) < 1000, s"($e, $n)")
    // Column form over a zone-dimension DataFrame
    val got = Seq((e, n, 30, true)).toDF("e", "n", "z", "nh")
      .select(Spatial.utmToLonLat($"e", $"n", $"z", $"nh").as("p"))
      .selectExpr("p.lon", "p.lat").as[(Double, Double)].head()
    assert(math.abs(got._1 - -3.7038) < 1e-6 && math.abs(got._2 - 40.4168) < 1e-6)
  }

  test("haversine: Madrid→Barcelona ≈ 505 km (great-circle)") {
    val got = Seq((-3.7038, 40.4168, 2.1734, 41.3851)).toDF("lon1", "lat1", "lon2", "lat2")
      .select(Spatial.haversineMeters($"lon1", $"lat1", $"lon2", $"lat2").as("m"))
      .as[Double].head()
    assert(math.abs(got / 1000.0 - 504.6) < 1.0)
  }

  test("haversine: zero distance for identical points; symmetric") {
    val df = Seq((10.0, 20.0, 10.0, 20.0)).toDF("lon1", "lat1", "lon2", "lat2")
    assert(df.select(Spatial.haversineMeters($"lon1", $"lat1", $"lon2", $"lat2")).as[Double].head() === 0.0)
    val ab = Seq((0.0, 0.0, 1.0, 1.0)).toDF("lon1", "lat1", "lon2", "lat2")
      .select(Spatial.haversineMeters($"lon1", $"lat1", $"lon2", $"lat2")).as[Double].head()
    val ba = Seq((1.0, 1.0, 0.0, 0.0)).toDF("lon1", "lat1", "lon2", "lat2")
      .select(Spatial.haversineMeters($"lon1", $"lat1", $"lon2", $"lat2")).as[Double].head()
    assert(ab === ba)
  }

  test("haversine bounds: in [0, πR] and symmetric over generated coordinates") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val coord = for {
      lon <- Gen.choose(-180.0, 180.0); lat <- Gen.choose(-90.0, 90.0)
    } yield (lon, lat)
    val pairs = (0 until 40).map(i =>
      (coord.apply(Gen.Parameters.default, Seed(i)).get,
        coord.apply(Gen.Parameters.default, Seed(1000 + i)).get))
    val df = pairs.map { case ((lo1, la1), (lo2, la2)) => (lo1, la1, lo2, la2) }
      .toDF("lon1", "lat1", "lon2", "lat2")
    val fwd = df.select(Spatial.haversineMeters($"lon1", $"lat1", $"lon2", $"lat2")).as[Double].collect()
    val bwd = df.select(Spatial.haversineMeters($"lon2", $"lat2", $"lon1", $"lat1")).as[Double].collect()
    val maxD = math.Pi * Spatial.EarthRadiusM
    fwd.zip(bwd).foreach { case (a, b) =>
      assert(a >= 0.0 && a <= maxD + 1e-6)
      assert(math.abs(a - b) < 1e-6)
    }
  }

  test("wktCentroid: unit square centroid is its center") {
    val got = Spatial.wktCentroidXY("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))").get
    assert(math.abs(got._1 - 1.0) < 1e-12 && math.abs(got._2 - 1.0) < 1e-12)
  }

  test("wktCentroid: L-shape is area-weighted, not vertex mean") {
    // L-shape: 2x1 rect + 1x1 rect → area 3, centroid x = (2*1 + 0.5*1)/3? compute:
    // rect A (0..2)x(0..1) area 2 centroid (1, .5); rect B (0..1)x(1..2) area 1 centroid (.5, 1.5)
    // → ((2*1 + 1*0.5)/3, (2*0.5 + 1*1.5)/3) = (0.8333.., 0.8333..)
    val wkt = "POLYGON((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0))"
    val got = Spatial.wktCentroidXY(wkt).get
    assert(math.abs(got._1 - 5.0 / 6) < 1e-9 && math.abs(got._2 - 5.0 / 6) < 1e-9)
  }

  test("wktCentroid: polygon with hole subtracts the hole") {
    // 4x4 square centered (2,2) minus 2x2 hole centered (1,1):
    // centroid = (16*(2,2) - 4*(1,1)) / 12 = (28/12, 28/12)
    val wkt = "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (0 0, 2 0, 2 2, 0 2, 0 0))"
    val got = Spatial.wktCentroidXY(wkt).get
    assert(math.abs(got._1 - 28.0 / 12) < 1e-9 && math.abs(got._2 - 28.0 / 12) < 1e-9)
  }

  test("wktCentroid: multipolygon is area-weighted across parts") {
    // unit square at origin (area 1, centroid .5,.5) + unit square at (10,0)
    // → centroid (5.5, 0.5)
    val wkt = "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 1, 0 0)), ((10 0, 11 0, 11 1, 10 1, 10 0)))"
    val got = Spatial.wktCentroidXY(wkt).get
    assert(math.abs(got._1 - 5.5) < 1e-9 && math.abs(got._2 - 0.5) < 1e-9)
  }

  test("wktCentroid: null / garbage / POINT handling") {
    assert(Spatial.wktCentroidXY(null).isEmpty)
    assert(Spatial.wktCentroidXY("not wkt").isEmpty)
    assert(Spatial.wktCentroidXY("POINT(3 4)").contains((3.0, 4.0)))
  }

  test("makeValid: closes unclosed rings — and the closure changes the centroid") {
    // Right triangle listed WITHOUT the closing edge: the shoelace loop
    // misses the (1 5)→(1 1) cross term (-4 here — off-origin on purpose;
    // rings through the origin close with a zero term), so the raw centroid
    // is WRONG (not null). make_valid closes the ring; repaired centroid is
    // the exact vertex mean (7/3, 7/3).
    val open = "POLYGON((1 1, 5 1, 1 5))"
    val fixed = Spatial.makeValidWkt(open).get
    assert(fixed === "POLYGON ((1 1, 5 1, 1 5, 1 1))")
    val c = Spatial.wktCentroidXY(fixed).get
    assert(math.abs(c._1 - 7.0 / 3) < 1e-12 && math.abs(c._2 - 7.0 / 3) < 1e-12)
    assert(Spatial.wktCentroidXY(open).get !== c, "unclosed ring must differ — that's the bug repair exists for")
  }

  test("makeValid: identity on valid input, idempotent on repaired input") {
    val valid = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    assert(Spatial.makeValidWkt(valid).contains(valid))
    val repaired = Spatial.makeValidWkt("POLYGON((0 0, 0 0, 2 0, 2 2, 0 2))").get
    assert(Spatial.makeValidWkt(repaired).contains(repaired))
  }

  test("makeValid: drops degenerate rings; degenerate shell drops its polygon") {
    // zero-area sliver shell → polygon gone → None
    assert(Spatial.makeValidWkt("POLYGON((0 0, 4 0, 0 0))").isEmpty)
    // valid shell, degenerate hole → hole dropped, shell kept
    val got = Spatial.makeValidWkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 2, 1 1))").get
    assert(got === "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    // multipolygon: dead first part removed, survivor demoted to POLYGON
    val multi = "MULTIPOLYGON(((0 0, 1 1, 0 0)), ((10 0, 11 0, 11 1, 10 1, 10 0)))"
    assert(Spatial.makeValidWkt(multi).get === "POLYGON ((10 0, 11 0, 11 1, 10 1, 10 0))")
  }

  test("makeValid: null/garbage → None; POINT passes through; Column form null-safe") {
    assert(Spatial.makeValidWkt(null).isEmpty)
    assert(Spatial.makeValidWkt("not wkt").isEmpty)
    assert(Spatial.makeValidWkt("POINT(3 4)").contains("POINT(3 4)"))
    val got = Seq(("POLYGON((0 0, 4 0, 0 4))", 1), (null, 2), ("garbage", 3))
      .toDF("wkt", "id").select(Spatial.makeValid($"wkt").as("w"))
      .as[Option[String]].collect().toSeq
    assert(got === Seq(Some("POLYGON ((0 0, 4 0, 0 4, 0 0))"), None, None))
  }

  test("makeValid feeding Silver.zones: repaired zone survives with the exact centroid") {
    import graft.pipeline.Silver
    // One valid zone, one unclosed-ring zone, one garbage zone. Without
    // repair the unclosed zone passes the null-centroid gate WITH A WRONG
    // CENTROID; with ingest-side repair (the reference's make_valid point)
    // it lands on the correct one. Garbage stays dropped either way.
    val bronze = Seq(
      ("A", "Zona A", "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))"),
      ("B", "Zona B", "POLYGON((10 10, 14 10, 10 14))"),
      ("C", "Zona C", "None")).toDF("ID", "Nombre", "geometry")
    val repaired = bronze.withColumn("geometry", Spatial.makeValid($"geometry"))
    val rows = Silver.zones(Map("distrito" -> repaired))
      .select($"id", $"centroid_longitude", $"centroid_latitude")
      .as[(String, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq("A", "B"))
    val b = rows(1)
    assert(math.abs(b._2 - (10 + 4.0 / 3)) < 1e-9 && math.abs(b._3 - (10 + 4.0 / 3)) < 1e-9)
  }

  test("makeValid properties: identity on generated simple polygons, unclosed-repair, idempotence") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // star-shaped simple polygons: random integer points around a center,
    // sorted by angle — always valid, always closed by construction
    val ptGen = for {
      r <- Gen.choose(2, 40); a <- Gen.choose(0, 359)
    } yield (r, a)
    def polygon(seed: Long): Seq[(Long, Long)] = {
      val pts = (0 until 8).map(i =>
        ptGen.apply(Gen.Parameters.default, Seed(seed * 100 + i)).get)
      val dedup = pts.map { case (r, a) =>
        val rad = math.toRadians(a.toDouble)
        (math.round(r * math.cos(rad)), math.round(r * math.sin(rad)))
      }.distinct
      // sort by angle → star-shaped; need ≥3 distinct non-collinear points
      dedup.sortBy { case (x, y) => math.atan2(y.toDouble, x.toDouble) }
    }
    for (seed <- 0L until 30L) {
      val ring = polygon(seed)
      val closed = ring :+ ring.head
      val wkt = closed.map { case (x, y) => s"$x $y" }.mkString("POLYGON ((", ", ", "))")
      Spatial.makeValidWkt(wkt) match {
        case None => // fully degenerate (collinear/zero-area) draw — legal outcome
        case Some(fixed) =>
          assert(fixed === wkt, s"valid polygon not identity at seed $seed")
          // removing the closing vertex must repair back to the same WKT
          val open = ring.map { case (x, y) => s"$x $y" }.mkString("POLYGON ((", ", ", "))")
          assert(Spatial.makeValidWkt(open).contains(wkt), s"unclosed repair failed at seed $seed")
          // idempotence
          assert(Spatial.makeValidWkt(fixed).contains(fixed), s"not idempotent at seed $seed")
          // the repaired polygon must centroid cleanly
          assert(Spatial.wktCentroidXY(fixed).isDefined)
      }
    }
  }

  test("wktCentroid works as a column over a DataFrame") {
    val got = Seq("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))").toDF("wkt")
      .select(Spatial.wktCentroid($"wkt").as("c"))
      .selectExpr("c.x", "c.y").as[(Double, Double)].head()
    assert(got === ((1.0, 1.0)))
  }
}
