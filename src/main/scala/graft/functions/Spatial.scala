package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spatial functions (SURVEY §2.9, the only reference surface with no Spark
  * built-in): great-circle distance and WKT polygon centroid, matching
  * DuckDB spatial's ST_Distance_Sphere / ST_Centroid
  * (/root/reference/airflow/dags/silver/distances.py:32,
  *  silver/mitma/mitma_zonification.py:41-44).
  */
object Spatial {

  /** Mean Earth radius used by PostGIS/DuckDB ST_Distance_Sphere. */
  val EarthRadiusM = 6371008.8

  /** G4: haversine great-circle distance in meters, as a pure Column
    * expression (sin/cos/atan2 compose into whole-stage codegen — no UDF,
    * no codegen break in the hot path of the O(n²) distance matrix).
    */
  def haversineMeters(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val dLat = radians(lat2) - radians(lat1)
    val dLon = radians(lon2) - radians(lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusM) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }

  // --- WKT centroid (G1–G3) ------------------------------------------------
  // The reference only ever consumes ST_X/ST_Y(ST_Centroid(geom)), so we
  // parse WKT → area-weighted centroid directly; no geometry type needed.

  /** Area-weighted centroid of a WKT POLYGON/MULTIPOLYGON (shoelace formula,
    * holes subtracted — matches ST_Centroid semantics for planar coords).
    * POINT and LINESTRING degenerate cases fall back to vertex mean.
    * Returns null on null/unparseable input (null-in → null-out).
    */
  def wktCentroidXY(wkt: String): Option[(Double, Double)] = {
    if (wkt == null) return None
    val s = wkt.trim.toUpperCase
    try {
      if (s.startsWith("POINT")) {
        val c = parseCoords(inner(s)).head
        Some(c)
      } else if (s.startsWith("LINESTRING")) {
        val cs = parseCoords(inner(s))
        Some((cs.map(_._1).sum / cs.size, cs.map(_._2).sum / cs.size))
      } else if (s.startsWith("POLYGON") || s.startsWith("MULTIPOLYGON")) {
        // Collect rings: for each polygon, first ring positive (shell),
        // subsequent rings are holes → signed by ring orientation handled
        // via the shoelace sign convention (shells CCW+, holes CW-). We
        // instead force shell positive / holes negative explicitly.
        val polys = splitPolygons(s)
        var aSum = 0.0; var cxSum = 0.0; var cySum = 0.0
        polys.foreach { rings =>
          rings.zipWithIndex.foreach { case (ring, i) =>
            val cs = parseCoords(ring)
            var a = 0.0; var cx = 0.0; var cy = 0.0
            var j = 0
            while (j < cs.length - 1) {
              val (x1, y1) = cs(j); val (x2, y2) = cs(j + 1)
              val cross = x1 * y2 - x2 * y1
              a += cross; cx += (x1 + x2) * cross; cy += (y1 + y2) * cross
              j += 1
            }
            a /= 2.0; // signed ring area
            val sign = if (i == 0) 1.0 else -1.0 // shell adds, holes subtract
            val aa = math.abs(a) * sign
            if (a != 0.0) {
              // centroid contribution uses the ring's own signed area
              cxSum += sign * math.signum(a) * cx / 6.0
              cySum += sign * math.signum(a) * cy / 6.0
              aSum += aa
            }
          }
        }
        if (aSum == 0.0) {
          val cs = polys.flatMap(_.headOption).flatMap(parseCoords)
          if (cs.isEmpty) None
          else Some((cs.map(_._1).sum / cs.size, cs.map(_._2).sum / cs.size))
        } else Some((cxSum / aSum, cySum / aSum))
      } else None
    } catch { case _: Exception => None }
  }

  /** Text between the outermost parens. */
  private def inner(s: String): String =
    s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))

  /** "x1 y1, x2 y2, ..." → coord pairs. */
  private def parseCoords(ring: String): Array[(Double, Double)] =
    ring.replaceAll("[()]", "").split(",").map { p =>
      val xy = p.trim.split("\\s+")
      (xy(0).toDouble, xy(1).toDouble)
    }

  /** MULTIPOLYGON(((...),(...)),((...))) / POLYGON((...),(...)) →
    * list of polygons, each a list of ring strings.
    */
  private def splitPolygons(s: String): Seq[Seq[String]] = {
    val body = inner(s)
    if (s.startsWith("POLYGON")) Seq(splitTopLevel(body))
    else splitTopLevel(body).map(p => splitTopLevel(p.trim.stripPrefix("(").stripSuffix(")")))
  }

  /** Split on commas at paren depth 0. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  /** Column form: wkt → struct<x, y> via the native Catalyst expression
    * (Expressions.WktCentroid; CodegenFallback — dimension-side data).
    */
  def wktCentroid(wkt: Column): Column = Expressions.wktCentroid(wkt)

  // --- make_valid (G5's other half) ----------------------------------------
  // The reference repairs invalid geometries with geopandas make_valid
  // before stringifying (/root/reference/airflow/dags/bronze/utils.py:
  // 589-591). Scope here is the structural invalidity a shapefile/WKT
  // round-trip actually produces — and the one that silently corrupts the
  // centroid: an UNCLOSED ring makes the shoelace sum skip the closing-edge
  // term (wrong area, wrong centroid — not a null). Full GEOS make_valid
  // (self-intersection node-and-split) is out of scope and documented so:
  // the zoning data has no bowties, and wktCentroid's signed-area integral
  // is well-defined on them regardless.

  /** Minimal WKT polygon repair, idempotent and identity on valid input:
    *  - consecutive duplicate vertices collapsed;
    *  - unclosed rings closed (first vertex appended);
    *  - degenerate rings dropped (< 4 points once closed, or zero area);
    *  - a dropped SHELL drops its polygon (holes can't outlive it);
    *  - nothing left → None. POINT/LINESTRING pass through; null or
    *    unparseable input → None (matching wktCentroid's null-out).
    */
  def makeValidWkt(wkt: String): Option[String] = {
    if (wkt == null) return None
    val s = wkt.trim.toUpperCase
    try {
      if (s.startsWith("POINT") || s.startsWith("LINESTRING")) {
        parseCoords(inner(s)) // validates coordinates parse
        Some(wkt.trim)
      } else if (s.startsWith("POLYGON") || s.startsWith("MULTIPOLYGON")) {
        val polys = splitPolygons(s).flatMap { rings =>
          val repaired = rings.map(r => repairRing(parseCoords(r)))
          repaired.headOption.flatten match {
            case None => None // shell degenerate → polygon gone
            case Some(shell) => Some(shell +: repaired.tail.flatten)
          }
        }
        if (polys.isEmpty) None
        else if (polys.sizeIs == 1) Some(s"POLYGON ${polyStr(polys.head)}")
        else Some(s"MULTIPOLYGON ${polys.map(polyStr).mkString("(", ", ", ")")}")
      } else None
    } catch { case _: Exception => None }
  }

  /** Collapse consecutive duplicates, close, reject degenerates. */
  private def repairRing(coords: Array[(Double, Double)]): Option[Array[(Double, Double)]] = {
    if (coords.isEmpty) return None
    val dedup = coords.foldLeft(Vector.empty[(Double, Double)]) {
      case (acc, c) if acc.lastOption.contains(c) => acc
      case (acc, c) => acc :+ c
    }
    val closed = if (dedup.head == dedup.last) dedup else dedup :+ dedup.head
    if (closed.length < 4) return None
    var area = 0.0
    var j = 0
    while (j < closed.length - 1) {
      val (x1, y1) = closed(j); val (x2, y2) = closed(j + 1)
      area += x1 * y2 - x2 * y1
      j += 1
    }
    if (area == 0.0) None else Some(closed.toArray)
  }

  private def fmtCoord(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  private def ringStr(r: Array[(Double, Double)]): String =
    r.map { case (x, y) => s"${fmtCoord(x)} ${fmtCoord(y)}" }.mkString("(", ", ", ")")

  private def polyStr(p: Seq[Array[(Double, Double)]]): String =
    p.map(ringStr).mkString("(", ", ", ")")

  private val makeValidUdf = org.apache.spark.sql.functions.udf(
    (wkt: String) => makeValidWkt(wkt).orNull)

  /** Column form. UDF on purpose: geometry repair runs once at ingest on
    * dimension-sized zone tables (like utmToLonLat), never on the fact side.
    */
  def makeValid(wkt: Column): Column = makeValidUdf(wkt)

  // --- UTM ↔ WGS84 (G5's to_crs(4326), the reference's zone reprojection:
  // Spanish zonification ships in ETRS89/UTM — bronze/utils.py:589-591) ----
  // Transverse Mercator series per Snyder, "Map Projections — A Working
  // Manual" (USGS PP 1395, public), WGS84/GRS80 ellipsoid, k0=0.9996.
  // Sub-mm self-consistency (round-trip property-tested); geometry validity
  // repair is makeValidWkt above, applied at the same ingest point.

  private val A = 6378137.0 // WGS84 semi-major
  private val F = 1.0 / 298.257223563
  private val E2 = F * (2 - F)
  private val Ep2 = E2 / (1 - E2)
  private val K0 = 0.9996

  private def centralMeridian(zone: Int): Double = math.toRadians(zone * 6.0 - 183.0)

  /** (lonDeg, latDeg) → (easting, northing) in the given UTM zone. */
  def wgs84ToUtm(lonDeg: Double, latDeg: Double, zone: Int): (Double, Double) = {
    val lat = math.toRadians(latDeg); val lon = math.toRadians(lonDeg)
    val n = A / math.sqrt(1 - E2 * math.pow(math.sin(lat), 2))
    val t = math.pow(math.tan(lat), 2)
    val c = Ep2 * math.pow(math.cos(lat), 2)
    val a = (lon - centralMeridian(zone)) * math.cos(lat)
    val m = A * ((1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * math.pow(E2, 3) / 256) * lat
      - (3 * E2 / 8 + 3 * E2 * E2 / 32 + 45 * math.pow(E2, 3) / 1024) * math.sin(2 * lat)
      + (15 * E2 * E2 / 256 + 45 * math.pow(E2, 3) / 1024) * math.sin(4 * lat)
      - (35 * math.pow(E2, 3) / 3072) * math.sin(6 * lat))
    val easting = K0 * n * (a + (1 - t + c) * math.pow(a, 3) / 6
      + (5 - 18 * t + t * t + 72 * c - 58 * Ep2) * math.pow(a, 5) / 120) + 500000.0
    val northing = K0 * (m + n * math.tan(lat) * (a * a / 2
      + (5 - t + 9 * c + 4 * c * c) * math.pow(a, 4) / 24
      + (61 - 58 * t + t * t + 600 * c - 330 * Ep2) * math.pow(a, 6) / 720))
    (easting, if (latDeg >= 0) northing else northing + 10000000.0)
  }

  /** (easting, northing) in the given UTM zone → (lonDeg, latDeg). */
  def utmToWgs84(easting: Double, northing: Double, zone: Int,
                 northern: Boolean = true): (Double, Double) = {
    val y = if (northern) northing else northing - 10000000.0
    val m = y / K0
    val mu = m / (A * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * math.pow(E2, 3) / 256))
    val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
    val phi1 = mu +
      (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val c1 = Ep2 * math.pow(math.cos(phi1), 2)
    val t1 = math.pow(math.tan(phi1), 2)
    val n1 = A / math.sqrt(1 - E2 * math.pow(math.sin(phi1), 2))
    val r1 = A * (1 - E2) / math.pow(1 - E2 * math.pow(math.sin(phi1), 2), 1.5)
    val d = (easting - 500000.0) / (n1 * K0)
    val lat = phi1 - (n1 * math.tan(phi1) / r1) * (d * d / 2
      - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * Ep2) * math.pow(d, 4) / 24
      + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * Ep2 - 3 * c1 * c1) * math.pow(d, 6) / 720)
    val lon = centralMeridian(zone) + (d - (1 + 2 * t1 + c1) * math.pow(d, 3) / 6
      + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * Ep2 + 24 * t1 * t1) * math.pow(d, 5) / 120) / math.cos(phi1)
    (math.toDegrees(lon), math.toDegrees(lat))
  }

  private val utmToWgs84Udf = org.apache.spark.sql.functions.udf(
    (e: Double, n: Double, zone: Int, northern: Boolean) => utmToWgs84(e, n, zone, northern))

  /** Column form: struct<lon, lat> — dimension-side (zone tables), UDF ok. */
  def utmToLonLat(easting: Column, northing: Column, zone: Column,
                  northern: Column = lit(true)): Column = {
    val p = utmToWgs84Udf(easting, northing, zone, northern)
    struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))
  }
}
