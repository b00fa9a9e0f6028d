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
}
