package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal ESRI shapefile (.shp) geometry reader → WKT (SURVEY §2.1 S3).
  *
  * The reference converts shapefiles geopandas-side and loads the geometry
  * as WKT strings (/root/reference/airflow/dags/bronze/utils.py:548-661;
  * :679-681 stringifies the geometry column before table creation). This
  * utility completes that seam without a geo stack: parse the .shp main
  * file directly and emit WKT consumable by `graft.functions.Spatial` /
  * `Silver.zones`. Driver-side on purpose — zonification shapefiles are
  * dimension data (thousands of zones, megabytes), never the 100 TB fact
  * side; the resulting small DataFrame broadcasts into every zone join.
  *
  * Format per the public "ESRI Shapefile Technical Description" (1998
  * whitepaper): a 100-byte header (file code 9994 and record headers in
  * big-endian; shape type and all geometry payloads in little-endian),
  * then [record number, content length in 16-bit words] + payload records.
  * Supported shapes: Null (0) → no WKT, Point (1), Polygon (5, including
  * multi-ring). Polygon ring convention: outer rings wind clockwise, holes
  * counter-clockwise (whitepaper p.8); each clockwise ring starts a new
  * polygon and subsequent counter-clockwise rings are its holes, which is
  * how well-formed writers order rings.
  */
object Shapefile {

  /** Parse a .shp file: (record number, WKT) — None for Null shapes. */
  def readWkt(path: String): Seq[(Int, Option[String])] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val buf = ByteBuffer.wrap(bytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    val fileCode = buf.getInt(0)
    require(fileCode == 9994, s"not a shapefile: file code $fileCode != 9994")
    val fileWords = buf.getInt(24) // length in 16-bit words, incl. header
    val out = Seq.newBuilder[(Int, Option[String])]
    var pos = 100
    while (pos < fileWords * 2) {
      buf.order(ByteOrder.BIG_ENDIAN)
      val recNum = buf.getInt(pos)
      val contentWords = buf.getInt(pos + 4)
      buf.order(ByteOrder.LITTLE_ENDIAN)
      out += recNum -> parseShape(buf, pos + 8)
      pos += 8 + contentWords * 2
    }
    out.result()
  }

  /** The shapefile as a DataFrame(record INT, wkt STRING) — the bronze
    * shape the reference's zonification load produces. `repair` applies
    * graft.functions.Spatial.makeValidWkt per record, mirroring the
    * reference's geopandas make_valid at this same ingest point
    * (/root/reference/airflow/dags/bronze/utils.py:589-591); it is the
    * identity on well-formed .shp output (rings the whitepaper requires to
    * be closed), and mends unclosed/duplicate-vertex rings from sloppy
    * writers before they silently skew the downstream centroid.
    */
  def toDF(spark: SparkSession, path: String, repair: Boolean = true): DataFrame = {
    import spark.implicits._
    readWkt(path).map { case (r, w) =>
      val fixed = if (repair) w.flatMap(graft.functions.Spatial.makeValidWkt) else w
      (r, fixed.orNull)
    }.toDF("record", "wkt")
  }

  private def parseShape(buf: ByteBuffer, at: Int): Option[String] =
    buf.getInt(at) match { // shape type, little-endian
      case 0 => None
      case 1 =>
        Some(s"POINT (${fmt(buf.getDouble(at + 4))} ${fmt(buf.getDouble(at + 12))})")
      case 5 => polygonWkt(buf, at)
      case t => throw new IllegalArgumentException(
        s"unsupported shape type $t (supported: 0 Null, 1 Point, 5 Polygon)")
    }

  /** Polygon record: box(4 doubles) + numParts + numPoints + part offsets +
    * xy points. Rings are split at part offsets, then grouped into polygons
    * by winding order.
    */
  private def polygonWkt(buf: ByteBuffer, at: Int): Option[String] = {
    val numParts = buf.getInt(at + 36)
    val numPoints = buf.getInt(at + 40)
    val partsAt = at + 44
    val pointsAt = partsAt + numParts * 4
    val offsets = (0 until numParts).map(i => buf.getInt(partsAt + i * 4)) :+ numPoints
    val rings = (0 until numParts).map { i =>
      (offsets(i) until offsets(i + 1)).map { p =>
        (buf.getDouble(pointsAt + p * 16), buf.getDouble(pointsAt + p * 16 + 8))
      }
    }
    // shoelace sum Σ(x2-x1)(y2+y1): positive = clockwise = outer ring;
    // index loop so degenerate (<2 point) rings sum to 0, not a crash
    def clockwise(ring: Seq[(Double, Double)]): Boolean = {
      var s = 0.0
      var i = 0
      while (i < ring.length - 1) {
        val (x1, y1) = ring(i); val (x2, y2) = ring(i + 1)
        s += (x2 - x1) * (y2 + y1)
        i += 1
      }
      s > 0
    }
    // group: each outer (clockwise) ring collects the holes that follow it;
    // a leading counter-clockwise ring (malformed writer) starts its own
    val polys = rings.foldLeft(Vector.empty[Vector[Seq[(Double, Double)]]]) {
      case (acc, ring) if acc.isEmpty || clockwise(ring) => acc :+ Vector(ring)
      case (acc, hole) => acc.init :+ (acc.last :+ hole)
    }
    def ringStr(r: Seq[(Double, Double)]): String =
      r.map { case (x, y) => s"${fmt(x)} ${fmt(y)}" }.mkString("(", ", ", ")")
    def polyStr(p: Seq[Seq[(Double, Double)]]): String = p.map(ringStr).mkString("(", ", ", ")")
    // numParts = 0 (some writers' empty geometry) must map to None like the
    // Null shape — 'MULTIPOLYGON ()' is not valid WKT
    if (polys.isEmpty) None
    else if (polys.sizeIs == 1) Some(s"POLYGON ${polyStr(polys.head)}")
    else Some(s"MULTIPOLYGON ${polys.map(polyStr).mkString("(", ", ", ")")}")
  }

  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString
}
