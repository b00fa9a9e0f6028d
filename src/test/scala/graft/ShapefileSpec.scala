package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}
import graft.functions.Spatial
import graft.sources.Shapefile

/** Synthesizes .shp bytes per the public ESRI whitepaper layout (big-endian
  * file/record headers, little-endian payloads) and checks the reader's WKT
  * against the Spatial parser — the consuming end of the S3 seam.
  */
class ShapefileSpec extends SparkSpec {

  private def polygonContent(rings: Seq[Seq[(Double, Double)]]): Array[Byte] = {
    val numPoints = rings.map(_.size).sum
    val bb = ByteBuffer.allocate(4 + 32 + 8 + 4 * rings.size + 16 * numPoints)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(5)
    (0 until 4).foreach(_ => bb.putDouble(0.0)) // bbox, unread
    bb.putInt(rings.size); bb.putInt(numPoints)
    rings.foldLeft(0) { (off, r) => bb.putInt(off); off + r.size }
    rings.flatten.foreach { case (x, y) => bb.putDouble(x); bb.putDouble(y) }
    bb.array()
  }

  private def pointContent(x: Double, y: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1); bb.putDouble(x); bb.putDouble(y)
    bb.array()
  }

  private val nullContent: Array[Byte] = {
    val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0)
    bb.array()
  }

  private def shpFile(contents: Seq[Array[Byte]]): Path = {
    val total = 100 + contents.map(8 + _.length).sum
    val bb = ByteBuffer.allocate(total)
    bb.order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0, 9994)
    bb.putInt(24, total / 2)
    bb.order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(28, 1000)
    bb.putInt(32, 5)
    bb.position(100)
    contents.zipWithIndex.foreach { case (c, i) =>
      bb.order(ByteOrder.BIG_ENDIAN)
      bb.putInt(i + 1); bb.putInt(c.length / 2)
      bb.put(c)
    }
    val f = Files.createTempFile("graft_shp_", ".shp")
    Files.write(f, bb.array())
    f
  }

  // outer ring clockwise (ESRI), hole counter-clockwise
  private val outer = Seq((0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0))
  private val hole = Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0))

  test("readWkt: polygon with hole, point, and null shape") {
    val f = shpFile(Seq(
      polygonContent(Seq(outer, hole)),
      pointContent(7.5, -3.0),
      nullContent))
    val got = Shapefile.readWkt(f.toString)
    assert(got === Seq(
      1 -> Some("POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"),
      2 -> Some("POINT (7.5 -3)"),
      3 -> None))
  }

  test("two clockwise rings become a MULTIPOLYGON") {
    val outer2 = outer.map { case (x, y) => (x + 10, y) }
    val f = shpFile(Seq(polygonContent(Seq(outer, hole, outer2))))
    val Seq((_, Some(wkt))) = Shapefile.readWkt(f.toString)
    assert(wkt ===
      "MULTIPOLYGON (((0 0, 0 4, 4 4, 4 0, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1)), ((10 0, 10 4, 14 4, 14 0, 10 0)))")
  }

  test("shapefile → bronze zones → Silver.zones (full ingestion path)") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val f = shpFile(Seq(
      polygonContent(Seq(outer, hole)),
      polygonContent(Seq(outer.map { case (x, y) => (x + 10, y) }))))
    val bronze = Shapefile.toDF(spark, f.toString).select(
      concat(lit("Z"), col("record")).as("ID"),
      concat(lit("Zone "), col("record")).as("Nombre"),
      lit("100").as("Poblacion"),
      col("wkt").as("geometry"))
    val silver = graft.pipeline.Silver.zones(Map("distrito" -> bronze))
    val rows = silver.orderBy("id")
      .select("id", "zone_level", "centroid_longitude", "centroid_latitude")
      .collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("Z1", "Z2"))
    // square-with-hole centroid pulls away from the hole; plain square is exact
    assert(math.abs(rows(0).getDouble(2) - (16 * 2.0 - 1.5) / 15) < 1e-9)
    assert(rows(1).getDouble(2) === 12.0 && rows(1).getDouble(3) === 2.0)
  }

  test("emitted WKT feeds the Spatial centroid (end-to-end S3 seam)") {
    val f = shpFile(Seq(polygonContent(Seq(outer, hole))))
    val df = Shapefile.toDF(spark, f.toString)
    val (x, y) = df.select(Spatial.wktCentroid(df("wkt")).as("c"))
      .selectExpr("c.x", "c.y").as[(Double, Double)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.Encoders.scalaDouble)).head()
    // 4x4 square (area 16, centroid (2,2)) minus unit hole (centroid (1.5,1.5))
    val exp = Spatial.wktCentroidXY(
      "POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))").get
    assert((x, y) === exp)
    assert(math.abs(x - (16 * 2.0 - 1.5) / 15) < 1e-9)
  }
}
