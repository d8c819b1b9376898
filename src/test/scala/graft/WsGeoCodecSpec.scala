package graft

import graft.script.WarpScriptEngine

/** Geo codec word tail: WKB/KML/GML round-trips, geocell-list arrows,
  * GEOSHIFT, GEO.REGEXP, GTS-convention HHCode arrows, HULLSHAPE. */
class WsGeoCodecSpec extends SparkSpec {

  private def eng = new WarpScriptEngine(
    fetch = (_, _, _, _) => throw new UnsupportedOperationException("no storage"),
    nowTs = 0L, session = Some(spark))

  private def top(p: String): Any = eng.run(p).head

  private val Sq = "'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'"

  test("GEOSHAPE-> / ->GEOSHAPE round-trip the cover") {
    val cells = top(s"$Sq 8 GEO.WKT GEOSHAPE->").asInstanceOf[Vector[Long]]
    assert(cells.nonEmpty && cells.forall(c => (c >>> 56) == 8))
    // round-trip back to a shape: same cell set
    val rt = top(s"$Sq 8 GEO.WKT GEOSHAPE-> ->GEOSHAPE GEOSHAPE->")
    assert(rt == cells)
    // string form round-trips too
    val hex = top(s"$Sq 8 GEO.WKT true GEOSHAPE->").asInstanceOf[Vector[String]]
    assert(hex == cells.map(l => f"$l%016x"))
    assert(top(s"$Sq 8 GEO.WKT true GEOSHAPE-> ->GEOSHAPE GEOSHAPE->") == cells)
  }

  test("->GEOSHAPE expands mixed resolutions to the finest grid") {
    // one res-2 cell covers 4 res-3 cells per dimension step: 2x2 = 4 children
    val enc2 = (2L << 56) | 0L
    val enc3 = (3L << 56) | 63L
    val cells = eng.run(s"[ $enc2 $enc3 ] ->GEOSHAPE GEOSHAPE->")
      .head.asInstanceOf[Vector[Long]]
    assert(cells.length == 5) // 4 children of the res-2 cell + the res-3 cell
    assert(cells.forall(c => (c >>> 56) == 3))
  }

  test("WKB round-trip: ->WKB then GEO.WKB preserves vertices") {
    val wkt = top(s"$Sq ->WKB 8 GEO.WKB ->WKT")
    assert(wkt == "POLYGON ((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0))")
    // little-endian WKB from an external writer also parses: build the
    // bytes here, feed them through HEX-> into GEO.WKB
    val pts = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0))
    val le = java.nio.ByteBuffer.allocate(1 + 4 + 4 + 4 + pts.size * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    le.put(1.toByte).putInt(3).putInt(1).putInt(pts.size)
    pts.foreach { case (x, y) => le.putDouble(x).putDouble(y) }
    val hex = le.array().map("%02x".format(_)).mkString
    assert(top(s"'$hex' HEX-> 8 GEO.WKB ->WKT") ==
      "POLYGON ((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0))")
  }

  test("KML and GML round-trips preserve vertices incl. holes") {
    val holed = "'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))'"
    val kml = top(s"$holed ->KML").asInstanceOf[String]
    assert(kml.contains("<outerBoundaryIs>") && kml.contains("<innerBoundaryIs>"))
    val wkt = top(s"$holed 8 GEO.WKT ->WKT")
    assert(top(s"$holed ->KML 8 GEO.KML ->WKT") == wkt)
    val gml = top(s"$holed ->GML").asInstanceOf[String]
    assert(gml.contains("<gml:exterior>") && gml.contains("<gml:interior>"))
    assert(top(s"$holed ->GML 8 GEO.GML ->WKT") == wkt)
  }

  test("GEOSHIFT translates the cover") {
    // res-8 grid: 256 cells/dim; +45 deg lon = +32 lon steps exactly
    val base = top(s"$Sq 8 GEO.WKT GEOSHAPE->").asInstanceOf[Vector[Long]]
    val shifted = top(s"$Sq 8 GEO.WKT 0.0 45.0 8 GEOSHIFT GEOSHAPE->")
      .asInstanceOf[Vector[Long]]
    val mask = 0x00ffffffffffffffL
    assert(shifted.map(_ & mask).toSet ==
      base.map(c => (c & mask) + 32).toSet)
  }

  test("GEO.REGEXP matches exactly the cover's hex cell ids") {
    val re = top(s"$Sq 8 GEO.WKT GEO.REGEXP").asInstanceOf[String]
    val hex = top(s"$Sq 8 GEO.WKT true GEOSHAPE->").asInstanceOf[Vector[String]]
    val p = java.util.regex.Pattern.compile(re)
    assert(hex.forall(h => p.matcher(h).find()))
    assert(!p.matcher(f"${(9L << 56) | 1L}%016x").find())
  }

  test("GTS-convention HHCode arrows: NaN maps to NO_LOCATION") {
    val rt = eng.run("48.0 -4.5 ->GTSHHCODELONG GTSHHCODE->")
    assert(math.abs(rt(0).asInstanceOf[Double] - -4.5) < 1e-6) // lon on top
    assert(math.abs(rt(1).asInstanceOf[Double] - 48.0) < 1e-6)
    assert(top("NaN NaN ->GTSHHCODE") == "0145014501450145")
    val st = eng.run("NaN NaN ->GTSHHCODELONG GTSHHCODE->")
    assert(st(0).asInstanceOf[Double].isNaN && st(1).asInstanceOf[Double].isNaN)
  }

  test("HULLSHAPE of a ragged nested list") {
    assert(top("[ [ 1 2 3 ] [ [ 1 ] [ 2 2 ] ] ] HULLSHAPE") ==
      Vector(2L, 3L, 2L))
    assert(top("[ ] HULLSHAPE") == Vector(0L))
  }
}
