package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo primitives: HHCode cell ids and haversine distance.
  *
  * HHCode (reference: com.geoxp.GeoXPLib used at GeoTimeSerie.java:108
  * — a 64-bit bit-interleaved lat/lon cell id): lat and lon are each
  * scaled to 32-bit fixed point over their full range, then their bits
  * are interleaved (lon in even bits ≤ our convention). This
  * re-derivation is self-consistent (encode∘decode = cell center) and
  * order-compatible for range scans; it is not claimed bit-identical to
  * GeoXP's library output.
  */
object GeoFunctions {

  def toHHCode(lat: Double, lon: Double): Long = {
    val latBits = ((lat + 90.0) / 180.0 * (1L << 32)).toLong.min((1L << 32) - 1).max(0)
    val lonBits = ((lon + 180.0) / 360.0 * (1L << 32)).toLong.min((1L << 32) - 1).max(0)
    interleave(latBits, lonBits)
  }

  def fromHHCode(hh: Long): (Double, Double) = {
    val (latBits, lonBits) = deinterleave(hh)
    val lat = (latBits + 0.5) / (1L << 32).toDouble * 180.0 - 90.0
    val lon = (lonBits + 0.5) / (1L << 32).toDouble * 360.0 - 180.0
    (lat, lon)
  }

  private def interleave(a: Long, b: Long): Long = {
    var r = 0L
    var i = 0
    while (i < 32) {
      r |= ((a >> i) & 1L) << (2 * i + 1)
      r |= ((b >> i) & 1L) << (2 * i)
      i += 1
    }
    r
  }

  /** [[toHHCode]] as a codegen'd Column expression (magic-number bit
    * spreading instead of the scalar loop — same output bits). Null
    * when either coordinate is null. */
  def hhcodeCol(lat: Column, lon: Column): Column = {
    def bits32(v: Column, off: Double, range: Double): Column =
      least(greatest(floor((v + off) / range * lit(4294967296.0)).cast("long"),
        lit(0L)), lit(4294967295L))
    def spread(c: Column): Column = {
      var x = c.bitwiseAND(lit(0xFFFFFFFFL))
      x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
      x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
    }
    shiftleft(spread(bits32(lat, 90.0, 180.0)), 1)
      .bitwiseOR(spread(bits32(lon, 180.0, 360.0)))
  }

  private def deinterleave(x: Long): (Long, Long) = {
    var a = 0L; var b = 0L
    var i = 0
    while (i < 32) {
      a |= ((x >> (2 * i + 1)) & 1L) << i
      b |= ((x >> (2 * i)) & 1L) << i
      i += 1
    }
    (a, b)
  }

  /** HAVERSINE (fn/HAVERSINE.java) as a Column expression — pure
    * builtin math functions, fully codegen'd. Radius: WGS84 equatorial,
    * meters. */
  def haversine(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val toRad = math.Pi / 180.0
    val dphi = (lat2 - lat1) * toRad
    val dlmb = (lon2 - lon1) * toRad
    val a = pow(sin(dphi / 2), 2) +
      cos(lat1 * toRad) * cos(lat2 * toRad) * pow(sin(dlmb / 2), 2)
    lit(2.0 * 6378137.0) * asin(sqrt(a))
  }

  /** Point-in-bbox predicate (building block of mapper.geo.within /
    * GEO.WITHIN over rectangular covers, fn/GEOWITHIN.java). */
  def inBBox(lat: Column, lon: Column,
             latMin: Double, latMax: Double,
             lonMin: Double, lonMax: Double): Column =
    lat >= latMin && lat <= latMax && lon >= lonMin && lon <= lonMax

  val toHHCodeUdf = udf((lat: Double, lon: Double) => toHHCode(lat, lon))
  val fromHHCodeLatUdf = udf((hh: Long) => fromHHCode(hh)._1)
  val fromHHCodeLonUdf = udf((hh: Long) => fromHHCode(hh)._2)
}
