package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Geohash text codec (fn/TOGEOHASH.java, fn/GEOHASHTO.java — the
  * reference delegates to GeoXP's GeoHashHelper; this is a clean-room
  * re-derivation of the public Niemeyer geohash algorithm).
  *
  * Encoding: lat and lon are quantized to latBits/lonBits fixed-point
  * cells, bit-interleaved MSB-first starting with LONGITUDE, and the
  * 5-bit groups are mapped through the base-32 alphabet. Everything is
  * a pure Column expression (shift/mask/concat — fully codegen'd, no
  * UDF), with a string-for-string DuckDB SQL twin generator for the
  * oracle so both engines evaluate the identical arithmetic.
  */
object GeoHash {

  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** lon carries the extra bit when 5·chars is odd (standard geohash). */
  private def bitSplit(chars: Int): (Int, Int) = {
    val total = 5 * chars
    ((total + 1) / 2, total / 2) // (lonBits, latBits)
  }

  /** Quantized cell index of a coordinate over its range. */
  private def idx(v: Column, offset: Double, range: Double, bits: Int): Column = {
    val n = 1L << bits
    least(floor((v + offset) / range * n).cast(LongType), lit(n - 1))
  }

  /** Geohash string of `chars` characters for a lat/lon pair. */
  def encode(lat: Column, lon: Column, chars: Int): Column = {
    require(chars >= 1 && chars <= 12, s"geohash length must be in [1,12]: $chars")
    val (lonBits, latBits) = bitSplit(chars)
    val lonIdx = idx(lon, 180.0, 360.0, lonBits)
    val latIdx = idx(lat, 90.0, 180.0, latBits)
    val total = 5 * chars
    // interleaved bit p (0 = MSB): even p from lon, odd p from lat
    val inter = (0 until total).map { p =>
      val src = if (p % 2 == 0) lonIdx else latIdx
      val k = if (p % 2 == 0) lonBits - 1 - p / 2 else latBits - 1 - (p - 1) / 2
      shiftleft(shiftright(src, k).bitwiseAND(1), total - 1 - p)
    }.reduce(_ + _)
    val digits = (0 until chars).map { j =>
      val d = shiftright(inter, 5 * (chars - 1 - j)).bitwiseAND(31)
      lit(Alphabet).substr((d + 1).cast(IntegerType), lit(1))
    }
    concat(digits: _*)
  }

  /** The SAME encoding as DuckDB SQL (oracle twin of [[encode]]). */
  def encodeSql(latExpr: String, lonExpr: String, chars: Int): String = {
    val (lonBits, latBits) = bitSplit(chars)
    val lonN = 1L << lonBits; val latN = 1L << latBits
    val lonIdx = s"least(CAST(floor(($lonExpr + 180.0) / 360.0 * $lonN) AS BIGINT), ${lonN - 1})"
    val latIdx = s"least(CAST(floor(($latExpr + 90.0) / 180.0 * $latN) AS BIGINT), ${latN - 1})"
    val total = 5 * chars
    val inter = (0 until total).map { p =>
      val src = if (p % 2 == 0) lonIdx else latIdx
      val k = if (p % 2 == 0) lonBits - 1 - p / 2 else latBits - 1 - (p - 1) / 2
      s"((($src >> $k) & 1) << ${total - 1 - p})"
    }.mkString(" + ")
    val digits = (0 until chars).map { j =>
      s"substring('$Alphabet', CAST(((($inter) >> ${5 * (chars - 1 - j)}) & 31) + 1 AS INT), 1)"
    }
    digits.mkString(" || ")
  }

  /** 0-based digit values of a geohash string (shared by the decoders):
    * digit j = position of char j in the base-32 alphabet. */
  private def digit(gh: Column, j: Int): Column = {
    val ch = gh.substr(j + 1, 1)
    // 32-way when-chain: deterministic, codegen'd, no UDF/map lookup
    Alphabet.zipWithIndex.foldLeft(lit(-1L)) { case (acc, (c, i)) =>
      when(ch === c.toString, lit(i.toLong)).otherwise(acc)
    }
  }

  /** Center latitude of the cell a geohash of `chars` chars denotes. */
  def decodeLat(gh: Column, chars: Int): Column = decodeCoord(gh, chars, lat = true)

  /** Center longitude of the cell a geohash of `chars` chars denotes. */
  def decodeLon(gh: Column, chars: Int): Column = decodeCoord(gh, chars, lat = false)

  private def decodeCoord(gh: Column, chars: Int, lat: Boolean): Column = {
    val (lonBits, latBits) = bitSplit(chars)
    val total = 5 * chars
    val digits = (0 until chars).map(j => digit(gh, j))
    // global interleaved bit p lives in digit p/5 at in-digit MSB-offset p%5
    def bit(p: Int): Column =
      shiftright(digits(p / 5), 4 - p % 5).bitwiseAND(1)
    val (bits, myBits) = if (lat) ((0 until total).filter(_ % 2 == 1), latBits)
      else ((0 until total).filter(_ % 2 == 0), lonBits)
    val cellIdx = bits.zipWithIndex.map { case (p, r) =>
      shiftleft(bit(p), myBits - 1 - r)
    }.reduce(_ + _)
    val n = (1L << myBits).toDouble
    if (lat) (cellIdx + 0.5) / n * 180.0 - 90.0
    else (cellIdx + 0.5) / n * 360.0 - 180.0
  }

  /** Driver-side scalar encode (the TOGEOHASH word) — same arithmetic
    * as the Column expression. */
  def encodeScalar(lat: Double, lon: Double, chars: Int = 12): String = {
    require(chars >= 1 && chars <= 12)
    val (lonBits, latBits) = bitSplit(chars)
    def q(v: Double, off: Double, range: Double, bits: Int): Long = {
      val n = 1L << bits
      math.min(math.floor((v + off) / range * n).toLong, n - 1)
    }
    val lonIdx = q(lon, 180.0, 360.0, lonBits)
    val latIdx = q(lat, 90.0, 180.0, latBits)
    val total = 5 * chars
    var inter = 0L
    var p = 0
    while (p < total) {
      val bit =
        if (p % 2 == 0) (lonIdx >> (lonBits - 1 - p / 2)) & 1L
        else (latIdx >> (latBits - 1 - (p - 1) / 2)) & 1L
      inter |= bit << (total - 1 - p)
      p += 1
    }
    (0 until chars).map { j =>
      Alphabet(((inter >> (5 * (chars - 1 - j))) & 31).toInt)
    }.mkString
  }

  /** Driver-side scalar decode to the cell CENTER (the GEOHASHTO word). */
  def decodeScalar(gh: String): (Double, Double) = {
    val chars = gh.length
    require(chars >= 1 && chars <= 12)
    val (lonBits, latBits) = bitSplit(chars)
    val total = 5 * chars
    val digits = gh.toLowerCase.map { c =>
      val i = Alphabet.indexOf(c)
      require(i >= 0, s"invalid geohash char '$c'")
      i.toLong
    }
    var lonIdx = 0L; var latIdx = 0L
    var lonR = 0; var latR = 0
    var p = 0
    while (p < total) {
      val bit = (digits(p / 5) >> (4 - p % 5)) & 1L
      if (p % 2 == 0) { lonIdx |= bit << (lonBits - 1 - lonR); lonR += 1 }
      else { latIdx |= bit << (latBits - 1 - latR); latR += 1 }
      p += 1
    }
    ((latIdx + 0.5) / (1L << latBits).toDouble * 180.0 - 90.0,
      (lonIdx + 0.5) / (1L << lonBits).toDouble * 360.0 - 180.0)
  }

  /** Decoder twin for the oracle. */
  def decodeSql(ghExpr: String, chars: Int, lat: Boolean): String = {
    val (lonBits, latBits) = bitSplit(chars)
    val total = 5 * chars
    def digitSql(j: Int) =
      s"(strpos('$Alphabet', substring($ghExpr, ${j + 1}, 1)) - 1)"
    def bitSql(p: Int) = s"((${digitSql(p / 5)} >> ${4 - p % 5}) & 1)"
    val (bits, myBits) = if (lat) ((0 until total).filter(_ % 2 == 1), latBits)
      else ((0 until total).filter(_ % 2 == 0), lonBits)
    val cellIdx = bits.zipWithIndex.map { case (p, r) =>
      s"(${bitSql(p)} << ${myBits - 1 - r})"
    }.mkString(" + ")
    val n = (1L << myBits).toDouble
    if (lat) s"((($cellIdx) + 0.5) / $n * 180.0 - 90.0)"
    else s"((($cellIdx) + 0.5) / $n * 360.0 - 180.0)"
  }
}
