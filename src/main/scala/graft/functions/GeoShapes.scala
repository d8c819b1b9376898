package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo shapes + point-in-polygon predicates (reference: fn/GEOWITHIN.java,
  * fn/GEOINTERSECTS.java, fn/GeoWKT.java, fn/GeoJSON.java,
  * script/mapper/MapperGeoWithin.java).
  *
  * Spark-first design: a shape is a QUERY CONSTANT (parsed once on the
  * driver, like the reference parses WarpScript shape literals), and the
  * containment predicate unrolls into pure Column arithmetic — one
  * even-odd ray-casting term per polygon edge, fully codegen'd, no UDF,
  * no JTS dependency. The same formula renders to DuckDB SQL for the
  * oracle, so containment is bit-reproducible across engines.
  *
  * Vertices are stored (lon, lat) as in WKT/GeoJSON. Holes work by
  * even-odd parity: a point inside an odd number of rings is inside the
  * shape.
  */
final case class GeoShape(rings: Seq[Seq[(Double, Double)]]) {
  require(rings.nonEmpty && rings.forall(_.size >= 3), "ring needs >= 3 vertices")

  /** All (closed) edges of all rings: ((x1,y1),(x2,y2)). */
  def edges: Seq[((Double, Double), (Double, Double))] =
    rings.flatMap { ring =>
      val closed = if (ring.head == ring.last) ring else ring :+ ring.head
      closed.sliding(2).map(p => (p(0), p(1))).toSeq
    }

  /** (latMin, latMax, lonMin, lonMax). */
  def bbox: (Double, Double, Double, Double) = {
    val pts = rings.flatten
    (pts.map(_._2).min, pts.map(_._2).max, pts.map(_._1).min, pts.map(_._1).max)
  }

  /** Even-odd ray casting as a Column predicate: for each edge, a
    * horizontal ray east from the point crosses it iff the edge spans the
    * point's latitude and the crossing longitude is east of the point.
    * Guarded CASE keeps the interpolation division reachable only when
    * the edge genuinely spans y (identical semantics in DuckDB). */
  def containsCol(lat: Column, lon: Column): Column = {
    val terms = edges.map { case ((x1, y1), (x2, y2)) =>
      when(((lit(y1) > lat) =!= (lit(y2) > lat)) &&
        lon < lit(x1) + (lit(x2) - lit(x1)) * (lat - lit(y1)) / (lit(y2) - lit(y1)),
        1).otherwise(0)
    }
    terms.reduce(_ + _) % 2 === 1
  }

  /** Driver-side containment with the SAME arithmetic as containsCol. */
  def contains(lat: Double, lon: Double): Boolean = {
    var crossings = 0
    edges.foreach { case ((x1, y1), (x2, y2)) =>
      if ((y1 > lat) != (y2 > lat) &&
        lon < x1 + (x2 - x1) * (lat - y1) / (y2 - y1)) crossings += 1
    }
    crossings % 2 == 1
  }

  /** The containment predicate as DuckDB SQL over `latExpr`/`lonExpr` —
    * the oracle twin of [[containsCol]], term-for-term identical. */
  def containsSql(latExpr: String, lonExpr: String): String = {
    val terms = edges.map { case ((x1, y1), (x2, y2)) =>
      s"(CASE WHEN (($y1 > $latExpr) <> ($y2 > $latExpr)) AND " +
        s"$lonExpr < $x1 + ($x2 - ($x1)) * ($latExpr - ($y1)) / ($y2 - ($y1)) " +
        "THEN 1 ELSE 0 END)"
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
  }
}

object GeoShape {

  /** Parse WKT POLYGON / MULTIPOLYGON (fn/GeoWKT.java semantics; subset:
    * no Z/M, no EMPTY). Vertex order in WKT is `lon lat`. */
  def parseWkt(wkt: String): GeoShape = {
    val s = wkt.trim
    val upper = s.toUpperCase
    require(upper.startsWith("POLYGON") || upper.startsWith("MULTIPOLYGON"),
      s"unsupported WKT type: $s")
    // rings are parenthesized lists of "x y" pairs; polygons of a
    // multipolygon just contribute more rings (even-odd semantics)
    val ringRe = "\\(([^()]+)\\)".r
    val rings = ringRe.findAllMatchIn(s).map { m =>
      m.group(1).split(",").toSeq.map { pt =>
        val xy = pt.trim.split("\\s+")
        (xy(0).toDouble, xy(1).toDouble)
      }
    }.toSeq
    GeoShape(rings)
  }

  /** Parse GeoJSON Polygon / MultiPolygon geometry (fn/GeoJSON.java
    * subset). Coordinates are [lon, lat]. Minimal recursive parse of the
    * coordinates array — no JSON library needed for this grammar. */
  def parseGeoJson(json: String): GeoShape = {
    val coordIdx = json.indexOf("\"coordinates\"")
    require(coordIdx >= 0, "no coordinates member")
    val start = json.indexOf('[', coordIdx)
    // tokenize nested arrays: collect [lon, lat] leaf pairs per ring
    val rings = scala.collection.mutable.ArrayBuffer[Seq[(Double, Double)]]()
    val cur = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    val num = new StringBuilder
    var depth = 0
    var leafDepth = -1
    val nums = scala.collection.mutable.ArrayBuffer[Double]()
    var i = start
    var done = false
    while (i < json.length && !done) {
      val c = json.charAt(i)
      c match {
        case '[' => depth += 1
        case ']' =>
          if (num.nonEmpty) { nums += num.toString.toDouble; num.clear() }
          if (nums.size == 2) { // closed a leaf [lon, lat]
            cur += ((nums(0), nums(1))); nums.clear()
            leafDepth = depth
          } else if (cur.nonEmpty && depth == leafDepth - 1) {
            rings += cur.toSeq; cur.clear()
          }
          depth -= 1
          if (depth == 0) done = true
        case ',' =>
          if (num.nonEmpty) { nums += num.toString.toDouble; num.clear() }
        case ch if !ch.isWhitespace => num += ch
        case _ =>
      }
      i += 1
    }
    if (cur.nonEmpty) rings += cur.toSeq
    GeoShape(rings.toSeq)
  }
}
