package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Grid-cell cover algebra — the Spark-first answer to the reference's
  * GEOSHAPE cell sets (fn/TOGEOSHAPE.java, fn/GeoUnion.java,
  * fn/GeoIntersection.java, fn/GeoSubtraction.java, GEO.WITHIN /
  * GEO.INTERSECTS over HHCode cell sets).
  *
  * A cover at resolution `res` is the set of 2^res × 2^res lat/lon grid
  * cells that INTERSECT a shape — computed once on the driver (shapes
  * are query constants), then used as a coarse pre-filter that Catalyst
  * pushes to the scan (`cellId IN (...)` reaches parquet row-group
  * pruning), with the exact ray-cast verify applied to survivors only.
  * Cell ids are plain row-major `latCell * 2^res + lonCell` — simple
  * integer arithmetic both engines evaluate identically (the HHCode
  * bit-interleaved id in [[GeoFunctions]] serves storage layouts; covers
  * don't need interleaving).
  */
object GeoCells {

  /** Cell id Column for a point — codegen'd integer arithmetic. */
  def cellIdCol(lat: Column, lon: Column, res: Int): Column = {
    val n = 1L << res
    val latCell = least(floor((lat + 90.0) / 180.0 * n).cast(LongType), lit(n - 1))
    val lonCell = least(floor((lon + 180.0) / 360.0 * n).cast(LongType), lit(n - 1))
    latCell * n + lonCell
  }

  /** The same cell id as DuckDB SQL (oracle twin of [[cellIdCol]]). */
  def cellIdSql(latExpr: String, lonExpr: String, res: Int): String = {
    val n = 1L << res
    s"(least(CAST(floor(($latExpr + 90.0) / 180.0 * $n) AS BIGINT), ${n - 1}) * $n + " +
      s"least(CAST(floor(($lonExpr + 180.0) / 360.0 * $n) AS BIGINT), ${n - 1}))"
  }

  private def cellBounds(cell: Long, res: Int): (Double, Double, Double, Double) = {
    val n = 1L << res
    val latCell = cell / n
    val lonCell = cell % n
    val latMin = latCell.toDouble / n * 180.0 - 90.0
    val lonMin = lonCell.toDouble / n * 360.0 - 180.0
    (latMin, latMin + 180.0 / n, lonMin, lonMin + 360.0 / n)
  }

  /** Segment–rectangle intersection (driver-side cover construction). */
  private def segmentHitsRect(x1: Double, y1: Double, x2: Double, y2: Double,
                              latMin: Double, latMax: Double,
                              lonMin: Double, lonMax: Double): Boolean = {
    // trivial reject by segment bbox
    if (math.max(y1, y2) < latMin || math.min(y1, y2) > latMax ||
        math.max(x1, x2) < lonMin || math.min(x1, x2) > lonMax) return false
    // either endpoint inside
    def in(x: Double, y: Double) =
      y >= latMin && y <= latMax && x >= lonMin && x <= lonMax
    if (in(x1, y1) || in(x2, y2)) return true
    // otherwise the segment crosses the rectangle iff it crosses one of
    // the 4 boundary lines within the side's span
    def side(ax: Double, ay: Double, bx: Double, by: Double): Boolean = {
      val d1 = (x2 - x1) * (ay - y1) - (y2 - y1) * (ax - x1)
      val d2 = (x2 - x1) * (by - y1) - (y2 - y1) * (bx - x1)
      val d3 = (bx - ax) * (y1 - ay) - (by - ay) * (x1 - ax)
      val d4 = (bx - ax) * (y2 - ay) - (by - ay) * (x2 - ax)
      d1 * d2 <= 0 && d3 * d4 <= 0
    }
    side(lonMin, latMin, lonMax, latMin) || side(lonMax, latMin, lonMax, latMax) ||
      side(lonMax, latMax, lonMin, latMax) || side(lonMin, latMax, lonMin, latMin)
  }

  /** Cells at `res` intersecting `shape` — a guaranteed SUPERSET of the
    * cells containing any point of the shape: a cell is kept when its
    * center or a corner is inside, a shape vertex falls in it, or a
    * shape edge crosses its boundary. */
  def cover(shape: GeoShape, res: Int): Set[Long] = {
    val n = 1L << res
    val (latMin, latMax, lonMin, lonMax) = shape.bbox
    def latIdx(v: Double) = math.min(n - 1, math.max(0L, math.floor((v + 90.0) / 180.0 * n).toLong))
    def lonIdx(v: Double) = math.min(n - 1, math.max(0L, math.floor((v + 180.0) / 360.0 * n).toLong))
    val out = Set.newBuilder[Long]
    val edges = shape.edges
    var la = latIdx(latMin)
    while (la <= latIdx(latMax)) {
      var lo = lonIdx(lonMin)
      while (lo <= lonIdx(lonMax)) {
        val cell = la * n + lo
        val (cLatMin, cLatMax, cLonMin, cLonMax) = cellBounds(cell, res)
        val cLatMid = (cLatMin + cLatMax) / 2
        val cLonMid = (cLonMin + cLonMax) / 2
        val keep =
          shape.contains(cLatMid, cLonMid) ||
          shape.contains(cLatMin, cLonMin) || shape.contains(cLatMin, cLonMax) ||
          shape.contains(cLatMax, cLonMin) || shape.contains(cLatMax, cLonMax) ||
          shape.rings.exists(_.exists { case (x, y) =>
            y >= cLatMin && y <= cLatMax && x >= cLonMin && x <= cLonMax }) ||
          edges.exists { case ((x1, y1), (x2, y2)) =>
            segmentHitsRect(x1, y1, x2, y2, cLatMin, cLatMax, cLonMin, cLonMax) }
        if (keep) out += cell
        lo += 1
      }
      la += 1
    }
    out.result()
  }

  // GEOSHAPE set algebra (fn/GeoUnion.java, GeoIntersection, GeoSubtraction)
  def union(a: Set[Long], b: Set[Long]): Set[Long] = a | b
  def intersection(a: Set[Long], b: Set[Long]): Set[Long] = a & b
  def subtraction(a: Set[Long], b: Set[Long]): Set[Long] = a -- b

  /** GEOBUFFER (fn/GEOBUFFER.java buffers a shape; over a cell cover
    * the Spark-first equivalent is morphological dilation): expand the
    * cover by `rings` 8-neighborhood rings — each ring adds one cell
    * (180/2^res degrees of latitude) of margin around the shape.
    * Latitude clamps at the poles; longitude wraps across the
    * antimeridian. Driver-side set op (covers are query constants). */
  def dilate(cells: Set[Long], res: Int, rings: Int = 1): Set[Long] = {
    val n = 1L << res
    var cur = cells
    var r = 0
    while (r < rings) {
      val out = Set.newBuilder[Long]
      cur.foreach { cell =>
        val la = cell / n; val lo = cell % n
        var dla = -1L
        while (dla <= 1L) {
          val nla = la + dla
          if (nla >= 0 && nla < n) {
            var dlo = -1L
            while (dlo <= 1L) {
              out += nla * n + ((lo + dlo + n) % n)
              dlo += 1
            }
          }
          dla += 1
        }
      }
      cur = out.result()
      r += 1
    }
    cur
  }

  /** GEOSPLIT (fn/GEOSPLIT.java — split a shape into connex clusters;
    * corner contact does NOT count): 4-connected components of a cover,
    * longitude wrapping, BFS per component. Driver-side (covers are
    * query constants); returns components largest-first then by min
    * cell for determinism. */
  def split(cells: Set[Long], res: Int): Seq[Set[Long]] = {
    val n = 1L << res
    val remaining = scala.collection.mutable.Set.from(cells)
    val out = Seq.newBuilder[Set[Long]]
    while (remaining.nonEmpty) {
      val seed = remaining.head
      val comp = Set.newBuilder[Long]
      val queue = scala.collection.mutable.Queue(seed)
      remaining -= seed
      while (queue.nonEmpty) {
        val c = queue.dequeue()
        comp += c
        val la = c / n; val lo = c % n
        val neighbors = Seq(
          if (la > 0) Some((la - 1) * n + lo) else None,
          if (la < n - 1) Some((la + 1) * n + lo) else None,
          Some(la * n + ((lo + 1) % n)),
          Some(la * n + ((lo - 1 + n) % n))).flatten
        neighbors.foreach { nb =>
          if (remaining.remove(nb)) queue.enqueue(nb)
        }
      }
      out += comp.result()
    }
    out.result().sortBy(c => (-c.size, c.min))
  }

  /** Pre-filter predicate: point's cell ∈ cover. For small covers an
    * IN-list (pushed into the parquet scan); callers with huge covers
    * should broadcast-semi-join a cover table instead. */
  def inCover(lat: Column, lon: Column, cells: Set[Long], res: Int): Column =
    cellIdCol(lat, lon, res).isin(cells.toSeq.sorted: _*)

  /** Broadcast-semi-join form for covers too large for an IN-list. */
  def joinCover(df: DataFrame, lat: Column, lon: Column,
                cells: Set[Long], res: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cover = cells.toSeq.sorted.toDF("__cell")
    df.withColumn("__cell", cellIdCol(lat, lon, res))
      .join(broadcast(cover), Seq("__cell"), "left_semi")
      .drop("__cell")
  }
}
