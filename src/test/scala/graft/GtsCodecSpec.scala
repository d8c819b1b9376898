package graft

import org.apache.spark.sql.functions._

import graft.model.Gts
import graft.sources.{GtsCodec, LineProtocol}
import graft.sources.GtsCodec.Point

class GtsCodecSpec extends SparkSpec {

  test("point-stream codec round-trips every value type") {
    val pts = Seq(
      Point(1000L, Some(48.0), Some(-4.5), Some(120L), graft.model.GtsType.DOUBLE,
        None, Some(22.5), None, None, None),
      Point(2000L, None, None, None, graft.model.GtsType.LONG,
        Some(-42L), None, None, None, None),
      Point(3000L, None, None, None, graft.model.GtsType.BOOLEAN,
        None, None, Some(true), None, None),
      Point(4000L, None, None, None, graft.model.GtsType.STRING,
        None, None, None, Some("héllo wörld"), None),
      Point(5000L, None, None, Some(-5L), graft.model.GtsType.BINARY,
        None, None, None, None, Some(Array[Byte](1, 2, 3))))
    val decoded = GtsCodec.decode(GtsCodec.encode(pts))
    assert(decoded.length === 5)
    decoded.zip(pts).foreach { case (d, o) =>
      assert(d.ts === o.ts && d.vtype === o.vtype && d.lat === o.lat &&
        d.elev === o.elev && d.vlong === o.vlong && d.vdouble === o.vdouble &&
        d.vbool === o.vbool && d.vstring === o.vstring)
      assert(d.vbinary.map(_.toSeq) === o.vbinary.map(_.toSeq))
    }
  }

  test("delta encoding is compact for dense ticks") {
    val pts = (0 until 1000).map(i =>
      Point(1700000000000000L + i * 1000L, None, None, None,
        graft.model.GtsType.LONG, Some(i.toLong), None, None, None, None))
    val blob = GtsCodec.encode(pts)
    // flag + 2B ts-delta + ~2B value per point, plus the 8B first delta
    assert(blob.length < 1000 * 6, s"blob ${blob.length}B not compact")
  }

  test("WRAP/UNWRAP round-trips the events frame") {
    val pts = Gts.fromEvents(spark, "/root/testdata/sf0.001")
    val wrapped = GtsCodec.wrap(pts)
    assert(wrapped.count() === pts.select("gtsid").distinct().count())
    val back = GtsCodec.unwrap(wrapped)
    assert(back.count() === pts.count())
    val origSum = pts.agg(sum(col("vdouble"))).head().getDouble(0)
    val backSum = back.agg(sum(col("vdouble"))).head().getDouble(0)
    // partitioning differs between the frames, so double-sum order does
    // too — values are identical, the fold order is not
    assert(math.abs(origSum - backSum) < 1e-6)
    // identity survives: same gtsid set
    val a = pts.select("gtsid").distinct().collect().map(_.getLong(0)).toSet
    val b = back.select("gtsid").distinct().collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("WRAP of mixed-type series from line protocol round-trips") {
    import spark.implicits._
    val lines = Seq(
      "1000// m.long{u=a} 7",
      "2000// m.str{u=a} 'x%20y'",
      "3000/48.5:2.3/99 m.geo{u=b} 1.25",
      "4000// m.bool{u=b} T").toDF("value")
    val pts = LineProtocol.ingest(lines, 0L)
    val back = GtsCodec.unwrap(GtsCodec.wrap(pts))
    assert(back.count() === 4)
    assert(back.filter(col("vstring") === "x y").count() === 1)
    assert(back.filter(col("lat").isNotNull).count() === 1)
    assert(back.filter(col("vbool")).count() === 1)
  }
}
