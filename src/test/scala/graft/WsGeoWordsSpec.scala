package graft

import org.apache.spark.sql.functions._

import graft.script.WarpScriptEngine

/** Geo word semantics not covered by the w52/w53 oracle rows:
  * neighbor algebra, COPYGEO tick-matching, MOTIONSPLIT's
  * time/distance-threshold splits. */
class WsGeoWordsSpec extends SparkSpec {

  private def geoFrame = {
    val s = spark
    // 6 points: a 3-point cluster, a big jump, another 3-point cluster
    val pts = Seq(
      (0L, 10.0, 10.0), (1000000L, 10.001, 10.001), (2000000L, 10.002, 10.002),
      (3000000L, 45.0, 45.0), (4000000L, 45.001, 45.001), (5000000L, 45.002, 45.002))
    val df = s.createDataFrame(pts).toDF("ts", "la", "lo").select(
      lit("geo.t").as("class"),
      typedLit(Map("u" -> "1")).as("labels"),
      lit(0L).as("gtsid"), col("ts"),
      col("la").as("lat"), col("lo").as("lon"),
      lit(null).cast("long").as("elev"),
      lit(graft.model.GtsType.DOUBLE).as("vtype"),
      lit(null).cast("long").as("vlong"),
      lit(1.0).as("vdouble"),
      lit(null).cast("boolean").as("vbool"),
      lit(null).cast("string").as("vstring"),
      lit(null).cast("binary").as("vbinary"))
    graft.operators.GtsFrame(graft.model.Gts.canonicalRehash(df))
  }

  private def eng = new WarpScriptEngine(
    fetch = (_, _, _, _) => geoFrame, nowTs = 0L, session = Some(spark))

  test("HHCODE neighbors move one cell and stay on the grid") {
    val e = eng
    val prog = "10.0 20.0 ->HHCODE 8 HHCODE.NORTH HHCODE->"
    val out = e.run(prog) // lon on top, lat below
    val lat = out(1).asInstanceOf[Double]
    assert(math.abs(lat - (10.0 + 180.0 / 256)) < 180.0 / 256) // one cell north
    // NORTH then SOUTH returns to the same cell center
    val rt = e.run("10.0 20.0 ->HHCODE 8 HHCODE.NORTH 8 HHCODE.SOUTH " +
      "8 HHCODE.CENTER 10.0 20.0 ->HHCODE 8 HHCODE.CENTER ==")
    assert(rt.head == true)
  }

  test("MOTIONSPLIT splits on the distance jump") {
    val e = eng
    // distance threshold 10km, time threshold huge: the 35° jump splits
    val out = e.run(
      s"""[ '' '~.*' { } 100000000 100000001 ] FETCH
         |${Long.MaxValue} 10000.0 'split' MOTIONSPLIT
         |[ 'split' ] PARTITION SIZE""".stripMargin)
    assert(out.head == 2L)
    // huge distance threshold → one split id
    val one = e.run(
      s"""[ '' '~.*' { } 100000000 100000001 ] FETCH
         |${Long.MaxValue} 1.0e12 'split' MOTIONSPLIT
         |[ 'split' ] PARTITION SIZE""".stripMargin)
    assert(one.head == 1L)
  }

  test("COPYGEO copies locations by tick") {
    val e = eng
    // strip geo via NEWGTS building same ticks, then copy from the track
    val out = e.run(
      s"""NEWGTS 'copy.t' RENAME
         |0 NaN NaN NULL 7.0 ADDVALUE
         |3000000 NaN NaN NULL 8.0 ADDVALUE
         |[ '' '~.*' { } 100000000 100000001 ] FETCH
         |COPYGEO 'g' STORE
         |$$g LOCATIONS""".stripMargin)
    // LOCATIONS pushes lats then lons (lons on top)
    val lons = out(0).asInstanceOf[Vector[Any]]
    val lats = out(1).asInstanceOf[Vector[Any]]
    assert(lats == Vector(10.0, 45.0))
    assert(lons == Vector(10.0, 45.0))
  }
}
