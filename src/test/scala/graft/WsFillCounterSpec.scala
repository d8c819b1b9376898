package graft

import org.apache.spark.sql.functions._

import graft.script.WarpScriptEngine

/** FILL word + filler values + MACROFILLER + COUNTER words. */
class WsFillCounterSpec extends SparkSpec {

  private def seqFrame = {
    val s = spark
    // bucketized-looking points at ticks 10,20,40 (bucket span 10, lb 40)
    val pts = Seq((10L, 1.0), (20L, 3.0), (40L, 9.0))
    val df = s.createDataFrame(pts).toDF("t", "v").select(
      lit("p.q").as("class"), typedLit(Map("u" -> "1")).as("labels"),
      lit(0L).as("gtsid"), col("t").as("ts"),
      lit(null).cast("double").as("lat"), lit(null).cast("double").as("lon"),
      lit(null).cast("long").as("elev"),
      lit(graft.model.GtsType.DOUBLE).as("vtype"),
      lit(null).cast("long").as("vlong"), col("v").as("vdouble"),
      lit(null).cast("boolean").as("vbool"),
      lit(null).cast("string").as("vstring"),
      lit(null).cast("binary").as("vbinary"))
    graft.operators.GtsFrame(graft.model.Gts.canonicalRehash(df))
  }

  private def eng = new WarpScriptEngine(
    fetch = (_, _, _, _) => seqFrame, nowTs = 0L, session = Some(spark))

  private def top(p: String): Any = eng.run(p).head

  private val B = "[ [ '' '~.*' { } 100 101 ] FETCH bucketizer.sum 40 10 4 ] BUCKETIZE"

  test("FILL with filler.previous / filler.value / filler.linear") {
    assert(top(s"$B filler.previous FILL VALUES") == Vector(1.0, 3.0, 3.0, 9.0))
    assert(top(s"$B 0.5 filler.value FILL VALUES") == Vector(1.0, 3.0, 0.5, 9.0))
    // linear: bucket 30 between 20(3.0) and 40(9.0) -> 6.0
    assert(top(s"$B filler.interpolate FILL VALUES") == Vector(1.0, 3.0, 6.0, 9.0))
  }

  test("FILL with filler.spline fills interior buckets") {
    val vals = top(s"$B filler.spline FILL VALUES").asInstanceOf[Vector[Any]]
    assert(vals.length == 4)
    assert(vals(0) == 1.0 && vals(1) == 3.0 && vals(3) == 9.0)
    val mid = vals(2).asInstanceOf[Double]
    assert(mid > 3.0 && mid < 9.0)
  }

  test("MACROFILLER evaluates the macro at the missing tick") {
    // macro: tick / 10 as double -> bucket 30 filled with 3.0
    assert(top(s"$B <% 10 / TODOUBLE %> MACROFILLER FILL VALUES") ==
      Vector(1.0, 3.0, 3.0, 9.0))
  }

  test("COUNTER / COUNTERDELTA / COUNTERSET / COUNTERVALUE") {
    assert(top("COUNTER 5 COUNTERDELTA 3 COUNTERDELTA COUNTERVALUE") == 8L)
    assert(top("COUNTER 5 COUNTERDELTA 42 COUNTERSET COUNTERVALUE") == 42L)
  }

  test("sliding window constants") {
    assert(top("max.tick.sliding.window") == Long.MaxValue / 2L)
    // NEGATIVE: MaxTimeSlidingWindow.java pushes MIN_VALUE/2 (MAP's
    // time-window widths are negative by convention)
    assert(top("max.time.sliding.window") == Long.MinValue / 2L)
  }
}
