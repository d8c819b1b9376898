package graft

import org.apache.spark.sql.functions._

import graft.script.WarpScriptEngine

/** FETCH parameterization (fn/FETCH.java:195-218, 1290, 1372): the
  * LONG list form is (end, timespan) — NOT (start, stop) — with
  * negative timespan meaning a per-series count; STRING 4th/5th are
  * ISO8601 start/end; the map form takes start/end/timespan/count. */
class WsFetchFormsSpec extends SparkSpec {

  // one series, ticks 1s..10s (µs), value = seconds
  private def frame = {
    val s = spark
    val pts = (1 to 10).map(i => (i * 1000000L, i.toDouble))
    val df = s.createDataFrame(pts).toDF("t", "v").select(
      lit("m.s").as("class"), typedLit(Map("u" -> "1")).as("labels"),
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
    fetch = (c, l, a, b) => frame.select(c, l).timeclip(a, b),
    nowTs = 10000000L, session = Some(spark))

  private def ticksOf(p: String): Set[Long] =
    eng.runToFrame(p).select(col("ts")).collect().map(_.getLong(0)).toSet

  test("LONG form is (end, timespan): [end-timespan+1, end]") {
    // end = 5 s, timespan = 3 s → (2 s, 5 s] = ticks 3,4,5
    assert(ticksOf("[ '' 'm.s' { } 5000000 3000000 ] FETCH") ==
      Set(3000000L, 4000000L, 5000000L))
    // timespan covering everything
    assert(ticksOf("[ '' 'm.s' { } 10000000 10000000 ] FETCH").size == 10)
  }

  test("negative timespan fetches the most recent |n| points per series") {
    assert(ticksOf("[ '' 'm.s' { } 8000000 -3 ] FETCH") ==
      Set(6000000L, 7000000L, 8000000L))
    assert(ticksOf("[ '' 'm.s' { } ${Long.MaxValue} -2 ] FETCH"
      .replace("${Long.MaxValue}", Long.MaxValue.toString)) ==
      Set(9000000L, 10000000L))
  }

  test("STRING form is ISO8601 (start, end), both inclusive") {
    val p = "[ '' 'm.s' { } '1970-01-01T00:00:03Z' '1970-01-01T00:00:06Z' ] FETCH"
    assert(ticksOf(p) == Set(3000000L, 4000000L, 5000000L, 6000000L))
  }

  test("map form boundary.pre/post adds points just outside the interval") {
    assert(ticksOf(
      "{ 'class' 'm.s' 'labels' { } 'start' 4000000 'end' 6000000 'boundary.pre' 2 } FETCH") ==
      Set(2000000L, 3000000L, 4000000L, 5000000L, 6000000L))
    assert(ticksOf(
      "{ 'class' 'm.s' 'labels' { } 'start' 4000000 'end' 6000000 'boundary' 1 } FETCH") ==
      Set(3000000L, 4000000L, 5000000L, 6000000L, 7000000L))
  }

  test("map form: start/end, timespan, count") {
    assert(ticksOf("{ 'class' 'm.s' 'labels' { } 'start' 2000000 'end' 4000000 } FETCH") ==
      Set(2000000L, 3000000L, 4000000L))
    assert(ticksOf("{ 'class' 'm.s' 'labels' { } 'end' 9000000 'timespan' 2000000 } FETCH") ==
      Set(8000000L, 9000000L))
    assert(ticksOf("{ 'class' 'm.s' 'labels' { } 'end' 9000000 'count' 2 } FETCH") ==
      Set(8000000L, 9000000L))
    // 'end' alone needs 'count' (computeTimeRange: "'count' is
    // mandatory if 'start' and 'timespan' are not specified")
    assert(ticksOf("{ 'class' 'm.s' 'labels' { } 'end' '1970-01-01T00:00:02Z' 'count' 2 } FETCH") ==
      Set(1000000L, 2000000L))
    intercept[Exception] {
      eng.run("{ 'class' 'm.s' 'labels' { } 'end' '1970-01-01T00:00:02Z' } FETCH")
    }
    intercept[Exception] { // start alone: no end and no timespan
      eng.run("{ 'class' 'm.s' 'start' 1 'count' 2 } FETCH")
    }
  }

  test("TIMECLIP: top of stack is a DURATION (now-duration+1 .. now) " +
    "or an ISO-8601 origin (fn/TIMECLIP.java, corrected r11)") {
    // fixture ticks are 1e6..9e6 (seconds 1..9)
    assert(ticksOf("{ 'class' 'm.s' 'labels' { } 'end' 9000000 'count' 9 } FETCH " +
      "4000000 2000000 TIMECLIP") == Set(3000000L, 4000000L))
    // ISO origin form: absolute start, 'now' under it
    assert(ticksOf("{ 'class' 'm.s' 'labels' { } 'end' 9000000 'count' 9 } FETCH " +
      "4000000 '1970-01-01T00:00:03Z' TIMECLIP") ==
      Set(3000000L, 4000000L))
  }

  test("computeTimeRange conformance: start+timespan, swapped bounds, " +
    "duration timespans, 2-of-3 rule (FETCH.java:1607-1740)") {
    // start + timespan: end = start + timespan - 1
    assert(ticksOf("{ 'class' 'm.s' 'labels' { } 'start' 2000000 'timespan' 2000000 } FETCH") ==
      Set(2000000L, 3000000L))
    // inverted explicit bounds swap rather than error
    assert(ticksOf("{ 'class' 'm.s' 'labels' { } 'start' 4000000 'end' 2000000 } FETCH") ==
      Set(2000000L, 3000000L, 4000000L))
    // ISO-8601 duration timespan: PT2S back from end
    assert(ticksOf("{ 'class' 'm.s' 'labels' { } 'end' 9000000 'timespan' 'PT2S' } FETCH") ==
      Set(8000000L, 9000000L))
    // all three of start/end/timespan: "Only 2 out of those 3"
    val ex = intercept[Exception](eng.run(
      "{ 'class' 'm.s' 'labels' { } 'start' 1 'end' 2 'timespan' 3 } FETCH"))
    assert(ex.getMessage.contains("2 out of those 3"), ex.getMessage)
    // timespan 0 at start MIN_VALUE: the -1/+1 edge, like the end side
    intercept[Exception](eng.run(
      s"{ 'class' 'm.s' 'labels' { } 'start' ${Long.MinValue} 'timespan' 0 } FETCH"))
    // count + negative timespan is contradictory (FETCH.java:1293)
    intercept[Exception](eng.run(
      "{ 'class' 'm.s' 'labels' { } 'end' 9000000 'timespan' -2 'count' 1 } FETCH"))
  }
}
