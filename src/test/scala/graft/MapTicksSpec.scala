package graft

import org.apache.spark.sql.functions._

import graft.operators.GtsFrame
import graft.operators.GtsFrame._

/** MAP ticks override + dedup, TIMEMODULO, latency match semantics. */
class MapTicksSpec extends SparkSpec {

  test("mapWindowAtTicks evaluates at the override ticks only") {
    val f = GtsFrame(gtsOf(
      ("m", "u", 10L, 1.0), ("m", "u", 20L, 2.0), ("m", "u", 30L, 4.0),
      ("m", "u", 55L, 8.0)))
    // window (tick-15, tick]: at 30 → {20,30}=6; at 60 → {55}=8; at 90 → null
    val out = f.mapWindowAtTicks(Sum, -15L, Seq(30L, 60L, 90L))
      .select(col("ts"), col("vdouble")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .sortBy(_._1)
    assert(out.toSeq == Seq((30L, Some(6.0)), (60L, Some(8.0)), (90L, None)))
  }

  test("mapWindowAtTicks dedup collapses duplicate output ticks") {
    val f = GtsFrame(gtsOf(("m", "u", 10L, 1.0), ("m", "u", 20L, 2.0)))
    val dup = f.mapWindowAtTicks(Sum, -100L, Seq(20L, 20L, 40L), dedup = false)
    val ded = f.mapWindowAtTicks(Sum, -100L, Seq(20L, 20L, 40L), dedup = true)
    assert(dup.count() == 3 && ded.count() == 2)
    val v = ded.filter(col("ts") === 20L).select("vdouble").head().getDouble(0)
    assert(v == 3.0)
  }

  test("timemodulo folds ticks and carries the quotient label") {
    val f = GtsFrame(gtsOf(
      ("m", "u", 5L, 1.0), ("m", "u", 105L, 2.0), ("m", "u", 207L, 3.0)))
    val out = f.timemodulo(100L, "q").df
      .select(col("ts"), col("labels").getItem("q").as("q"), col("vdouble"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._3)
    assert(out.toSeq == Seq((5L, "0", 1.0), (5L, "1", 2.0), (7L, "2", 3.0)))
    // distinct quotient ⇒ distinct series identity
    val ids = f.timemodulo(100L, "q").df.select("gtsid").distinct().count()
    assert(ids == 3)
  }

  test("latencyMatch pairs equal values within the latency band") {
    val up = GtsFrame(gtsOf(("c", "u", 100L, 7.0), ("c", "u", 500L, 9.0)))
    val down = GtsFrame(gtsOf(
      ("v", "u", 130L, 7.0),  // +30 match
      ("v", "u", 160L, 7.0),  // +60 match
      ("v", "u", 90L, 7.0),   // before uplink: no
      ("v", "u", 700L, 8.0))) // wrong value: no
    val out = up.latencyMatch(down, Seq("user"), 1L, 100L)
      .select(col("ts"), col("n_matches"), col("min_latency"), col("max_latency"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((100L, 2L, 30L, 60L)))
  }
}
