package graft

import graft.operators.GtsFrame
import graft.operators.GtsFrame._

/** Pins the reference MAP window convention (GTSHelper.java:6440-6500):
  * NEGATIVE pre/post = time span relative to the tick, POSITIVE = count
  * of ticks. */
class MapWindowSpec extends SparkSpec {

  private val g = GtsFrame(gtsOf(
    ("m", "u", 10L, 1.0), ("m", "u", 12L, 2.0), ("m", "u", 20L, 4.0),
    ("m", "u", 21L, 8.0)))

  test("negative pre = time window [tick+pre, tick]") {
    // pre=-2: at tick 12 window covers ts in [10,12] → 1+2
    val out = tsv(g.mapWindow(Sum, -2L, 0L).df)
    assert(out === Seq((10L, 1.0), (12L, 3.0), (20L, 4.0), (21L, 12.0)))
  }

  test("positive pre = count window of previous ticks") {
    // pre=1: current + 1 previous tick regardless of time distance
    val out = tsv(g.mapWindow(Sum, 1L, 0L).df)
    assert(out === Seq((10L, 1.0), (12L, 3.0), (20L, 6.0), (21L, 12.0)))
  }

  test("post window (time) looks forward") {
    val out = tsv(g.mapWindow(Sum, 0L, -1L).df)
    assert(out === Seq((10L, 1.0), (12L, 2.0), (20L, 12.0), (21L, 8.0)))
  }

  test("step strides output ticks") {
    val out = tsv(g.mapWindow(Sum, 0L, 0L, step = 2).df)
    assert(out === Seq((10L, 1.0), (20L, 4.0)))
  }

  test("mixed: time look-back + tick-count look-ahead") {
    // pre=-2 (time), post=1 (ticks): at tick 12 → [10,12] + next tick 20
    val out = tsv(g.mapWindow(Sum, -2L, 1L).df)
    assert(out === Seq((10L, 3.0), (12L, 7.0), (20L, 12.0), (21L, 12.0)))
  }

  test("mixed: tick-count look-back + time look-ahead") {
    // pre=1 (tick), post=-1 (time): at 20 → prev tick 12 + [20,21]
    val out = tsv(g.mapWindow(Sum, 1L, -1L).df)
    assert(out === Seq((10L, 1.0), (12L, 3.0), (20L, 14.0), (21L, 12.0)))
  }

  test("mixed windows reject non-decomposable aggregates") {
    intercept[IllegalArgumentException](g.mapWindow(Median, -2L, 1L).df.collect())
  }
}
