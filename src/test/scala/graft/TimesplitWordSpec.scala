package graft

import org.apache.spark.sql.functions._

import graft.operators.GtsFrame
import graft.script.WarpScriptEngine

/** TIMESPLIT word — the reference's 3-parameter form (fn/TIMESPLIT
  * .java; GTSHelper.timesplit:6042-6117): gts quietperiod minvalues
  * label TIMESPLIT. Splits on gaps >= quietperiod, labels sub-series
  * "1","2",…, drops sub-series under minvalues, and passes through a
  * series that already carries the label. */
class TimesplitWordSpec extends SparkSpec {

  // gaps: 5 (no split at quiet=10), 10 (split — >= boundary), 30 (split)
  private def frame = GtsFrame(gtsOf(
    ("m", "a", 0L, 1.0), ("m", "a", 5L, 2.0), ("m", "a", 15L, 3.0),
    ("m", "a", 45L, 4.0)))

  private def eng(f: GtsFrame) = new WarpScriptEngine(
    fetch = (cls, labels, a, b) => f.select(cls, labels).timeclip(a, b),
    nowTs = 0L, session = Some(spark))

  private def rows(f: GtsFrame, prog: String): Seq[(String, Long)] =
    eng(f).runToFrame(prog)
      .select(col("labels").getItem("seg"), col("ts"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq

  test("splits on gaps >= quietperiod (the reference's boundary), " +
    "session ids 1,2,... land in the label") {
    val got = rows(frame,
      "[ '' '~.*' { } 1000 1001 ] FETCH 10 1 'seg' TIMESPLIT")
    assert(got == Seq(("1", 0L), ("1", 5L), ("2", 15L), ("3", 45L)))
  }

  test("sub-series with fewer than minvalues points are dropped") {
    val got = rows(frame,
      "[ '' '~.*' { } 1000 1001 ] FETCH 10 2 'seg' TIMESPLIT")
    assert(got == Seq(("1", 0L), ("1", 5L)))
  }

  test("a series already carrying the label passes through unchanged") {
    val pre = GtsFrame(gtsOf(("m", "a", 0L, 1.0), ("m", "a", 50L, 2.0)))
    // pre-label it via the engine's RELABEL, then TIMESPLIT on 'user'
    // (which every series carries) — no split, no error
    val got = eng(pre).runToFrame(
      "[ '' '~.*' { } 1000 1001 ] FETCH 10 1 'user' TIMESPLIT")
      .select(col("labels").getItem("user"), col("ts"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq(("a", 0L), ("a", 50L)))
  }
}
