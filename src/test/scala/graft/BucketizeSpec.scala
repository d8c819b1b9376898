package graft

import org.apache.spark.sql.functions.col

import graft.operators.GtsFrame
import graft.operators.GtsFrame._

/** Pins the reference BUCKETIZE semantics (GTSHelper.java:2261-2358):
  * buckets are LEFT-OPEN RIGHT-CLOSED intervals ENDING at
  * lastbucket − k·span; result tick = bucket end; auto-computation of
  * lastbucket/span/count when 0.
  */
class BucketizeSpec extends SparkSpec {

  test("end-anchored right-closed buckets") {
    // span=10, lastbucket=100: bucket 0 = (90,100], bucket 1 = (80,90]
    val g = GtsFrame(gtsOf(
      ("m", "u", 100L, 1.0), // → bucket end 100
      ("m", "u", 91L, 2.0),  // → (90,100] → 100
      ("m", "u", 90L, 4.0),  // → (80,90]  → 90 (right-closed!)
      ("m", "u", 81L, 8.0),  // → 90
      ("m", "u", 105L, 99.0) // beyond lastbucket → dropped
    ))
    val out = tsv(g.bucketize(Sum, 100L, 10L).df)
    assert(out === Seq((90L, 12.0), (100L, 3.0)))
  }

  test("bucketcount limits the window") {
    val g = GtsFrame(gtsOf(
      ("m", "u", 100L, 1.0),
      ("m", "u", 95L, 2.0),
      ("m", "u", 85L, 4.0),
      ("m", "u", 75L, 8.0))) // older than lastbucket-2*span → dropped
    val out = tsv(g.bucketize(Sum, 100L, 10L, bucketcount = 2).df)
    assert(out === Seq((90L, 4.0), (100L, 3.0)))
  }

  test("auto span from count (GTSHelper.java:2261-2358)") {
    // ticks 1..10, lastbucket=0,count=5 → lastbucket←10,
    // span←ceil((10-1+1)/5)=2, buckets (8,10],(6,8],...
    val g = GtsFrame(gtsOf((1L to 10L).map(t => ("m", "u", t, 1.0)): _*))
    val out = tsv(g.bucketizeAuto(Sum, 0L, 0L, 5L).df)
    assert(out === Seq((2L, 2.0), (4L, 2.0), (6L, 2.0), (8L, 2.0), (10L, 2.0)))
  }

  test("auto count from span aligns lastbucket UP to a span boundary " +
    "(GTSHelper.java:2341-2349, zeroLastBucket && zeroBucketcount)") {
    // ticks 1..10, span=3: lastbucket←10, count←1+(10-1)/3=4, then the
    // both-were-zero alignment bumps lastbucket to 12 (10%3=1≠0); the
    // widened window's oldest edge 12-4·3=0 < firsttick 1, so the
    // count stays 4. Buckets end 12,9,6,3.
    val g = GtsFrame(gtsOf((1L to 10L).map(t => ("m", "u", t, 1.0)): _*))
    val out = tsv(g.bucketizeAuto(Sum, 0L, 3L, 0L).df)
    assert(out === Seq((3L, 3.0), (6L, 3.0), (9L, 3.0), (12L, 1.0)))
  }

  test("auto span that divides the delta exactly STAYS, dropping the " +
    "oldest ticks (GTSHelper.java:2294-2312 — floor-then-bump, not ceil)") {
    // ticks 1..12, lastbucket=12, count=5: delta=12, q=⌊12/5⌋=2 and
    // 12%2==0 so span stays 2 — count·span=10 < 12, ticks 1,2 drop
    val g = GtsFrame(gtsOf((1L to 12L).map(t => ("m", "u", t, 1.0)): _*))
    val out = tsv(g.bucketizeAuto(Sum, 12L, 0L, 5L).df)
    assert(out === Seq((4L, 2.0), (6L, 2.0), (8L, 2.0), (10L, 2.0), (12L, 2.0)))
  }

  test("bucketspan -1 spreads count-1 spans over the OPEN delta " +
    "(GTSHelper.java:2295-2305)") {
    // ticks 1..10, lastbucket=10, count=4, span=-1: delta=10-1=9,
    // q=⌊9/3⌋=3 divides → span 3; buckets end 10,7,4,1
    val g = GtsFrame(gtsOf((1L to 10L).map(t => ("m", "u", t, 1.0)): _*))
    val out = tsv(g.bucketizeAuto(Sum, 10L, -1L, 4L).df)
    assert(out === Seq((1L, 1.0), (4L, 3.0), (7L, 3.0), (10L, 3.0)))
    // span=0 same setup: delta=10, q=⌊10/4⌋=2 divides → span 2,
    // window (2,10], ticks 1-2 drop — the two forms genuinely differ
    val out0 = tsv(g.bucketizeAuto(Sum, 10L, 0L, 4L).df)
    assert(out0 === Seq((4L, 2.0), (6L, 2.0), (8L, 2.0), (10L, 2.0)))
  }

  test("auto params resolve PER GTS, each against its own extent " +
    "(the reference bucketizes one series at a time)") {
    val g = GtsFrame(gtsOf(
      ((1L to 4L).map(t => ("m", "u1", t, 1.0)) ++
        (11L to 14L).map(t => ("m", "u2", t, 1.0))): _*))
    val out = g.bucketizeAuto(Sum, 0L, 0L, 2L).df
      .select(col("labels").getItem("user"), col("ts"), col("vdouble"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
    // u1: lb=4, delta=4, span=⌊4/2⌋=2 → buckets 2,4; u2: lb=14 → 12,14
    assert(out === Seq(("u1", 2L, 2.0), ("u1", 4L, 2.0),
      ("u2", 12L, 2.0), ("u2", 14L, 2.0)))
  }

  test("mean/min/max/first/last/delta bucketizers") {
    val g = GtsFrame(gtsOf(
      ("m", "u", 95L, 4.0), ("m", "u", 97L, 1.0), ("m", "u", 100L, 7.0)))
    assert(tsv(g.bucketize(Mean, 100L, 10L).df) === Seq((100L, 4.0)))
    assert(tsv(g.bucketize(Min, 100L, 10L).df) === Seq((100L, 1.0)))
    assert(tsv(g.bucketize(Max, 100L, 10L).df) === Seq((100L, 7.0)))
    assert(tsv(g.bucketize(First, 100L, 10L).df) === Seq((100L, 4.0)))
    assert(tsv(g.bucketize(Last, 100L, 10L).df) === Seq((100L, 7.0)))
    assert(tsv(g.bucketize(Delta, 100L, 10L).df) === Seq((100L, 3.0)))
  }
}
