package graft

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

  test("auto count from span") {
    // ticks 1..10, span=3, lastbucket←10 → count = 1+(10-1)/3 = 4
    // buckets: (7,10] sum 3, (4,7] sum 3, (1,4] sum 3, (-2,1] sum 1
    val g = GtsFrame(gtsOf((1L to 10L).map(t => ("m", "u", t, 1.0)): _*))
    val out = tsv(g.bucketizeAuto(Sum, 0L, 3L, 0L).df)
    assert(out === Seq((1L, 1.0), (4L, 3.0), (7L, 3.0), (10L, 3.0)))
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
