package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

/** Pins KernelOps.densify — the r14 FILLVALUE fusion's grid synthesis —
  * against the semantics of GtsFrame.fillValue's grid-sided left join:
  * every grid tick present exactly once, sparse values where the tick
  * matches, the fill constant elsewhere, off-grid sparse ticks dropped.
  */
class GridFillSpec extends AnyFunSuite {

  private def gf(lb: Long, span: Long, n: Int, v: Double) =
    KernelOps.GridFill(lb, span, n, v)

  /** Reference implementation: build the grid, probe a map. */
  private def naive(ticks: Array[Long], vals: Array[Double],
                    g: KernelOps.GridFill): (Array[Long], Array[Double]) = {
    val m = ticks.zip(vals).toMap
    val dt = Array.tabulate(g.count)(i =>
      g.lastbucket - (g.count - 1 - i).toLong * g.span)
    (dt, dt.map(t => m.getOrElse(t, g.value)))
  }

  private def check(ticks: Array[Long], vals: Array[Double],
                    g: KernelOps.GridFill): Unit = {
    val (dt, dv) = KernelOps.densify(ticks, vals, Some(g))
    val (nt, nv) = naive(ticks, vals, g)
    assert(dt.toSeq == nt.toSeq)
    assert(dv.toSeq == nv.toSeq)
  }

  test("None passes through untouched") {
    val t = Array(3L, 5L); val v = Array(1.0, 2.0)
    val (dt, dv) = KernelOps.densify(t, v, None)
    assert((dt eq t) && (dv eq v))
  }

  test("full grid from sparse points, fill at absent buckets") {
    // grid ticks 10,20,30,40,50 (lastbucket 50, span 10, count 5)
    check(Array(20L, 50L), Array(2.5, -1.0), gf(50, 10, 5, 0.0))
  }

  test("empty sparse series becomes an all-fill grid") {
    check(Array.empty[Long], Array.empty[Double], gf(50, 10, 5, 7.0))
  }

  test("dense sparse input is the identity (every bucket present)") {
    check(Array(10L, 20L, 30L), Array(1.0, 2.0, 3.0), gf(30, 10, 3, 0.0))
  }

  test("off-grid ticks are dropped, like the grid-sided left join") {
    // 15 and 55 are not grid ticks; 25 is
    check(Array(15L, 25L, 55L), Array(9.0, 2.0, 9.0), gf(45, 20, 3, 0.0))
  }

  test("NaN values survive as-is (fill only at ABSENT ticks)") {
    val g = gf(30, 10, 3, 0.5)
    val (_, dv) = KernelOps.densify(Array(20L), Array(Double.NaN), Some(g))
    assert(dv(0) == 0.5 && dv(1).isNaN && dv(2) == 0.5)
  }

  test("span 1 hourly-style grid with negative first tick") {
    check(Array(-2L, 0L, 3L), Array(1.0, 2.0, 3.0), gf(3, 1, 8, -4.25))
  }
}
