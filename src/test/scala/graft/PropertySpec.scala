package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.SeriesKernels
import graft.kernels.SeriesKernels.Pt
import graft.sources.GtsCodec
import graft.sources.GtsCodec.Point
import graft.model.GtsType

/** Algebraic-law properties (FIXTURES.md §5c): codec round-trips,
  * bucket-arithmetic invariants, dedup idempotence, kernel bounds —
  * pure-function level so they run fast under ScalaCheck. */
class PropertySpec extends AnyFunSuite {

  /** raw ScalaCheck runner (no scalatestplus bridge in the dep set) */
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val genTs: Gen[Long] = Gen.chooseNum(-1000000000000L, 1000000000000L)

  private val genPoint: Gen[Point] = for {
    ts <- genTs
    hasLoc <- Gen.oneOf(true, false)
    lat <- Gen.chooseNum(-90.0, 90.0)
    lon <- Gen.chooseNum(-180.0, 180.0)
    elev <- Gen.option(Gen.chooseNum(-1000000L, 1000000L))
    value <- Gen.oneOf[Any](
      Gen.chooseNum(Long.MinValue + 1, Long.MaxValue).sample.get,
      Gen.chooseNum(-1e12, 1e12).sample.get,
      Gen.oneOf(true, false).sample.get,
      Gen.alphaNumStr.sample.get)
  } yield value match {
    case l: Long =>
      Point(ts, if (hasLoc) Some(lat) else None, if (hasLoc) Some(lon) else None,
        elev, GtsType.LONG, Some(l), None, None, None, None)
    case d: Double =>
      Point(ts, if (hasLoc) Some(lat) else None, if (hasLoc) Some(lon) else None,
        elev, GtsType.DOUBLE, None, Some(d), None, None, None)
    case b: Boolean =>
      Point(ts, if (hasLoc) Some(lat) else None, if (hasLoc) Some(lon) else None,
        elev, GtsType.BOOLEAN, None, None, Some(b), None, None)
    case s: String =>
      Point(ts, if (hasLoc) Some(lat) else None, if (hasLoc) Some(lon) else None,
        elev, GtsType.STRING, None, None, None, Some(s), None)
  }

  test("codec round-trip: decode(encode(pts)) == pts for any stream") {
    check(Prop.forAll(Gen.listOf(genPoint)) { pts =>
      val back = GtsCodec.decode(GtsCodec.encode(pts))
      back.size == pts.size && back.zip(pts).forall { case (a, b) => a == b }
    })
  }

  test("bucket_end invariants: ts in (end-span, end], end aligned to lastbucket grid") {
    val gen = for {
      ts <- genTs
      lb <- genTs
      span <- Gen.chooseNum(1L, 1000000000L)
    } yield (ts, lb, span)
    check(Prop.forAll(gen) { case (ts, lb, span) =>
      val end = lb - Math.floorDiv(lb - ts, span) * span
      ts > end - span && ts <= end && Math.floorDiv(lb - end, span) * span == lb - end
    })
  }

  test("lttb: keeps endpooints, bounded size, chronological, subset") {
    val gen = for {
      n <- Gen.chooseNum(3, 300)
      th <- Gen.chooseNum(3, 50)
      vs <- Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6))
    } yield (vs.zipWithIndex.map { case (v, i) => Pt(i.toLong, v) }.toIndexedSeq, th)
    check(Prop.forAll(gen) { case (pts, th) =>
      val out = SeriesKernels.lttb(pts, th)
      out.length <= math.max(th, pts.length.min(th)) + (if (th >= pts.length) pts.length else 0) &&
        out.head == pts.head && out.last == pts.last &&
        out.map(_.ts) == out.map(_.ts).sorted &&
        out.forall(pts.contains)
    })
  }

  test("dtw: identity is zero, symmetric, non-negative") {
    val gen = Gen.listOfN(20, Gen.chooseNum(-100.0, 100.0))
      .map(_.toIndexedSeq)
    check(Prop.forAll(gen, gen) { (a, b) =>
      SeriesKernels.dtw(a, a) == 0.0 &&
        SeriesKernels.dtw(a, b) == SeriesKernels.dtw(b, a) &&
        SeriesKernels.dtw(a, b) >= 0.0
    })
  }

  test("banded dtw: full band equals dtw, narrower bands only increase cost") {
    val gen = Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0)).map(_.toIndexedSeq)
    check(Prop.forAll(gen, gen) { (a, b) =>
      val full = SeriesKernels.dtw(a, b)
      SeriesKernels.dtwBanded(a, b, 16) == full &&
        SeriesKernels.dtwBanded(a, b, 15) == full && // w >= max(n,m)-1 covers all cells
        SeriesKernels.dtwBanded(a, b, 2) >= full &&
        SeriesKernels.dtwBanded(a, b, 4) <= SeriesKernels.dtwBanded(a, b, 2)
    })
  }

  test("sax word: length and alphabet bounds, shift-invariant") {
    val gen = for {
      vs <- Gen.listOfN(32, Gen.chooseNum(-100.0, 100.0))
      shift <- Gen.chooseNum(-1000.0, 1000.0)
    } yield (vs.toIndexedSeq, shift)
    check(Prop.forAll(gen) { case (vs, shift) =>
      val w = SeriesKernels.saxWord(vs, 8, 4)
      val ws = SeriesKernels.saxWord(vs.map(_ + shift), 8, 4)
      w.length == 8 && w.forall(c => c >= 'a' && c <= 'd') && w == ws
    })
  }

  test("exp smoothing: output bounded by input range") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))
      .map(_.zipWithIndex.map { case (v, i) => Pt(i.toLong, v) }.toIndexedSeq)
    check(Prop.forAll(gen, Gen.chooseNum(0.01, 0.99)) { (pts, alpha) =>
      val out = SeriesKernels.singleExpSmoothing(pts, alpha)
      val (lo, hi) = (pts.map(_.v).min, pts.map(_.v).max)
      out.forall(p => p.v >= lo - 1e-9 && p.v <= hi + 1e-9)
    })
  }
}
