package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GeoShape, Quaternions}
import graft.kernels.KernelRegistry

/** Round-2 algebraic laws: pigeonhole banding exactness, quaternion
  * quantization bounds, ray-cast vs rectangle membership, kernel
  * weight sanity — pure-function level, no Spark session. */
class PropertySpec2 extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** Pure mirror of TextOps.simhashBlocks' block extraction. */
  private def blocks(sig: Long, bits: Int, nBlocks: Int): Seq[Long] =
    (0 until nBlocks).map { j =>
      val lo = j * bits / nBlocks
      val hi = (j + 1) * bits / nBlocks
      (sig >>> lo) & ((1L << (hi - lo)) - 1)
    }

  test("pigeonhole: hamming <= k implies some of the k+1 blocks is equal") {
    val genSig = Gen.chooseNum(0L, (1L << 32) - 1)
    val genFlips = Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 31)))
    check(Prop.forAll(genSig, genFlips) { (a, flips) =>
      val b = flips.foldLeft(a)((acc, bit) => acc ^ (1L << bit))
      val k = java.lang.Long.bitCount(a ^ b) // <= 8 by construction
      val ba = blocks(a, 32, k + 1)
      val bb = blocks(b, 32, k + 1)
      ba.zip(bb).exists { case (x, y) => x == y }
    })
  }

  test("quaternion pack/unpack error is within one quantization step") {
    val genC = Gen.chooseNum(-1.0, 1.0)
    check(Prop.forAll(genC, genC, genC, genC) { (w, x, y, z) =>
      val norm = math.sqrt(w * w + x * x + y * y + z * z)
      norm < 1e-6 || {
        val q = Quaternions.toQuaternion(w, x, y, z)
        val e = Quaternions.fromQuaternion(q)
        val n = Seq(w / norm, x / norm, y / norm, z / norm)
        e.zip(n).forall { case (got, want) => math.abs(got - want) <= 2.0 / 65535 }
      }
    })
  }

  test("ray-cast containment matches rectangle membership") {
    val genCoord = Gen.chooseNum(-50.0, 50.0)
    val gen = for {
      x1 <- genCoord; y1 <- genCoord
      dx <- Gen.chooseNum(1.0, 40.0); dy <- Gen.chooseNum(1.0, 40.0)
      px <- genCoord; py <- genCoord
    } yield (x1, y1, x1 + dx, y1 + dy, px, py)
    check(Prop.forAll(gen) { case (x1, y1, x2, y2, px, py) =>
      // skip points on the boundary (ray-cast edge semantics are
      // half-open by construction; membership there is convention)
      val onEdge = px == x1 || px == x2 || py == y1 || py == y2
      onEdge || {
        val rect = GeoShape(Seq(Seq((x1, y1), (x2, y1), (x2, y2), (x1, y2))))
        val want = px > x1 && px < x2 && py > y1 && py < y2
        rect.contains(py, px) == want
      }
    })
  }

  test("kernel weights: positive-bounded, symmetric, dyadic for all names") {
    for (name <- KernelRegistry.Names; hw <- Seq(1, 2, 3, 5, 8)) {
      val w = KernelRegistry.weights(name, hw)
      assert(w.size == 2 * hw + 1, name)
      assert(w == w.reverse, name)
      assert(w.forall(x => x >= 0.0 && x <= 1.2), name)
      assert(w.forall(x => x * 1048576.0 == math.rint(x * 1048576.0)), name)
      assert(w.sum > 0.0, name) // renormalization denominator is nonzero
    }
  }

  // pure mirror of StatOps.haarDwt/haarIdwt's lifting cascade
  private def haar(xs: Seq[Double]): (Double, Seq[Seq[Double]]) = {
    var approx = xs; val ds = Seq.newBuilder[Seq[Double]]
    while (approx.length > 1) {
      val p = approx.grouped(2).toSeq
      ds += p.map { case Seq(a, b) => (a - b) / 2.0 }
      approx = p.map { case Seq(a, b) => (a + b) / 2.0 }
    }
    (approx.head, ds.result())
  }
  private def unhaar(a: Double, ds: Seq[Seq[Double]]): Seq[Double] =
    ds.reverse.foldLeft(Seq(a)) { (approx, d) =>
      approx.zip(d).flatMap { case (x, dd) => Seq(x + dd, x - dd) }
    }

  test("Haar lifting: dwt then idwt is the identity BIT-FOR-BIT on integers") {
    val genXs = for {
      lv <- Gen.chooseNum(1, 4)
      xs <- Gen.listOfN(1 << lv, Gen.chooseNum(-1000000L, 1000000L))
    } yield xs.map(_.toDouble)
    check(Prop.forAll(genXs) { xs =>
      val (a, ds) = haar(xs)
      unhaar(a, ds) == xs
    })
  }

  test("D4 weights: dyadic, near-orthonormal, sum ~ sqrt(2)") {
    val h = graft.operators.StatOps.db4Weights
    assert(h.forall(x => x * 1048576.0 == math.rint(x * 1048576.0)))
    assert(math.abs(h.map(x => x * x).sum - 1.0) < 1e-5)
    assert(math.abs(h.sum - math.sqrt(2.0)) < 1e-5)
  }
}
