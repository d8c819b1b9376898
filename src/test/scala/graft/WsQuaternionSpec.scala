package graft

import graft.functions.Quaternions
import graft.script.WarpScriptEngine

/** Quaternion words vs the driver-side Quaternions algebra (itself
  * oracle-gated via q01/w63 SQL twins). */
class WsQuaternionSpec extends SparkSpec {

  private def eng = new WarpScriptEngine(
    fetch = (_, _, _, _) => throw new UnsupportedOperationException("no storage"),
    nowTs = 0L, session = Some(spark))

  private def top(p: String): Any = eng.run(p).head

  test("->Q packs and Q-> unpacks the reference 4x16-bit layout") {
    val q = Quaternions.toQuaternion(1.0, 0.05, 0.1, 0.15)
    assert(top("1.0 0.05 0.1 0.15 ->Q") == q)
    val st = eng.run(s"$q Q->")
    val e = Quaternions.fromQuaternion(q)
    // stack head = top = z
    assert(st(0) == e(3) && st(1) == e(2) && st(2) == e(1) && st(3) == e(0))
  }

  test("QCONJUGATE / QMULTIPLY / QDIVIDE match the algebra") {
    val q = Quaternions.toQuaternion(1.0, 0.05, 0.1, 0.15)
    val r = Quaternions.RotQ
    assert(top(s"$q QCONJUGATE") == Quaternions.conjugate(q))
    assert(top(s"$q $r QMULTIPLY") == Quaternions.multiply(q, r))
    assert(top(s"$q $r QDIVIDE") == Quaternions.divide(q, r))
  }

  test("QROTATE rotates a vector; identity quaternion is a no-op") {
    val id = Quaternions.toQuaternion(1.0, 0.0, 0.0, 0.0)
    val st = eng.run(s"0.5 0.25 0.125 $id QROTATE")
    // unit w=1 quantizes to exactly 1.0 so rotation is identity
    assert(math.abs(st(2).asInstanceOf[Double] - 0.5) < 1e-4)
    assert(math.abs(st(1).asInstanceOf[Double] - 0.25) < 1e-4)
    assert(math.abs(st(0).asInstanceOf[Double] - 0.125) < 1e-4)
  }

  test("ROTATIONQ / QROTATION round-trip axis and angle") {
    // 90 degrees about z
    val st = eng.run("0.0 0.0 1.0 90.0 ROTATIONQ QROTATION")
    assert(math.abs(st(0).asInstanceOf[Double] - 90.0) < 0.1) // angle
    assert(math.abs(st(1).asInstanceOf[Double] - 1.0) < 1e-3) // z axis
    assert(math.abs(st(2).asInstanceOf[Double]) < 1e-3) // y
    assert(math.abs(st(3).asInstanceOf[Double]) < 1e-3) // x
  }

  test("ROTATIONQ rotates as expected: 90 deg about z (passive) maps x to -y") {
    // QROTATE.java's matrix is the passive (frame-rotation) convention:
    // +90 deg about z sends the x axis to -y
    val st = eng.run("1.0 0.0 0.0  0.0 0.0 1.0 90.0 ROTATIONQ QROTATE")
    assert(math.abs(st(2).asInstanceOf[Double]) < 1e-3) // x' ~ 0
    assert(math.abs(st(1).asInstanceOf[Double] + 1.0) < 1e-3) // y' ~ -1
    assert(math.abs(st(0).asInstanceOf[Double]) < 1e-3) // z' ~ 0
  }
}
