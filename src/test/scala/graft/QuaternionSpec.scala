package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Quaternions._

/** Quaternion algebra invariants over the reference's packed-long form. */
class QuaternionSpec extends SparkSpec {

  private val eps = 2.5e-5 // 16-bit quantization step is ~3e-5 per component

  test("pack/unpack round-trips within quantization error") {
    val q = toQuaternion(0.5, 0.5, 0.5, 0.5)
    val e = fromQuaternion(q)
    e.foreach(c => assert(math.abs(c - 0.5) < eps))
  }

  test("identity quaternion multiplies neutrally") {
    val id = toQuaternion(1.0, 0.0, 0.0, 0.0)
    val q = toQuaternion(0.7, 0.1, 0.2, 0.3)
    val p = multiply(q, id)
    (fromQuaternion(p), fromQuaternion(q)).zipped
      .foreach((a, b) => assert(math.abs(a - b) < 2 * eps))
  }

  test("q times its conjugate is the identity rotation") {
    val q = toQuaternion(0.7, 0.1, 0.2, 0.3)
    val p = fromQuaternion(divide(q, q)) // q * conj(q)
    assert(math.abs(p(0) - 1.0) < 2 * eps)
    (1 to 3).foreach(i => assert(math.abs(p(i)) < 2 * eps))
  }

  test("rotation about z by 90 degrees maps x-axis to -y (reference's passive convention)") {
    val half = math.toRadians(45) // half angle
    val q = toQuaternion(math.cos(half), 0.0, 0.0, math.sin(half))
    val (vx, vy, vz) = rotate(1.0, 0.0, 0.0, q)
    // QROTATE.java:56-58 applies the TRANSPOSED rotation matrix (frame
    // rotation), so the x-axis lands on -y
    assert(math.abs(vx) < 1e-3 && math.abs(vy + 1.0) < 1e-3 && math.abs(vz) < 1e-3)
    val (ax, ay, az, deg) = rotation(q)
    assert(math.abs(az - 1.0) < 1e-3 && math.abs(deg - 90.0) < 0.1)
    assert(math.abs(ax) < 1e-3 && math.abs(ay) < 1e-3)
  }

  test("Column form agrees with driver form bit-for-bit") {
    import spark.implicits._
    val rows = Seq((0.7, 0.1, 0.2, 0.3), (0.1, -0.9, 0.3, 0.2), (1.0, 0.0, 0.0, 0.0))
    val df = rows.toDF("w", "x", "y", "z")
      .select(packQCol(col("w"), col("x"), col("y"), col("z")).as("q"))
    val got = df.collect().map(_.getLong(0))
    val want = rows.map { case (w, x, y, z) => toQuaternion(w, x, y, z) }
    assert(got.toSeq == want)
    val gotMul = df.select(multiplyCol(col("q"), lit(RotQ))).collect().map(_.getLong(0))
    val wantMul = want.map(multiply(_, RotQ))
    assert(gotMul.toSeq == wantMul)
  }
}
