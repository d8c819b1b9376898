package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Quaternion suite (reference fn/TOQUATERNION.java, QUATERNIONTO.java,
  * QCONJUGATE.java, QMULTIPLY.java, QDIVIDE.java, QROTATE.java,
  * QROTATION.java): unit quaternions packed into one 64-bit long — four
  * 16-bit components quantized as floor((c+1)/2·65535)
  * (TOQUATERNION.java:97-111) — with Hamilton algebra on the unpacked
  * doubles.
  *
  * Twin forms like [[GeoShape]]: driver-side Scala, codegen'd Column
  * expressions, and DuckDB SQL strings built from the SAME formulas.
  * All packing arithmetic is IEEE-exact or correctly rounded (sqrt,
  * divisions), so packed values are bit-identical cross-engine; only
  * QROTATION's acos/sin (axis-angle extraction) is JVM-libm sensitive
  * and stays spec-gated.
  */
object Quaternions {

  /** A fixed rotation quaternion used by the oracle-gated query pack
    * (normalized (0.7, 0.1, 0.2, 0.3), packed). */
  lazy val RotQ: Long = toQuaternion(0.7, 0.1, 0.2, 0.3)

  // ---- driver-side (exact mirror of the reference) ----

  def toQuaternion(w0: Double, x0: Double, y0: Double, z0: Double): Long = {
    val norm = math.sqrt(w0 * w0 + x0 * x0 + y0 * y0 + z0 * z0)
    val (w, x, y, z) =
      if (norm != 0.0) (w0 / norm, x0 / norm, y0 / norm, z0 / norm)
      else (w0, x0, y0, z0)
    def qz(c: Double): Long = math.floor(((c + 1.0) / 2.0) * 65535).toLong
    (qz(w) << 48) | (qz(x) << 32) | (qz(y) << 16) | qz(z)
  }

  def fromQuaternion(q: Long): Array[Double] = {
    def c(shift: Int): Double = 2.0 * (((q >>> shift) & 0xffffL) / 65535.0) - 1.0
    Array(c(48), c(32), c(16), c(0))
  }

  def conjugate(q: Long): Long = {
    val e = fromQuaternion(q)
    toQuaternion(e(0), -e(1), -e(2), -e(3))
  }

  /** Hamilton product, operand order per QMULTIPLY.java:54-57. */
  def multiply(qq: Long, rr: Long): Long = {
    val q = fromQuaternion(qq); val r = fromQuaternion(rr)
    toQuaternion(
      r(0) * q(0) - r(1) * q(1) - r(2) * q(2) - r(3) * q(3),
      r(0) * q(1) + r(1) * q(0) - r(2) * q(3) + r(3) * q(2),
      r(0) * q(2) + r(1) * q(3) + r(2) * q(0) - r(3) * q(1),
      r(0) * q(3) - r(1) * q(2) + r(2) * q(1) + r(3) * q(0))
  }

  /** QDIVIDE: multiply by the conjugate (unit quaternions). */
  def divide(q: Long, r: Long): Long = multiply(q, conjugate(r))

  /** Rotate vector (x,y,z) by quaternion q (QROTATE.java:56-58). */
  def rotate(x: Double, y: Double, z: Double, qq: Long): (Double, Double, Double) = {
    val q = fromQuaternion(qq)
    ((1.0 - 2.0 * q(2) * q(2) - 2.0 * q(3) * q(3)) * x + 2.0 * (q(1) * q(2) + q(0) * q(3)) * y + 2.0 * (q(1) * q(3) - q(0) * q(2)) * z,
     2.0 * (q(1) * q(2) - q(0) * q(3)) * x + (1.0 - 2.0 * q(1) * q(1) - 2.0 * q(3) * q(3)) * y + 2.0 * (q(2) * q(3) + q(0) * q(1)) * z,
     2.0 * (q(1) * q(3) + q(0) * q(2)) * x + 2.0 * (q(2) * q(3) - q(0) * q(1)) * y + (1.0 - 2.0 * q(1) * q(1) - 2.0 * q(2) * q(2)) * z)
  }

  /** QROTATION: axis + angle (degrees) from a unit quaternion —
    * acos/sin based, spec-gated (not oracle-reproducible). */
  def rotation(qq: Long): (Double, Double, Double, Double) = {
    val q = fromQuaternion(qq)
    val angle = math.acos(q(0))
    val s = math.sin(angle)
    val (x, y, z) =
      if (s != 0.0) (q(1) / s, q(2) / s, q(3) / s) else (q(1), q(2), q(3))
    (x, y, z, math.toDegrees(angle * 2.0))
  }

  // ---- Column form (codegen'd; same formulas) ----

  def packQCol(w: Column, x: Column, y: Column, z: Column): Column = {
    val norm = sqrt(w * w + x * x + y * y + z * z)
    def n(c: Column) = when(norm =!= 0.0, c / norm).otherwise(c)
    def qz(c: Column) = floor(((n(c) + 1.0) / 2.0) * 65535).cast("long")
    shiftleft(qz(w), 48).bitwiseOR(shiftleft(qz(x), 32))
      .bitwiseOR(shiftleft(qz(y), 16)).bitwiseOR(qz(z))
  }

  def componentCol(q: Column, idx: Int): Column = {
    val shift = 48 - 16 * idx
    lit(2.0) * (shiftrightunsigned(q, shift).bitwiseAND(lit(0xffffL)) / 65535.0) - 1.0
  }

  def conjugateCol(q: Column): Column =
    packQCol(componentCol(q, 0), -componentCol(q, 1),
      -componentCol(q, 2), -componentCol(q, 3))

  def multiplyCol(qq: Column, rr: Column): Column = {
    val q = (0 to 3).map(componentCol(qq, _))
    val r = (0 to 3).map(componentCol(rr, _))
    packQCol(
      r(0) * q(0) - r(1) * q(1) - r(2) * q(2) - r(3) * q(3),
      r(0) * q(1) + r(1) * q(0) - r(2) * q(3) + r(3) * q(2),
      r(0) * q(2) + r(1) * q(3) + r(2) * q(0) - r(3) * q(1),
      r(0) * q(3) - r(1) * q(2) + r(2) * q(1) + r(3) * q(0))
  }

  // ---- DuckDB SQL form (same formulas, for oracles) ----

  def packQSql(w: String, x: String, y: String, z: String): String = {
    val norm = s"sqrt(($w)*($w) + ($x)*($x) + ($y)*($y) + ($z)*($z))"
    def n(c: String) = s"(CASE WHEN $norm <> 0.0 THEN ($c) / $norm ELSE ($c) END)"
    def qz(c: String) = s"CAST(floor(((${n(c)} + 1.0) / 2.0) * 65535) AS BIGINT)"
    // DuckDB raises on << into the sign bit, so the top component packs
    // via two's-complement arithmetic — same bit pattern as the JVM long
    val iw = qz(w)
    s"((CASE WHEN $iw >= 32768 THEN $iw - 65536 ELSE $iw END) * 281474976710656 + " +
      s"${qz(x)} * 4294967296 + ${qz(y)} * 65536 + ${qz(z)})"
  }

  def componentSql(q: String, idx: Int): String = {
    val shift = 48 - 16 * idx
    s"(2.0 * ((($q >> $shift) & 65535) / 65535.0) - 1.0)"
  }

  /** Hamilton product over component expressions q0..q3 / r0..r3
    * (same layout as [[multiplyCol]]). */
  def multiplySql(q: IndexedSeq[String], r: IndexedSeq[String]): String =
    packQSql(
      s"${r(0)}*${q(0)} - ${r(1)}*${q(1)} - ${r(2)}*${q(2)} - ${r(3)}*${q(3)}",
      s"${r(0)}*${q(1)} + ${r(1)}*${q(0)} - ${r(2)}*${q(3)} + ${r(3)}*${q(2)}",
      s"${r(0)}*${q(2)} + ${r(1)}*${q(3)} + ${r(2)}*${q(0)} - ${r(3)}*${q(1)}",
      s"${r(0)}*${q(3)} - ${r(1)}*${q(2)} + ${r(2)}*${q(1)} + ${r(3)}*${q(0)}")
}
