package graft

import org.apache.spark.sql.functions._

import graft.functions.MatrixOps._

/** Vector/matrix algebra laws over array columns. */
class MatrixSpec extends SparkSpec {

  private def mat(rows: Seq[Seq[Double]]) =
    array(rows.map(r => array(r.map(lit): _*)): _*)

  test("matmul matches hand computation and is dimension-generic") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    // (2x3)·(3x2) = 2x2
    val a = mat(Seq(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)))
    val b = mat(Seq(Seq(7.0, 8.0), Seq(9.0, 10.0), Seq(11.0, 12.0)))
    val m = df.select(matmul(a, b).as("m"))
      .select(at(col("m"), 1, 1), at(col("m"), 1, 2),
        at(col("m"), 2, 1), at(col("m"), 2, 2)).head()
    assert((m.getDouble(0), m.getDouble(1), m.getDouble(2), m.getDouble(3)) ==
      (58.0, 64.0, 139.0, 154.0))
  }

  test("transpose, trace, matvec, vector ops") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    val a = mat(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    val r = df.select(
      at(transposeM(a), 1, 2).as("t12"),
      trace(a).as("tr"),
      element_at(matvec(a, array(lit(10.0), lit(100.0))), 1).as("mv1"),
      dot(array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0))).as("d"),
      element_at(vecAdd(array(lit(1.0)), array(lit(2.0))), 1).as("va"),
      norm2(array(lit(3.0), lit(4.0))).as("n")).head()
    assert(r.getDouble(0) == 3.0) // transpose [1][2] = a[2][1]
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == 210.0)
    assert(r.getDouble(3) == 11.0)
    assert(r.getDouble(4) == 3.0)
    assert(r.getDouble(5) == 5.0)
  }

  test("det and inv via commons-math3 (the reference's own backend)") {
    val m = Array(Array(4.0, 7.0), Array(2.0, 6.0))
    assert(math.abs(det(m) - 10.0) < 1e-12)
    val i = inv(m)
    assert(math.abs(i(0)(0) - 0.6) < 1e-12 && math.abs(i(0)(1) + 0.7) < 1e-12)
    assert(math.abs(i(1)(0) + 0.2) < 1e-12 && math.abs(i(1)(1) - 0.4) < 1e-12)
  }
}
