package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector/matrix suite (reference fn/TOVEC.java, TOMAT.java,
  * TRANSPOSE.java, TR.java, DET.java, INV.java and the matrix overloads
  * of binary ADD/SUB/MUL — commons-math3 RealMatrix under the hood).
  *
  * Spark-first: a vector is an `array<double>` column, a matrix an
  * `array<array<double>>` (row-major). The algebra is expressed with
  * higher-order functions (transform/sequence/aggregate), so it is
  * dimension-generic and fully declarative — no UDF, no collect.
  * DET/INV are not expressible as builtins for general n, so they run
  * as commons-math3 calls inside per-row kernels (spec-gated, like the
  * reference which delegates to commons-math3 LUDecomposition).
  */
object MatrixOps {

  // ---- vectors ----

  def vecAdd(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)
  def vecSub(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x - y)
  def vecScale(a: Column, k: Column): Column = transform(a, x => x * k)
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  def norm2(a: Column): Column = sqrt(dot(a, a))

  // ---- matrices (row-major array<array<double>>) ----

  /** TRANSPOSE.java — dims read from the data. */
  def transposeM(m: Column): Column =
    transform(sequence(lit(0), size(element_at(m, 1)) - 1), j =>
      transform(sequence(lit(0), size(m) - 1), i =>
        element_at(element_at(m, i + 1), j + 1)))

  /** Matrix product (binary MUL.java matrix overload):
    * (m×k)·(k×n) → m×n. */
  def matmul(a: Column, b: Column): Column =
    transform(sequence(lit(0), size(a) - 1), i =>
      transform(sequence(lit(0), size(element_at(b, 1)) - 1), j =>
        aggregate(sequence(lit(0), size(b) - 1), lit(0.0), (acc, k) =>
          acc + element_at(element_at(a, i + 1), k + 1) *
            element_at(element_at(b, k + 1), j + 1))))

  /** Matrix-vector product: (m×k)·k → m. */
  def matvec(a: Column, v: Column): Column =
    transform(a, row => dot(row, v))

  def matAdd(a: Column, b: Column): Column =
    zip_with(a, b, (ra, rb) => vecAdd(ra, rb))

  /** TR.java — trace. */
  def trace(m: Column): Column =
    aggregate(sequence(lit(0), least(size(m), size(element_at(m, 1))) - 1),
      lit(0.0), (acc, i) => acc + element_at(element_at(m, i + 1), i + 1))

  /** Matrix element (1-based), for flattening results into scalar
    * outputs. */
  def at(m: Column, i: Int, j: Int): Column =
    element_at(element_at(m, i), j)

  // ---- driver/kernel-side (commons-math3, like the reference) ----

  def det(m: Array[Array[Double]]): Double =
    new org.apache.commons.math3.linear.LUDecomposition(
      org.apache.commons.math3.linear.MatrixUtils.createRealMatrix(m))
      .getDeterminant

  def inv(m: Array[Array[Double]]): Array[Array[Double]] =
    org.apache.commons.math3.linear.MatrixUtils.inverse(
      org.apache.commons.math3.linear.MatrixUtils.createRealMatrix(m)).getData
}
