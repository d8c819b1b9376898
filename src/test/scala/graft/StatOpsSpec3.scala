package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Gts
import graft.operators.{GtsFrame, StatOps}

/** Hand-derived goldens for the pack-9 stat operators (g89-g94 cover
  * them end-to-end vs DuckDB; these pin semantics on tiny inputs). */
class StatOpsSpec3 extends SparkSpec {

  private def frame(rows: Seq[(String, String, Long, Double)]) = {
    import spark.implicits._
    GtsFrame(Gts.canonical(rows
      .map { case (c, u, t, v) => (c, Map("user" -> u), t, v) }
      .toDF("class", "labels", "ts", "vdouble")
      .withColumn("lat", lit(null).cast(DoubleType))
      .withColumn("lon", lit(null).cast(DoubleType))
      .withColumn("elev", lit(null).cast(LongType))
      .withColumn("vtype", lit(graft.model.GtsType.DOUBLE).cast(ByteType))
      .withColumn("vlong", lit(null).cast(LongType))
      .withColumn("vbool", lit(null).cast(BooleanType))
      .withColumn("vstring", lit(null).cast(StringType))
      .withColumn("vbinary", lit(null).cast(BinaryType))))
  }

  test("linReg: exact slope/intercept on a perfect line; degenerate dropped") {
    // x = lastbucket − ts (span 1); v = 2x + 3
    val f = frame(Seq(("x", "1", 9L, 5.0), ("x", "1", 8L, 7.0),
      ("x", "1", 7L, 9.0),
      ("x", "2", 9L, 1.0))) // single point → den = 0 → dropped
    val got = StatOps.linReg(f, 1L, 10L).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 3.0)
  }

  test("momentStats: symmetric series has zero skew, kurtosis m4/m2^2") {
    val f = frame(Seq(("x", "1", 1L, 1.0), ("x", "1", 2L, 2.0),
      ("x", "1", 3L, 3.0)))
    val r = StatOps.momentStats(f).collect().head
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("sum") == 6.0)
    assert(r.getAs[Double]("sumsq") == 14.0)
    // the closed-form trees round at each /n division — the contract is
    // cross-engine determinism (identical trees), not exactness
    assert(math.abs(r.getAs[Double]("skewness")) < 1e-12)
    // m2 = 2/3, m4 = 2/3 → kurt = (2/3)/(4/9) = 1.5
    assert(math.abs(r.getAs[Double]("kurtosis") - 1.5) < 1e-12)
  }

  test("haarDwt: ramp 0..7 decomposes to the known lifting coefficients") {
    val pts = (0 to 7).map(i => ("x", "1", i.toLong, i.toDouble))
    val r = StatOps.haarDwt(frame(pts), 3, 1L, 7L).collect().head
    assert(r.getAs[Double]("a3") == 3.5)
    assert(r.getAs[Double]("d3_1") == -2.0)
    assert(r.getAs[Double]("d2_1") == -1.0 && r.getAs[Double]("d2_2") == -1.0)
    Seq("d1_1", "d1_2", "d1_3", "d1_4").foreach(c =>
      assert(r.getAs[Double](c) == -0.5))
    // constant series: pure approximation, zero details
    val c = StatOps.haarDwt(frame((0 to 7).map(i =>
      ("x", "2", i.toLong, 4.0))), 3, 1L, 7L).collect().head
    assert(c.getAs[Double]("a3") == 4.0 && c.getAs[Double]("d3_1") == 0.0)
  }

  test("saxDiscords: unique word in one series found; shared word excluded") {
    def ramp(u: String) = (0 to 4).map(i => ("x", u, i.toLong, i * 10.0))
    val spike = Seq(("x", "3", 0L, 0.0), ("x", "3", 1L, 0.0),
      ("x", "3", 2L, 100.0), ("x", "3", 3L, 0.0), ("x", "3", 4L, 0.0))
    val f = frame(ramp("1") ++ ramp("2") ++ spike)
    val got = StatOps.saxDiscords(f, 5, 4, 2).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Map[String, String]]("labels")("user") == "3")
  }

  test("esdFlagLongKernel agrees with the double-path esdFlag on small ints") {
    // where double arithmetic is exact (cents-scale), the Long/BigInt
    // kernel must reproduce the original kernel's flag set exactly
    val vals = Seq(3.0, 7.0, 7.0, 8.0, 6.0, 250.0, 5.0, 9.0, 4.0, 180.0)
    val f = frame(vals.zipWithIndex.map { case (v, i) =>
      ("x", "1", (i + 1).toLong, v)
    })
    val lams = StatOps.lambdas(0.05, 64)
    val a = StatOps.esdFlag(f, 3, 0.05).collect()
      .map(r => (r.getAs[Long]("ts"), r.getAs[Int]("round"))).toSet
    import spark.implicits._
    val df = vals.zipWithIndex
      .map { case (v, i) => (1L, (i + 1).toLong, v.toLong) }
      .toDF("gtsid", "ts", "v")
    val b = StatOps.esdFlagLongKernel(df, 3, lams).collect()
      .map(r => (r.getAs[Long]("ts"), r.getAs[Int]("round"))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("esdFlagLongKernel: large-square values flagged with exact sums") {
    import spark.implicits._
    // values whose squares exceed 2^53 — the Long/BigInt path's reason
    val base = 200000000L
    val rows = Seq((1L, 1L, base), (1L, 2L, base + 1), (1L, 3L, base - 1),
      (1L, 4L, base + 2), (1L, 5L, base + 500000000L))
    val df = rows.toDF("gtsid", "ts", "v")
    val lams = StatOps.lambdasAt(0.05, Seq(3, 4, 5))
    val got = StatOps.esdFlagLongKernel(df, 1, lams).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("ts") == 5L)
  }
}
