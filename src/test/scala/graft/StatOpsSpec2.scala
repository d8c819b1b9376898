package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.kernels.SeriesKernels
import graft.model.Gts
import graft.operators.{GtsFrame, StatOps}

/** Goldens for the round-4 declarative stat operators (g81-g84 oracle
  * rows cover them end-to-end vs DuckDB; these pin semantics on values
  * computed by hand). */
class StatOpsSpec2 extends SparkSpec {

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

  test("dft: constant series concentrates all energy in k=0") {
    // 4 points, one per bucket ending at lastbucket=4·span, value 2
    val span = 10L
    val f = frame(Seq(("x", "1", 10L, 2.0), ("x", "1", 20L, 2.0),
      ("x", "1", 30L, 2.0), ("x", "1", 40L, 2.0)))
    val got = StatOps.dft(f, bins = 4, span = span, lastbucket = 40L)
      .select(col("k"), col("re"), col("im"), col("mag")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got(0L)._1 == 8.0 && got(0L)._2 == 0.0 && got(0L)._3 == 8.0)
    // k=1: Σ 2·cos(πn/2) = 2·(1+0−1+0) = 0 with exact dyadic weights
    assert(got(1L)._3 == 0.0 && got(2L)._3 == 0.0 && got(3L)._3 == 0.0)
  }

  test("dft: single impulse has flat magnitude spectrum") {
    // one point in bucket n=0 → |X_k| = |x| for every k
    val f = frame(Seq(("x", "1", 40L, 3.0)))
    val got = StatOps.dft(f, bins = 4, span = 10L, lastbucket = 40L)
      .select(col("k"), col("mag")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 4 && got.values.forall(_ == 3.0))
  }

  test("dftWeights are dyadic with <= 20 fractional bits") {
    val (wc, ws) = StatOps.dftWeights(16)
    (wc ++ ws).foreach { w =>
      val scaled = w * 1048576.0
      assert(scaled == math.rint(scaled), s"non-dyadic weight $w")
      assert(math.abs(w) <= 1.0)
    }
    assert(wc(0) == 1.0 && ws(0) == 0.0 && ws(4) == 1.0) // sin(π/2)
  }

  test("lowess: exactly linear data is reproduced (local line fit)") {
    // y = 10·i: weighted linear fit through any neighborhood is exact
    val pts = (1 to 10).map(i => ("x", "1", i.toLong, 10.0 * i))
    val got = StatOps.lowessFit(frame(pts))
      .select(col("ts"), col("vdouble")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (1 to 10).foreach(i => assert(math.abs(got(i.toLong) - 10.0 * i) < 1e-9,
      s"fit at $i was ${got(i.toLong)}"))
  }

  test("lowess: single-point series falls back to the value") {
    val got = StatOps.lowessFit(frame(Seq(("x", "1", 5L, 7.0)))).collect()
    assert(got.length == 1 && got.head.getAs[Double]("vdouble") == 7.0)
  }

  test("lowess: center weight dominates a spike neighbor") {
    // tricube w(0)=1, w(3)=(1−27/64)³≈0.1929: fit at the spike stays
    // closer to the spike than the plain mean would
    val pts = Seq(("x", "1", 1L, 0.0), ("x", "1", 2L, 0.0), ("x", "1", 3L, 0.0),
      ("x", "1", 4L, 100.0), ("x", "1", 5L, 0.0), ("x", "1", 6L, 0.0),
      ("x", "1", 7L, 0.0))
    val got = StatOps.lowessFit(frame(pts))
      .select(col("ts"), col("vdouble")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(4L) > 100.0 / 7.0, s"spike fit ${got(4L)} not above plain mean")
    assert(math.abs(got(1L)) < 30.0)
  }

  test("saxMotifs: identical shape in two series is a motif; unique shape is not") {
    // two series with the same up-up-up-up window (word by shape), one
    // series with a distinct spike shape appearing once
    val rows =
      (1 to 4).map(i => ("a", "1", i.toLong, 10.0 * i)) ++
      (1 to 4).map(i => ("a", "2", i.toLong, 50.0 * i)) ++
      Seq(("b", "3", 1L, 0.0), ("b", "3", 2L, 100.0), ("b", "3", 3L, 0.0),
        ("b", "3", 4L, 0.0))
    val got = StatOps.saxMotifs(frame(rows), win = 4, alphabet = 4, minSeries = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 1)
    val (word, nSeries, nOcc) = got.head
    assert(nSeries == 2L && nOcc == 2L)
    // strictly increasing z-normalized ramp: letters ascend
    assert(word == "abcd" || word.sorted == word)
  }

  test("dtw kernel matches hand DP on a shifted sequence") {
    val a = IndexedSeq(0.0, 1.0, 2.0, 3.0)
    val b = IndexedSeq(1.0, 2.0, 3.0, 3.0)
    // optimal path warps a's head: |0−1| + 0 + 0 + 0 + 0 = 1
    assert(SeriesKernels.dtw(a, b) == 1.0)
    assert(SeriesKernels.dtw(a, a) == 0.0)
  }
}
