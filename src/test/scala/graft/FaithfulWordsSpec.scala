package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Gts
import graft.operators.GtsFrame
import graft.script.WarpScriptEngine

/** Round-11 word-fidelity goldens: COMPACT vs RANGECOMPACT edge
  * semantics (GTSHelper.compact), the CORRELATE lag word
  * (continuum/gts/CORRELATE.java), VALUEHISTOGRAM's bucketized null
  * count, and MUSIGMA's exact-BigDecimal arithmetic — including the
  * reference's scale-limited HALF_UP divides. */
class FaithfulWordsSpec extends SparkSpec {

  private def mkFrame(vals: Seq[(Long, Double)], cls: String = "m.x"): GtsFrame = {
    import spark.implicits._
    val pts = vals.map { case (t, v) => (cls, Map("user" -> "1"), t, v) }
      .toDF("class", "labels", "ts", "vdouble")
      .withColumn("lat", lit(null).cast(DoubleType))
      .withColumn("lon", lit(null).cast(DoubleType))
      .withColumn("elev", lit(null).cast(LongType))
      .withColumn("vtype", lit(graft.model.GtsType.DOUBLE).cast(ByteType))
      .withColumn("vlong", lit(null).cast(LongType))
      .withColumn("vbool", lit(null).cast(BooleanType))
      .withColumn("vstring", lit(null).cast(StringType))
      .withColumn("vbinary", lit(null).cast(BinaryType))
    GtsFrame(Gts.canonical(pts))
  }

  private def engineOf(f: GtsFrame) = new WarpScriptEngine(
    fetch = (cls, ls, a, b) => f.select(cls, ls).timeclip(a, b),
    nowTs = 0L, session = Some(spark))

  private val FETCH = "[ '' '~m\\..*' { } 99 100 ] FETCH"

  test("COMPACT keeps run starts plus the literal last point") {
    // runs: a a a b b — reference keeps a(t1), b(t4), b(t5)
    val f = mkFrame(Seq(1L -> 7.0, 2L -> 7.0, 3L -> 7.0, 4L -> 3.0, 5L -> 3.0))
    val e = engineOf(f)
    val got = e.runToFrame(s"$FETCH COMPACT")
      .orderBy("ts").collect().map(r => (r.getAs[Long]("ts"), r.getAs[Double]("vdouble")))
    assert(got.toSeq === Seq(1L -> 7.0, 4L -> 3.0, 5L -> 3.0))
  }

  test("RANGECOMPACT takes no parameter and keeps run starts AND ends") {
    val f = mkFrame(Seq(1L -> 7.0, 2L -> 7.0, 3L -> 7.0, 4L -> 3.0, 5L -> 3.0))
    val e = engineOf(f)
    val got = e.runToFrame(s"$FETCH RANGECOMPACT")
      .orderBy("ts").collect().map(r => (r.getAs[Long]("ts"), r.getAs[Double]("vdouble")))
    assert(got.toSeq === Seq(1L -> 7.0, 3L -> 7.0, 4L -> 3.0, 5L -> 3.0))
  }

  test("CORRELATE: a linear series correlates 1.0 with itself at lag 0 and 1") {
    import spark.implicits._
    // base m.a = 1..4 at ticks 10,20,30,40; other m.b identical
    val base = mkFrame(Seq(10L -> 1.0, 20L -> 2.0, 30L -> 3.0, 40L -> 4.0), "m.a")
    val other = mkFrame(Seq(10L -> 1.0, 20L -> 2.0, 30L -> 3.0, 40L -> 4.0), "m.b")
    val out = graft.operators.StatOps.crossCorrelate(base, other, Seq(0L, 10L, 1000L))
      .select(col("ts"), col("vdouble")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    // lag 0: z-vectors identical, Σz² = n−1 under Bessel ⇒ exactly 1.0
    assert(math.abs(out(0L) - 1.0) < 1e-12)
    // lag 10: clipped linear segments are again perfectly correlated
    assert(math.abs(out(10L) - 1.0) < 1e-12)
    // lag 1000: nothing aligns ⇒ the reference's 0.0
    assert(out(1000L) === 0.0)
  }

  test("VALUEHISTOGRAM counts typed values and bucketized empties") {
    val f = mkFrame(Seq(1L -> 5.0, 2L -> 5.0, 3L -> 7.0))
    val e = engineOf(f)
    val plain = e.run(s"$FETCH VALUEHISTOGRAM").head.asInstanceOf[Map[Any, Any]]
    assert(plain === Map(5.0 -> 2L, 7.0 -> 1L))
    // bucketized over 5 buckets: 2 empty ⇒ null → 2 (GTSHelper.
    // valueHistogram:9252-9256)
    val bucketized = e.run(
      s"[ $FETCH bucketizer.mean 5 1 5 ] BUCKETIZE VALUEHISTOGRAM")
      .head.asInstanceOf[Map[Any, Any]]
    assert(bucketized(null) === 2L)
    assert(bucketized(5.0) === 2L && bucketized(7.0) === 1L)
  }

  test("MUSIGMA replays the reference's scale-limited BigDecimal divides") {
    val f = mkFrame(Seq(1L -> 1.0, 2L -> 2.0, 3L -> 3.0))
    val e = engineOf(f)
    val st = e.run(s"$FETCH true MUSIGMA")
    val sigma = st(0).asInstanceOf[Double]
    val mu = st(1).asInstanceOf[Double]
    assert(mu === 2.0)
    // the reference's BigDecimal path: sumsq "14.00" (scale 2 — each
    // bd.multiply(bd) doubles the scale) / 3 with HALF_UP → 4.67 (NOT
    // 4.666…); 36.00/9 → 4.00; variance 0.67, then * (3 / 2.0) and
    // sqrt — a genuine reference quirk, locked here
    assert(sigma === math.sqrt(0.67 * (3 / 2.0)))
    // NSUMSUMSQ pushes the exact decimal sums as doubles
    val st2 = e.run(s"$FETCH NSUMSUMSQ")
    assert(st2(0).asInstanceOf[Double] === 14.0)
    assert(st2(1).asInstanceOf[Double] === 6.0)
    assert(st2(2).asInstanceOf[Long] === 3L)
  }
}
