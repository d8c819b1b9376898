package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.kernels.StlKernel
import graft.kernels.StlKernel.Sgts
import graft.model.Gts
import graft.operators.GtsFrame
import graft.script.{StlParams, WarpScriptEngine}

/** Goldens for the faithful LOWESS/STL engine (GTSHelper.pointwise_
  * lowess/rlowess/stl) and STL.java's parameter resolution quirks. */
class StlKernelSpec extends SparkSpec {

  private def sgts(vals: Seq[(Long, Double)],
                   bucket: Option[(Long, Long, Int)] = None): Sgts = {
    val t = vals.map(_._1).toArray
    val v = vals.map(_._2).toArray
    bucket match {
      case Some((lb, span, count)) => new Sgts(t, v, t.length, lb, span, count)
      case None => new Sgts(t, v, t.length, 0L, 0L, 0)
    }
  }

  test("rlowess reproduces a linear series exactly (collinear weighted fit)") {
    val pts = (0 to 20).map(i => (i.toLong * 10, 3.0 * i + 5))
    val out = StlKernel.rlowess(sgts(pts), q = 5, r = 0, d = 0L, p = 1)
    assert(out.values === 21)
    (0 until out.values).foreach { i =>
      assert(math.abs(out.vals(i) - (3.0 * i + 5)) < 1e-9)
    }
  }

  test("pointwise_lowess hand trace: tricube edge weights vanish") {
    // points (0,0) (10,10) (20,0); estimate at 10 with q=3: both edges
    // sit AT maxdist so their tricube weight is 0 — the fit collapses
    // to the center point's value
    val g = sgts(Seq(0L -> 0.0, 10L -> 10.0, 20L -> 0.0))
    val v = StlKernel.pointwiseLowess(g, 1, 10L, 3, 1, null, reversed = false)
    assert(v === 10.0)
    // estimate at 0: weights 1 (self), (1-0.5^3)^3 at 10, 0 at 20 —
    // replay the reference's exact op order
    val w1 = { val b = 1.0 - 0.5 * 0.5 * 0.5; b * b * b }
    val wsum = 1.0 + w1
    val ct = (0.0 * 1.0 + w1 * 10.0) / wsum
    val cv = (1.0 * 0.0 + w1 * 10.0) / wsum
    val covar = (1.0 * (0.0 - ct) * (0.0 - cv) + w1 * (10.0 - ct) * (10.0 - cv)) / wsum
    val varr = (1.0 * (0.0 - ct) * (0.0 - ct) + w1 * (10.0 - ct) * (10.0 - ct)) / wsum
    val b1 = covar / varr
    val expected = (cv - ct * b1) + 0.0 * b1
    val got = StlKernel.pointwiseLowess(g, 0, 0L, 3, 1, null, reversed = false)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("rlowess robustness: iterations run, stay bounded, and keep exactness on lines") {
    // a wiggle keeps the fit residuals nonzero, so h = 6·median > 0
    // and the bisquare weights actually differ from 1.0 (an exactly
    // fit series has h == 0, which faithfully short-circuits rho to 1)
    val pts = (0 to 20).map(i =>
      (i.toLong * 10, if (i == 10) 1000.0 else 3.0 * i + (i % 3)))
    val plain = StlKernel.rlowess(sgts(pts), q = 7, r = 0, d = 0L, p = 1)
    val robust = StlKernel.rlowess(sgts(pts), q = 7, r = 4, d = 0L, p = 1)
    // the bisquare pass is exercised (estimates move) and every
    // estimate stays within the data envelope
    assert((0 to 20).exists(i => plain.vals(i) != robust.vals(i)))
    (0 to 20).foreach(i => assert(robust.vals(i) >= -10.0 && robust.vals(i) <= 1000.0))
    // a pure line survives ANY reweighting exactly: a weighted degree-1
    // fit through collinear points reproduces the line
    val line = (0 to 20).map(i => (i.toLong * 10, 3.0 * i))
    val robustLine = StlKernel.rlowess(sgts(line), q = 7, r = 3, d = 0L, p = 1)
    (0 to 20).foreach(i => assert(math.abs(robustLine.vals(i) - 3.0 * i) < 1e-9))
  }

  test("stl: trend + seasonal reconstruct the input exactly (identity trend smoothing)") {
    // y = 12-bucket seasonal square wave + slope, filled grid of 48
    val span = 100L
    val lb = 4800L
    val n = 48
    val pts = (0 until n).map { j =>
      val t = lb - (n - 1 - j) * span
      val phase = ((lb - t) / span) % 12
      (t, (if (phase < 6) 50.0 else -50.0) + 0.5 * j)
    }
    val (s, t) = StlKernel.stl(sgts(pts, Some((lb, span, n))), bpp = 12,
      inner = 2, outer = 0,
      ns = -1, ds = 1, js = 0, // seasonal smoothing by cycle MEANS
      nl = 1, dl = 1, jl = 0,  // low-pass final smoothing = identity
      nt = 1, dt = 1, jt = 0,  // trend smoothing = identity
      np = 0, dp = 2, jp = 0)
    assert(s.values === n && t.values === n)
    val sv = (0 until n).map(i => s.ticks(i) -> s.vals(i)).toMap
    val tv = (0 until n).map(i => t.ticks(i) -> t.vals(i)).toMap
    pts.foreach { case (tick, y) =>
      // step 5 sets trend = y - seasonal and nt=1 keeps it verbatim
      assert(math.abs(sv(tick) + tv(tick) - y) < 1e-9, s"tick $tick")
    }
  }

  test("STL word: faithful param surface, [seasonal trend] pair, _suffixed classes") {
    import spark.implicits._
    val span = 100L
    val lb = 4800L
    val n = 48
    val rows = (0 until n).map { j =>
      val t = lb - (n - 1 - j) * span
      val phase = ((lb - t) / span) % 12
      ("m.x", Map("user" -> "1"), t, (if (phase < 6) 50.0 else -50.0) + 0.5 * j)
    }
    val pts = rows.toDF("class", "labels", "ts", "vdouble")
      .withColumn("lat", lit(null).cast(DoubleType))
      .withColumn("lon", lit(null).cast(DoubleType))
      .withColumn("elev", lit(null).cast(LongType))
      .withColumn("vtype", lit(graft.model.GtsType.DOUBLE).cast(ByteType))
      .withColumn("vlong", lit(null).cast(LongType))
      .withColumn("vbool", lit(null).cast(BooleanType))
      .withColumn("vstring", lit(null).cast(StringType))
      .withColumn("vbinary", lit(null).cast(BinaryType))
    val frame = GtsFrame(Gts.canonical(pts))
    val e = new WarpScriptEngine(
      fetch = (cls, ls, a, b) => frame.select(cls, ls).timeclip(a, b),
      nowTs = 0L, session = Some(spark))
    val df = e.runToFrame(
      s"""[ [ '' '~m\\..*' { } $lb ${lb + 1} ] FETCH
         |  bucketizer.mean $lb $span $n ] BUCKETIZE
         |{ 'PERIOD' 12 'BANDWIDTH_S' -1 'BANDWIDTH_L' 1 'BANDWIDTH_T' 1
         |  'SPEED' 0 } STL""".stripMargin)
    val classes = df.select("class").distinct().collect().map(_.getString(0)).toSet
    assert(classes === Set("m.x_seasonal", "m.x_trend"))
    assert(df.count() === 2L * n)
    // unknown keys and non-LONG values are rejected like the reference
    intercept[IllegalArgumentException](
      StlParams.resolve(Map("PERIOD" -> 12L, "TREND.HALF" -> 6L)))
    intercept[IllegalArgumentException](
      StlParams.resolve(Map("PERIOD" -> 12.0)))
  }

  test("STLESDTEST: real-STL remainder + median/MAD ESD flags a seeded spike") {
    import spark.implicits._
    val span = 100L
    val lb = 9600L
    val n = 96
    val rows = (0 until n).map { j =>
      val t = lb - (n - 1 - j) * span
      val phase = ((lb - t) / span) % 12
      val base = (if (phase < 6) 50.0 else -50.0) + 0.25 * j +
        (if (j % 5 == 0) 0.5 else -0.25) // texture so MAD > 0
      ("m.x", Map("user" -> "1"), t, if (j == 40) base + 500.0 else base)
    }
    val pts = rows.toDF("class", "labels", "ts", "vdouble")
      .withColumn("lat", lit(null).cast(DoubleType))
      .withColumn("lon", lit(null).cast(DoubleType))
      .withColumn("elev", lit(null).cast(LongType))
      .withColumn("vtype", lit(graft.model.GtsType.DOUBLE).cast(ByteType))
      .withColumn("vlong", lit(null).cast(LongType))
      .withColumn("vbool", lit(null).cast(BooleanType))
      .withColumn("vstring", lit(null).cast(StringType))
      .withColumn("vbinary", lit(null).cast(BinaryType))
    val frame = GtsFrame(Gts.canonical(pts))
    val e = new WarpScriptEngine(
      fetch = (cls, ls, a, b) => frame.select(cls, ls).timeclip(a, b),
      nowTs = 0L, session = Some(spark))
    // default STL parameters (BANDWIDTH_S -1, real LOESS low-pass +
    // trend), k=2, default alpha, no params map
    val flagged = e.runToFrame(
      s"""[ [ '' '~m\\..*' { } $lb ${lb + 1} ] FETCH
         |  bucketizer.mean $lb $span $n ] BUCKETIZE
         |12 2 STLESDTEST""".stripMargin)
      .select(col("ts")).collect().map(_.getLong(0)).toSet
    val spikeTick = lb - (n - 1 - 40) * span
    assert(flagged.contains(spikeTick))
    assert(flagged.size <= 2)
    // PERIOD consistency with an explicit map is enforced
    intercept[Exception](e.run(
      s"""[ [ '' '~m\\..*' { } $lb ${lb + 1} ] FETCH
         |  bucketizer.mean $lb $span $n ] BUCKETIZE
         |12 2 0.05 { 'PERIOD' 24 } STLESDTEST""".stripMargin))
  }

  test("HYBRIDTEST / HYBRIDTEST2: piecewise SH-ESD flags a spike per piece") {
    import spark.implicits._
    val span = 100L
    val lb = 9600L
    val n = 96 // 2 pieces of 4 periods x 12 buckets
    val rows = (0 until n).map { j =>
      val t = lb - (n - 1 - j) * span
      val phase = ((lb - t) / span) % 12
      val base = (if (phase < 6) 40.0 else -40.0) + 0.3 * j +
        (if (j % 7 == 0) 0.6 else -0.1)
      val v = if (j == 20) base + 400.0 else if (j == 70) base - 400.0 else base
      ("m.x", Map("user" -> "1"), t, v)
    }
    val pts = rows.toDF("class", "labels", "ts", "vdouble")
      .withColumn("lat", lit(null).cast(DoubleType))
      .withColumn("lon", lit(null).cast(DoubleType))
      .withColumn("elev", lit(null).cast(LongType))
      .withColumn("vtype", lit(graft.model.GtsType.DOUBLE).cast(ByteType))
      .withColumn("vlong", lit(null).cast(LongType))
      .withColumn("vbool", lit(null).cast(BooleanType))
      .withColumn("vstring", lit(null).cast(StringType))
      .withColumn("vbinary", lit(null).cast(BinaryType))
    val frame = GtsFrame(Gts.canonical(pts))
    val e = new WarpScriptEngine(
      fetch = (cls, ls, a, b) => frame.select(cls, ls).timeclip(a, b),
      nowTs = 0L, session = Some(spark))
    def ticksOf(word: String): Set[Long] = e.runToFrame(
      s"""[ [ '' '~m\\..*' { } $lb ${lb + 1} ] FETCH
         |  bucketizer.mean $lb $span $n ] BUCKETIZE
         |12 4 2 $word""".stripMargin)
      .select(col("ts")).collect().map(_.getLong(0)).toSet
    val spike1 = lb - (n - 1 - 20) * span
    val spike2 = lb - (n - 1 - 70) * span
    val h1 = ticksOf("HYBRIDTEST")
    assert(h1.contains(spike1) && h1.contains(spike2), s"HYBRIDTEST got $h1")
    assert(h1.size <= 4)
    val h2 = ticksOf("HYBRIDTEST2")
    assert(h2.contains(spike1) && h2.contains(spike2), s"HYBRIDTEST2 got $h2")
    // the optional alpha + STL-params-map arity (HYBRIDTEST only)
    val h3 = e.runToFrame(
      s"""[ [ '' '~m\\..*' { } $lb ${lb + 1} ] FETCH
         |  bucketizer.mean $lb $span $n ] BUCKETIZE
         |12 4 2 0.05 { 'BANDWIDTH_L' 1 'BANDWIDTH_T' 1 'SPEED' 0 }
         |HYBRIDTEST""".stripMargin)
      .select(col("ts")).collect().map(_.getLong(0)).toSet
    assert(h3.contains(spike1) && h3.contains(spike2))
    // PERIOD mismatch in the map is rejected
    intercept[Exception](e.run(
      s"""[ [ '' '~m\\..*' { } $lb ${lb + 1} ] FETCH
         |  bucketizer.mean $lb $span $n ] BUCKETIZE
         |12 4 2 0.05 { 'PERIOD' 24 } HYBRIDTEST""".stripMargin))
  }

  test("r13 probe/sort internals: unsorted bodies smooth identically to sorted ones") {
    // the r13 optimization replaced the full boxed re-sort and the
    // full-body linear probe with tail insertion + sorted-prefix
    // probing — pin behavior-invariance on both the small-tail
    // (binary-insert) and large-tail (generic sort fallback) paths
    val rnd = new java.util.Random(7)
    val n = 100
    val base = (0 until n).map(i => (i.toLong * 10, rnd.nextInt(500).toDouble))
    def run(g: Sgts) = StlKernel.rlowess(g, q = 7, r = 2, d = 25L, p = 1)
    val sortedOut = run(sgts(base))
    // small unsorted tail: sorted prefix + last 8 points appended out
    // of order (what lowess_stl's extension appends produce)
    val smallTail = base.take(n - 8) ++ base.takeRight(8).reverse
    val g1 = sgts(smallTail); g1.sorted = false; g1.sortedPrefix = n - 8
    val smallOut = run(g1)
    // large unsorted tail (> 64): falls back to the generic sort
    val bigTail = base.take(20) ++ base.drop(20).reverse
    val g2 = sgts(bigTail); g2.sorted = false; g2.sortedPrefix = 20
    val bigOut = run(g2)
    assert(sortedOut.values === smallOut.values)
    assert(sortedOut.values === bigOut.values)
    (0 until sortedOut.values).foreach { i =>
      assert(sortedOut.ticks(i) === smallOut.ticks(i))
      assert(sortedOut.vals(i) === smallOut.vals(i))
      assert(sortedOut.ticks(i) === bigOut.ticks(i))
      assert(sortedOut.vals(i) === bigOut.vals(i))
    }
    // jump path (SPEED > 0): interpolation probes via valueAtTick on a
    // body with appended extensions — bucketized stl must stay finite
    // and bucket-grid-shaped with the prefix-probe machinery
    val bn = 96
    val bpts = (0 until bn).map(i => (i.toLong * 100, (i % 12).toDouble + rnd.nextDouble()))
    val bg = sgts(bpts, Some(((bn - 1).toLong * 100, 100L, bn)))
    val (seas, tr) = StlKernel.stl(bg, 12, 2, 0, 7, 1, 2, 13, 1, 2, 23, 1, 3, 0, 2, 0)
    assert(seas.values === bn && tr.values === bn)
    (0 until bn).foreach { i =>
      assert(!seas.vals(i).isNaN && !tr.vals(i).isNaN)
      assert(seas.ticks(i) === i.toLong * 100)
    }
  }

  test("StlParams: R-style defaults with the reference's nextOdd quirk") {
    val p = StlParams.resolve(Map("PERIOD" -> 24L))
    assert(p.inner === 2 && p.outer === 0)
    assert(p.ns === 7 && p.js === 0)
    assert(p.nl === 25 && p.jl === 2) // nextOdd(24) = 25
    // ceil(1.5*24/(1-1.5/7)) = 46 -> nextOdd = 47
    assert(p.nt === 47 && p.jt === 4)
    assert(p.np === 0 && p.dp === 2)
    val rob = StlParams.resolve(Map("PERIOD" -> 24L, "ROBUST" -> true))
    assert(rob.inner === 1 && rob.outer === 15)
    // bare BANDWIDTH fans out to every face
    val fan = StlParams.resolve(Map("PERIOD" -> 24L, "BANDWIDTH" -> 9L))
    assert(fan.ns === 9 && fan.nl === 9 && fan.nt === 9 && fan.np === 9)
  }
}
