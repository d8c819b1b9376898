package graft

import org.apache.spark.sql.functions._

import graft.script.WarpScriptEngine

/** Interpolator words (INTERPOLATOR_1D/2D/3D/ND.java parity over
  * commons-math3) and distribution words. */
class WsInterpolatorSpec extends SparkSpec {

  private def eng = new WarpScriptEngine(
    fetch = (_, _, _, _) => throw new UnsupportedOperationException("no storage"),
    nowTs = 0L, session = Some(spark))

  private def top(p: String): Any = eng.run(p).head
  private def d(p: String): Double = top(p).asInstanceOf[Double]

  test("1D linear interpolator: exact at knots, linear between, NaN outside") {
    val build = "[ 0.0 1.0 2.0 ] [ 0.0 10.0 0.0 ] INTERPOLATOR.1D.LINEAR"
    assert(d(s"$build 'f' STORE 0.5 $$f EVAL") == 5.0)
    assert(d(s"$build 'f' STORE 1.0 $$f EVAL") == 10.0)
    assert(d(s"$build 'f' STORE 1.75 $$f EVAL") == 2.5)
    assert(d(s"$build 'f' STORE 2.5 $$f EVAL").isNaN)
    assert(d(s"$build 'f' STORE -0.1 $$f EVAL").isNaN)
  }

  test("1D spline matches commons-math at sample points; akima falls back to linear when <= 4 points") {
    import org.apache.commons.math3.analysis.interpolation._
    val xs = Array(0.0, 1.0, 2.0, 3.0, 4.0)
    val fs = Array(0.0, 1.0, 4.0, 9.0, 16.0)
    val cm = new SplineInterpolator().interpolate(xs, fs)
    val build = "[ 0.0 1.0 2.0 3.0 4.0 ] [ 0.0 1.0 4.0 9.0 16.0 ] INTERPOLATOR.1D.SPLINE"
    Seq(0.5, 1.5, 2.7, 3.9).foreach { x =>
      assert(math.abs(d(s"$build 'f' STORE $x $$f EVAL") - cm.value(x)) < 1e-12)
    }
    val ak = new AkimaSplineInterpolator().interpolate(xs, fs)
    val abuild = "[ 0.0 1.0 2.0 3.0 4.0 ] [ 0.0 1.0 4.0 9.0 16.0 ] INTERPOLATOR.1D.AKIMA"
    Seq(0.5, 2.5).foreach { x =>
      assert(math.abs(d(s"$abuild 'f' STORE $x $$f EVAL") - ak.value(x)) < 1e-12)
    }
    // 3 points: AKIMA needs > 4, falls back to LINEAR (INTERPOLATOR_1D.java:185)
    assert(d("[ 0.0 1.0 2.0 ] [ 0.0 10.0 0.0 ] INTERPOLATOR.1D.AKIMA 'f' STORE 0.5 $f EVAL") == 5.0)
  }

  test("1D interpolator as a MAPPER compiles to Column arithmetic") {
    val s = spark
    val pts = Seq((0L, 0.25), (1L, 1.5), (2L, 5.0))
    val df = s.createDataFrame(pts).toDF("t", "v").select(
      lit("p.q").as("class"), typedLit(Map("u" -> "1")).as("labels"),
      lit(0L).as("gtsid"), col("t").as("ts"),
      lit(null).cast("double").as("lat"), lit(null).cast("double").as("lon"),
      lit(null).cast("long").as("elev"),
      lit(graft.model.GtsType.DOUBLE).as("vtype"),
      lit(null).cast("long").as("vlong"), col("v").as("vdouble"),
      lit(null).cast("boolean").as("vbool"),
      lit(null).cast("string").as("vstring"),
      lit(null).cast("binary").as("vbinary"))
    val f = graft.operators.GtsFrame(graft.model.Gts.canonicalRehash(df))
    val e = new WarpScriptEngine(fetch = (_, _, _, _) => f, nowTs = 0L,
      session = Some(spark))
    val out = e.run(
      """[ [ '' '~.*' { } 100 101 ] FETCH
        |  [ 0.0 1.0 2.0 ] [ 0.0 10.0 0.0 ] INTERPOLATOR.1D.LINEAR
        |  0 0 0 ] MAP VALUES""".stripMargin).head.asInstanceOf[Vector[Any]]
    assert(out(0) == 2.5) // 0.25 -> 2.5
    assert(out(1) == 5.0) // 1.5 -> 5.0
    assert(out(2).asInstanceOf[Double].isNaN) // 5.0 out of range
  }

  test("2D bicubic and 3D tricubic agree with commons-math") {
    import org.apache.commons.math3.analysis.interpolation._
    val xs = Array(0.0, 1.0, 2.0, 3.0, 4.0)
    val grid = xs.map(x => xs.map(y => x * x + 2 * y))
    val cm = new BicubicInterpolator().interpolate(xs, xs, grid)
    val gridWs = grid.map(_.mkString("[ ", " ", " ]")).mkString("[ ", " ", " ]")
    val b2 = s"[ 0.0 1.0 2.0 3.0 4.0 ] [ 0.0 1.0 2.0 3.0 4.0 ] $gridWs INTERPOLATOR.2D.BICUBIC"
    val cmv = cm.value(1.5, 2.5)
    val wsv = d(s"$b2 'f' STORE [ 1.5 2.5 ] $$f EVAL")
    assert(!cmv.isNaN, s"commons-math bicubic is NaN")
    assert(math.abs(wsv - cmv) < 1e-12, s"ws=$wsv cm=$cmv")
    assert(d(s"$b2 'f' STORE [ 9.0 1.0 ] $$f EVAL").isNaN)

    val cube = xs.map(x => xs.map(y => xs.map(z => x + 2 * y + 3 * z)))
    val cm3 = new TricubicInterpolator().interpolate(xs, xs, xs, cube)
    val cubeWs = cube.map(_.map(_.mkString("[ ", " ", " ]")).mkString("[ ", " ", " ]"))
      .mkString("[ ", " ", " ]")
    val b3 = s"[ 0.0 1.0 2.0 3.0 4.0 ] [ 0.0 1.0 2.0 3.0 4.0 ] [ 0.0 1.0 2.0 3.0 4.0 ] $cubeWs INTERPOLATOR.3D.TRICUBIC"
    // commons-math 3.6.1's TricubicInterpolatingFunction.isValidPoint is
    // false at interior non-knot points; INTERPOLATOR_3D.java:49-57 gates
    // value() on it and so returns NaN there — reproduce that parity:
    // knot points evaluate, interior points are NaN
    assert(math.abs(d(s"$b3 'f' STORE [ 2.0 2.0 2.0 ] $$f EVAL") -
      cm3.value(2.0, 2.0, 2.0)) < 1e-12)
    assert(d(s"$b3 'f' STORE [ 1.5 2.5 3.5 ] $$f EVAL").isNaN ==
      !cm3.isValidPoint(1.5, 2.5, 3.5))
  }

  test("ND microsphere interpolates near sample points; seeded variant is reproducible") {
    val pts = "[ [ 0.0 0.0 ] [ 1.0 0.0 ] [ 0.0 1.0 ] [ 1.0 1.0 ] ]"
    val vals = "[ 0.0 1.0 2.0 3.0 ]"
    // at a sample point the projection returns the sample value
    assert(math.abs(d(s"$pts $vals INTERPOLATOR.ND.MICROSPHERE 'f' STORE [ 1.0 1.0 ] $$f EVAL") - 3.0) < 1e-9)
    val a = d(s"42 PRNG $pts $vals INTERPOLATOR.ND.SMICROSPHERE 'f' STORE [ 0.5 0.25 ] $$f EVAL")
    val b = d(s"42 PRNG $pts $vals INTERPOLATOR.ND.SMICROSPHERE 'f' STORE [ 0.5 0.25 ] $$f EVAL")
    assert(a == b && !a.isNaN)
  }

  test("RANDPDF / SRANDPDF sample the histogram; SRANDPDF is seed-deterministic") {
    val draws = eng.run(
      """42 PRNG { 'a' 1 'b' 3 } SRANDPDF 'f' STORE
        |[ ] 0 99 <% DROP $f EVAL +! %> FOR""".stripMargin)
      .head.asInstanceOf[Vector[Any]]
    assert(draws.size == 100 && draws.toSet.subsetOf(Set[Any]("a", "b")))
    val nb = draws.count(_ == "b")
    assert(nb > 50 && nb < 95) // ~75 expected
    // same seed -> same draws
    val draws2 = eng.run(
      """42 PRNG { 'a' 1 'b' 3 } SRANDPDF 'f' STORE
        |[ ] 0 99 <% DROP $f EVAL +! %> FOR""".stripMargin)
      .head.asInstanceOf[Vector[Any]]
    assert(draws == draws2)
    assert(Set("a", "b").contains(top("{ 'a' 1 'b' 3 } RANDPDF EVAL").asInstanceOf[String]))
    val r = d("RANDOM")
    assert(r >= 0.0 && r < 1.0)
  }
}
