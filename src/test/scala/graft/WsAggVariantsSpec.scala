package graft

import org.apache.spark.sql.functions._

import graft.script.WarpScriptEngine

/** Round-6 aggregator-family tail: null-variant reducers
  * (forbid/exclude/include), boolean and/or across the three families,
  * product, Shannon entropy, the op.* null variants, geo window mappers
  * (hdist/hspeed/vdist/truecourse), kernel-smoother builder words,
  * coordinate mappers, filler.newton, and the LOG/ns/ps scalars.
  * Reference semantics cited per word in the implementation.
  */
class WsAggVariantsSpec extends SparkSpec {

  private def mkFrame(rows: Seq[(String, Map[String, String], Long, Double,
      Option[Double], Option[Double], Option[Long])]) = {
    val s = spark
    val df = s.createDataFrame(rows)
      .toDF("c", "l", "t", "v", "la", "lo", "el").select(
      col("c").as("class"), col("l").as("labels"),
      lit(0L).as("gtsid"), col("t").as("ts"),
      col("la").cast("double").as("lat"), col("lo").cast("double").as("lon"),
      col("el").cast("long").as("elev"),
      lit(graft.model.GtsType.DOUBLE).as("vtype"),
      lit(null).cast("long").as("vlong"), col("v").as("vdouble"),
      lit(null).cast("boolean").as("vbool"),
      lit(null).cast("string").as("vstring"),
      lit(null).cast("binary").as("vbinary"))
    graft.operators.GtsFrame(graft.model.Gts.canonicalRehash(df))
  }

  // two series sharing label u, different hosts; B misses tick 1, A
  // misses tick 4 — exercises the n-way null alignment
  private def twoSeries = mkFrame(Seq(
    ("m", Map("u" -> "1", "h" -> "a"), 1L, 1.0, None, None, None),
    ("m", Map("u" -> "1", "h" -> "a"), 2L, 0.0, None, None, None),
    ("m", Map("u" -> "1", "h" -> "a"), 3L, 1.0, None, None, None),
    ("m", Map("u" -> "1", "h" -> "b"), 2L, 3.0, None, None, None),
    ("m", Map("u" -> "1", "h" -> "b"), 3L, 1.0, None, None, None),
    ("m", Map("u" -> "1", "h" -> "b"), 4L, 2.0, None, None, None)))

  // located series: 3 points east along the equator, elevations rising
  private def geoSeries = mkFrame(Seq(
    ("g", Map("u" -> "1"), 1000000L, 1.0, Some(0.0), Some(0.0), Some(1000L)),
    ("g", Map("u" -> "1"), 2000000L, 2.0, Some(0.0), Some(1.0), Some(3000L)),
    ("g", Map("u" -> "1"), 3000000L, 3.0, Some(0.0), Some(2.0), Some(2000L))))

  private def eng(f: graft.operators.GtsFrame) = new WarpScriptEngine(
    fetch = (_, _, _, _) => f, nowTs = 0L, session = Some(spark))

  private val F = "[ '' '~.*' { } 9999999999999999 10000000000000000 ] FETCH"

  private def reduceVals(reducer: String): Map[Long, Option[Double]] =
    eng(twoSeries).runToFrame(s"[ $F [ 'u' ] $reducer ] REDUCE")
      .select(col("ts"), col("vdouble").cast("double")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

  test("reducer.and forbids nulls by default; .exclude-nulls ignores them") {
    // aligned ticks 2,3 survive the strict form (And.java ctor flag false)
    assert(reduceVals("reducer.and") ==
      Map(2L -> Some(0.0), 3L -> Some(1.0)))
    // exclude-nulls: 1 and 4 evaluate over the single present value
    assert(reduceVals("reducer.and.exclude-nulls") ==
      Map(1L -> Some(1.0), 2L -> Some(0.0), 3L -> Some(1.0), 4L -> Some(1.0)))
    assert(reduceVals("reducer.or") == Map(2L -> Some(1.0), 3L -> Some(1.0)))
  }

  test("reducer.count counts every aligned slot; variants count present ones") {
    // Count.java omitNulls=false: slots = series in the partition
    assert(reduceVals("reducer.count") ==
      Map(1L -> Some(2.0), 2L -> Some(2.0), 3L -> Some(2.0), 4L -> Some(2.0)))
    assert(reduceVals("reducer.count.exclude-nulls") ==
      Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(2.0), 4L -> Some(1.0)))
    assert(reduceVals("reducer.count.include-nulls") == reduceVals("reducer.count"))
  }

  test("reducer.sum.forbid-nulls drops partially-aligned ticks") {
    assert(reduceVals("reducer.sum.forbid-nulls") ==
      Map(2L -> Some(3.0), 3L -> Some(2.0)))
    assert(reduceVals("reducer.sum") ==
      Map(1L -> Some(1.0), 2L -> Some(3.0), 3L -> Some(2.0), 4L -> Some(2.0)))
  }

  test("NULL bylabels partitions by the FULL label set; [] is the global class") {
    val e = eng(twoSeries)
    // GTSHelper.partition(null): eqcls = all labels — h=a and h=b stay
    // separate classes, so NULL-sum reproduces each series unchanged
    val red = e.runToFrame("[ " + F + " NULL reducer.sum ] REDUCE")
      .select(col("labels").getItem("h").as("h"), col("ts"), col("vdouble"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(red == Map(("a", 1L) -> 1.0, ("a", 2L) -> 0.0, ("a", 3L) -> 1.0,
      ("b", 2L) -> 3.0, ("b", 3L) -> 1.0, ("b", 4L) -> 2.0))
    // the EMPTY list is the one-global-class form
    val glob = e.runToFrame("[ " + F + " [ ] reducer.sum ] REDUCE")
      .select(col("ts"), col("vdouble")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(glob == Map(1L -> 1.0, 2L -> 3.0, 3L -> 2.0, 4L -> 2.0))
    val forb = e.runToFrame("[ " + F + " [ ] reducer.sum.forbid-nulls ] REDUCE")
      .select(col("ts")).collect().map(_.getLong(0)).toSet
    assert(forb == Set(2L, 3L)) // only fully-aligned ticks survive
  }

  test("APPLY aggregates multiple same-partition series per operand (no row blowup)") {
    // operand A holds TWO series for user 1 at tick 2 (values 1 and 2),
    // operand B one series (value 10): reference OpAdd sums every
    // aligned slot → a single 13.0 point
    val multi = mkFrame(Seq(
      ("m", Map("u" -> "1", "h" -> "a1"), 2L, 1.0, None, None, None),
      ("m", Map("u" -> "1", "h" -> "a2"), 2L, 2.0, None, None, None),
      ("n", Map("u" -> "1", "h" -> "b"), 2L, 10.0, None, None, None)))
    val e = eng(multi)
    val out = e.runToFrame(
      s"[ [ $F [ ] 'm' filter.byclass ] FILTER " +
        s"[ $F [ ] 'n' filter.byclass ] FILTER [ 'u' ] op.add ] APPLY")
      .select(col("ts"), col("vdouble")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(out.toSeq == Seq(2L -> 13.0))
  }

  test("reducer.product multiplies aligned values") {
    assert(reduceVals("reducer.product") ==
      Map(1L -> Some(1.0), 2L -> Some(0.0), 3L -> Some(1.0), 4L -> Some(2.0)))
  }

  test("reducer.shannonentropy.0 normalizes by ln n; single value is 0 (1 inverted)") {
    val vals = reduceVals("reducer.shannonentropy.0")
    // tick 2: counts (0,3) — zero counts are skipped, S=3, one term:
    // H = -(1·ln 1)/ln 2 = 0; tick 3: (1,1) → ln2-normalized max = 1
    assert(vals(1L) == Some(0.0)) // n == 1
    assert(math.abs(vals(3L).get - 1.0) < 1e-12)
    val inv = reduceVals("reducer.shannonentropy.1")
    assert(inv(1L) == Some(1.0)) // inverted single-value case
  }

  test("op.and is strict on nulls; .ignore-nulls substitutes identity") {
    val e = eng(twoSeries)
    def applyOp(op: String): Map[Long, Option[Double]] =
      e.runToFrame(
        s"[ [ $F [ ] { 'h' 'a' } filter.bylabels ] FILTER " +
          s"[ $F [ ] { 'h' 'b' } filter.bylabels ] FILTER [ 'u' ] $op ] APPLY")
        .select(col("ts"), col("vdouble").cast("double")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
    assert(applyOp("op.and") ==
      Map(1L -> None, 2L -> Some(0.0), 3L -> Some(1.0), 4L -> None))
    assert(applyOp("op.and.ignore-nulls") ==
      Map(1L -> Some(1.0), 2L -> Some(0.0), 3L -> Some(1.0), 4L -> Some(1.0)))
    assert(applyOp("op.or") ==
      Map(1L -> None, 2L -> Some(1.0), 3L -> Some(1.0), 4L -> None))
    assert(applyOp("op.add.ignore-nulls") ==
      Map(1L -> Some(1.0), 2L -> Some(3.0), 3L -> Some(2.0), 4L -> Some(2.0)))
    assert(applyOp("op.mul.ignore-nulls") ==
      Map(1L -> Some(1.0), 2L -> Some(0.0), 3L -> Some(1.0), 4L -> Some(2.0)))
  }

  test("N-ary APPLY folds associative ops over >2 operand sets") {
    val three = mkFrame(Seq(
      ("m", Map("u" -> "1", "h" -> "a"), 1L, 1.0, None, None, None),
      ("m", Map("u" -> "1", "h" -> "a"), 2L, 2.0, None, None, None),
      ("m", Map("u" -> "1", "h" -> "b"), 2L, 3.0, None, None, None),
      ("m", Map("u" -> "1", "h" -> "b"), 3L, 4.0, None, None, None),
      ("m", Map("u" -> "1", "h" -> "c"), 2L, 5.0, None, None, None),
      ("m", Map("u" -> "1", "h" -> "c"), 3L, 6.0, None, None, None)))
    val e = eng(three)
    def sel(h: String) = s"[ $F [ ] { 'h' '$h' } filter.bylabels ] FILTER"
    def applyOp3(op: String): Map[Long, Option[Double]] =
      e.runToFrame(s"[ ${sel("a")} ${sel("b")} ${sel("c")} [ 'u' ] $op ] APPLY")
        .select(col("ts"), col("vdouble").cast("double")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
    // strict add: only tick 2 has all three operands
    assert(applyOp3("op.add") ==
      Map(1L -> None, 2L -> Some(10.0), 3L -> None))
    assert(applyOp3("op.add.ignore-nulls") ==
      Map(1L -> Some(1.0), 2L -> Some(10.0), 3L -> Some(10.0)))
    assert(applyOp3("op.mul.ignore-nulls") ==
      Map(1L -> Some(1.0), 2L -> Some(30.0), 3L -> Some(24.0)))
    assert(applyOp3("op.or.ignore-nulls") ==
      Map(1L -> Some(1.0), 2L -> Some(1.0), 3L -> Some(1.0)))
    // binary-only ops refuse >2 operands, as the reference's null path
    intercept[Exception] { applyOp3("op.sub") }
  }

  test("mapper.hdist accumulates rhumb distance over the window") {
    // 2 equator degrees: 2 · R·π/180 (loxodromic = arc along the equator)
    val vals = eng(geoSeries).runToFrame(s"[ $F mapper.hdist 10 0 0 ] MAP")
      .select(col("ts"), col("vdouble")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val deg = 6378137.0 * math.Pi / 180.0
    assert(math.abs(vals(3000000L) - 2 * deg) < 1e-6)
    assert(math.abs(vals(2000000L) - deg) < 1e-6)
    assert(vals(1000000L) == 0.0)
  }

  test("mapper.hspeed divides by the window time span") {
    val vals = eng(geoSeries).runToFrame(s"[ $F mapper.hspeed 10 0 0 ] MAP")
      .select(col("ts"), col("vdouble")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val deg = 6378137.0 * math.Pi / 180.0
    assert(math.abs(vals(3000000L) - (2 * deg) / 2.0) < 1e-6) // 2 s span
    assert(vals(1000000L) == 0.0) // single-point window: empty span
  }

  test("mapper.vdist sums |Δelev| in meters; truecourse is the first→last bearing") {
    val e = eng(geoSeries)
    val vd = e.runToFrame(s"[ $F mapper.vdist 10 0 0 ] MAP")
      .select(col("ts"), col("vdouble")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(vd(3000000L) == 3.0) // |3000-1000| + |2000-3000| mm = 3 m
    val tc = e.runToFrame(s"[ $F mapper.truecourse 10 0 0 ] MAP")
      .select(col("ts"), col("vdouble")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference formula (TrueCourse.java:84): due-east course reads 270°
    assert(math.abs(tc(3000000L) - 270.0) < 1e-9)
  }

  test("mapper.lat / mapper.elev extract coordinates; mapper.finite drops non-finite") {
    val e = eng(geoSeries)
    val lats = e.runToFrame(s"[ $F mapper.lon 0 0 0 ] MAP")
      .select(col("vdouble")).collect().map(_.getDouble(0)).sorted
    assert(lats.toSeq == Seq(0.0, 1.0, 2.0))
    val elevs = e.runToFrame(s"[ $F mapper.elev 0 0 0 ] MAP")
      .select(col("vdouble")).collect().map(_.getDouble(0)).sorted
    assert(elevs.toSeq == Seq(1000.0, 2000.0, 3000.0))
    val fin = eng(twoSeries).runToFrame(s"[ $F mapper.finite 0 0 0 ] MAP").count()
    assert(fin == 6L)
  }

  test("mapper.kernel.gaussian word smooths with the registry weights") {
    // width 3 (half 1), step 1; interior point of series A
    val e = eng(twoSeries)
    val out = e.runToFrame(
      s"[ [ $F [ ] { 'h' 'a' } filter.bylabels ] FILTER 1 3 mapper.kernel.gaussian 0 0 0 ] MAP")
      .select(col("ts"), col("vdouble")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = graft.kernels.KernelRegistry.weights("gaussian", 1)
    val exp2 = (w(0) * 1.0 + w(1) * 0.0 + w(2) * 1.0) / (w(0) + w(1) + w(2))
    assert(math.abs(out(2L) - exp2) < 1e-12)
  }

  test("mapper.eq.hhcode keeps points in the matching cell") {
    val hh = graft.functions.GeoFunctions.toHHCode(0.0, 1.0)
    val out = eng(geoSeries).runToFrame(s"[ $F $hh mapper.eq.hhcode 0 0 0 ] MAP")
      .select(col("ts")).collect().map(_.getLong(0))
    assert(out.toSeq == Seq(2000000L))
  }

  test("filler.newton fills interior grid buckets (n=2 degrades to linear)") {
    val f = mkFrame(Seq(
      ("n", Map("u" -> "1"), 100L, 10.0, None, None, None),
      ("n", Map("u" -> "1"), 300L, 30.0, None, None, None)))
    val out = eng(f).runToFrame(
      s"[ $F bucketizer.last 300 100 3 ] BUCKETIZE filler.newton FILL")
      .select(col("ts"), col("vdouble")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(100L -> 10.0, 200L -> 20.0, 300L -> 30.0))
  }

  test("LOG is the natural log; ns/ps round to the µs tick") {
    val e = eng(twoSeries)
    assert(e.run("10.0 LOG").head == math.log(10.0))
    assert(e.run("1500 ns").head == 2L)
    assert(e.run("2500000 ps").head == 3L)
    assert(e.run("500 ns").head == 1L)
  }
}
