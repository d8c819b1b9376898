package graft

import org.apache.spark.sql.functions._

import graft.operators.GtsFrame
import graft.script.WarpScriptEngine

/** Word-level semantics of the round-7 registry-tail faces that the
  * driver rows don't cover directly: the reducer faces of circular
  * mean and join variants, percentile.forbid-nulls, the tanh/positive
  * dotproduct activations, mapper.mean.circular as a window,
  * mapper.geo.fence, and filter.bylabelsattr's label-priority rule.
  */
class RegistryTailSpec2 extends SparkSpec {

  /** Two series a/b sharing label g=1, aligned on ticks 1..3 except b
    * missing tick 3. */
  private def twoSeries = GtsFrame(gtsOf(
    ("a", "1", 1L, 350.0), ("a", "1", 2L, 10.0), ("a", "1", 3L, 30.0),
    ("b", "1", 1L, 10.0), ("b", "1", 2L, 30.0)))

  private def eng(f: GtsFrame) = new WarpScriptEngine(
    fetch = (cls, labels, _, _) => f.select(cls, labels),
    nowTs = 0L, session = Some(spark))

  private val F = "[ '' '~.*' { } 100 101 ] FETCH"

  private def run(f: GtsFrame, prog: String) =
    eng(f).runToFrame(prog)

  test("reducer.mean.circular wraps; .exclude-nulls keeps partial ticks " +
    "(CircularMean.java forbidNulls flag)") {
    // tick 1: members 350,10 with period 360 → circular mean 0
    val strict = run(twoSeries,
      s"[ $F [ 'user' ] 360.0 reducer.mean.circular ] REDUCE")
      .select(col("ts"), col("vdouble")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(strict(1L)) < 1e-9)
    assert(!strict.contains(3L)) // forbid-nulls: b missing tick 3
    val loose = run(twoSeries,
      s"[ $F [ 'user' ] 360.0 reducer.mean.circular.exclude-nulls ] REDUCE")
      .select(col("ts"), col("vdouble")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(loose(3L) - 30.0) < 1e-9) // single member survives
  }

  test("reducer.join.forbid-nulls drops partial ticks; mapper.join " +
    "windows concatenate (Join.java ignoreNulls flag)") {
    val strict = run(twoSeries,
      s"[ $F [ 'user' ] '|' reducer.join.forbid-nulls ] REDUCE")
      .select(col("ts"), col("vdouble").cast("string")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(strict.keySet == Set(1L, 2L))
    assert(strict(1L) == "10.0|350.0") // sorted member strings
    val win = run(GtsFrame(gtsOf(("a", "1", 1L, 1.0), ("a", "1", 2L, 2.0))),
      s"[ $F ',' mapper.join 1 0 0 ] MAP")
      .select(col("ts"), col("vdouble").cast("string")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(win(2L) == "1.0,2.0") // look-back window of 2
  }

  test("reducer.percentile.forbid-nulls nulls partial ticks " +
    "(Percentile.Builder forbidNulls)") {
    val out = run(twoSeries,
      s"[ $F [ 'user' ] 50.0 reducer.percentile.forbid-nulls ] REDUCE")
      .select(col("ts"), col("vdouble")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L)) // tick 3 dropped
    assert(out(2L) == 10.0) // type-1 percentile of {10, 30} at p50
  }

  test("mapper.dotproduct.tanh / .positive apply their activations " +
    "(MapperDotProductTanh/Positive.java)") {
    val f = GtsFrame(gtsOf(("a", "1", 1L, 1.0), ("a", "1", 2L, -4.0),
      ("a", "1", 3L, 2.0)))
    def mp(m: String) = run(f, s"[ $F $m 1 1 0 ] MAP")
      .select(col("ts"), col("vdouble")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dot = 1.0 * 1 + 1.0 * -4 + 1.0 * 2 // -1 at the middle tick
    val t = mp("[ 1.0 1.0 1.0 ] mapper.dotproduct.tanh")
    assert(math.abs(t(2L) - math.tanh(dot)) < 1e-12)
    val pos = mp("[ 1.0 1.0 1.0 ] mapper.dotproduct.positive")
    assert(pos(2L) == 0.0) // max(0, -1)
  }

  test("mapper.mean.circular over a window wraps the period boundary") {
    val f = GtsFrame(gtsOf(("a", "1", 1L, 350.0), ("a", "1", 2L, 10.0)))
    val out = run(f, s"[ $F 360.0 mapper.mean.circular 1 0 0 ] MAP")
      .select(col("ts"), col("vdouble")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(2L)) < 1e-9) // mean(350°, 10°) = 0°, not 180°
  }

  test("mapper.geo.fence emits point-in-shape booleans; " +
    "location-less ticks drop (MapperGeoFence.java)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some(0.5), Some(0.5), 1.0), (2L, Some(5.0), Some(5.0), 2.0),
      (3L, None, None, 3.0))
      .toDF("ts", "lat", "lon", "v").select(
        lit("geo").as("class"), map(lit("user"), lit("1")).as("labels"),
        col("ts"), col("lat"), col("lon"),
        lit(null).cast("bigint").as("elev"),
        lit(graft.model.GtsType.DOUBLE).cast("tinyint").as("vtype"),
        lit(null).cast("bigint").as("vlong"), col("v").as("vdouble"),
        lit(null).cast("boolean").as("vbool"),
        lit(null).cast("string").as("vstring"),
        lit(null).cast("binary").as("vbinary"))
    val f = GtsFrame(graft.model.Gts.canonicalRehash(df))
    val out = run(f,
      s"[ $F 'POLYGON ((0 0, 0 2, 2 2, 2 0, 0 0))' 12 GEO.WKT " +
        "mapper.geo.fence 0 0 0 ] MAP")
      .select(col("ts"), col("vbool")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> false)) // tick 3 dropped
  }

  test("filter.any.eq STRING threshold compares every value type's " +
    "rendering (FilterAny.java:136 val.toString)") {
    // numeric-valued series: '30.0' must match the double rendering
    val out = run(twoSeries,
      s"[ $F [ ] '30.0' filter.any.eq ] FILTER")
      .select(col("class")).distinct().collect().map(_.getString(0)).toSet
    assert(out == Set("a", "b")) // both series contain value 30.0
  }

  test("WRAP round-trips bucketization; WRAPFAST pushes uncompressed " +
    "bytes (WarpScriptLib.java:2596-2606 flags)") {
    val f = GtsFrame(gtsOf(("m", "1", 10L, 1.0), ("m", "1", 30L, 3.0)))
    val e = eng(f)
    // BUCKETIZE → WRAP → UNWRAP → the fill words still see the bucket
    // params (wrapper fields 2-4 carry them, GTSWrapperHelper)
    val filled = e.runToFrame(
      s"[ $F bucketizer.sum 30 10 3 ] BUCKETIZE WRAP UNWRAP 0.0 FILLVALUE")
      .select(col("ts")).collect().map(_.getLong(0)).toSet
    assert(filled == Set(10L, 20L, 30L)) // missing bucket 20 filled
    val fast = e.run(s"$F WRAPFAST").head
    assert(fast.isInstanceOf[Array[Byte]])
    val (w2, _) = graft.sources.WrapperCodec.unwrapBytes(
      fast.asInstanceOf[Array[Byte]])
    assert(!w2.compressed)
  }

  test("filter.bylabelsattr: the label takes priority over the " +
    "attribute (FilterByLabels.java:131-155)") {
    val f = twoSeries
    val e = eng(f)
    // tag series a (class a) with attribute k=x; series b untagged.
    // selector {k: x}: a matches via attribute; b has neither → out.
    val out = e.runToFrame(
      s"""[ '' 'a' { } 100 101 ] FETCH { 'k' 'x' } SETATTRIBUTES DROP
         |[ $F [ ] { 'k' 'x' } filter.bylabelsattr ] FILTER""".stripMargin)
      .select(col("class")).distinct().collect().map(_.getString(0)).toSet
    assert(out == Set("a"))
    // absence selector: only series with NEITHER label nor attr k
    val out2 = e.runToFrame(
      s"""[ '' 'a' { } 100 101 ] FETCH { 'k' 'x' } SETATTRIBUTES DROP
         |[ $F [ ] { 'k' '' } filter.bylabelsattr ] FILTER""".stripMargin)
      .select(col("class")).distinct().collect().map(_.getString(0)).toSet
    assert(out2 == Set("b"))
  }
}
