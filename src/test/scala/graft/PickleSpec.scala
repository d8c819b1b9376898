package graft

import graft.script.{PickleCodec, WarpScriptEngine}

/** Python-pickle codec (->PICKLE / PICKLE->, reference TOPICKLE.java /
  * PICKLETO.java; GTS map shape of continuum/gts/GTSPickler.java).
  * Byte-level expectations are validated against CPython: `canonHex`
  * loads via pickle.loads to the fixture structure, and `pyHex` is
  * CPython's own protocol-3 pickle.dumps of the same structure (with
  * its BINPUT memo opcodes), which must unpickle here identically.
  */
class PickleSpec extends SparkSpec {

  private val fixture: Vector[Any] = Vector(
    1L, 2.5, "héllo", true, null, Vector(3L, 4L),
    Map[Any, Any]("a" -> 1L, "b" -> 2L),
    Array(0xde, 0xad, 0xbe, 0xef).map(_.toByte))

  private val canonHex = "80035d284b01474004000000000000580600000068c3a9" +
    "6c6c6f884e5d284b034b04657d285801000000614b015801000000624b0275430" +
    "4deadbeef652e"
  private val pyHex = "80035d7100284b01474004000000000000580600000068c3" +
    "a96c6c6f7101884e5d7102284b034b04657d71032858010000006171044b01580" +
    "10000006271054b02754304deadbeef7106652e"

  private def hex(b: Array[Byte]) = b.map(x => f"$x%02x").mkString
  private def unhex(s: String) =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // structural equality with Array[Byte] compared by content
  private def deepEq(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Array[Byte], y: Array[Byte]) => x.sameElements(y)
    case (x: Seq[_], y: Seq[_]) =>
      x.size == y.size && x.zip(y).forall { case (p, q) => deepEq(p, q) }
    case (x: Map[_, _], y: Map[_, _]) =>
      x.size == y.size && x.asInstanceOf[Map[Any, Any]].forall {
        case (k, v) => y.asInstanceOf[Map[Any, Any]].get(k).exists(deepEq(v, _))
      }
    case _ => a == b
  }

  test("pickle emits the canonical CPython-loadable bytes") {
    assert(hex(PickleCodec.pickle(fixture)) == canonHex)
  }

  test("unpickle(pickle(x)) is the identity for mixed structures") {
    assert(deepEq(PickleCodec.unpickle(PickleCodec.pickle(fixture)), fixture))
  }

  test("CPython's own memo-bearing protocol-3 bytes unpickle identically") {
    assert(deepEq(PickleCodec.unpickle(unhex(pyHex)), fixture))
    // ...and re-pickle to the canonical form (memo ops normalized away)
    assert(hex(PickleCodec.pickle(PickleCodec.unpickle(unhex(pyHex)))) == canonHex)
  }

  test("integer width ladder matches CPython opcode selection") {
    // CPython: pickle.dumps([-5, 70000, 2**40+7, -(2**40)], protocol=2)
    val intsHex = "80025d7100284afbffffff4a701101008a0607000000000" +
      "18a060000000000ff652e"
    val vals = Vector(-5L, 70000L, (1L << 40) + 7L, -(1L << 40))
    assert(deepEq(PickleCodec.unpickle(unhex(intsHex)), vals))
    // our encoding: same opcode ladder (BININT/LONG1 with identical
    // payload bytes), PROTO 3 header, no BINPUT memo op
    assert(hex(PickleCodec.pickle(vals)) ==
      "80035d284afbffffff4a701101008a060700000000018a060000000000ff652e")
  }

  test("LONG1 sign-boundary values round-trip") {
    for (v <- Seq(Long.MaxValue, Long.MinValue, 1L << 39, -(1L << 39) - 1,
        255L, 256L, 65535L, 65536L, -1L, 0L, Int.MaxValue.toLong,
        Int.MinValue.toLong, Int.MaxValue + 1L, Int.MinValue - 1L))
      assert(PickleCodec.unpickle(PickleCodec.pickle(v)) == v, s"v=$v")
  }

  test("doubles including NaN/Inf round-trip") {
    for (v <- Seq(0.0, -0.0, 1.5, Double.MaxValue, Double.MinPositiveValue,
        Double.PositiveInfinity, Double.NegativeInfinity)) {
      assert(PickleCodec.unpickle(PickleCodec.pickle(v)) == v)
    }
    val nan = PickleCodec.unpickle(PickleCodec.pickle(Double.NaN))
    assert(nan.asInstanceOf[Double].isNaN)
  }

  test("->PICKLE on a frame yields the GTSPickler map shape") {
    import org.apache.spark.sql.functions._
    val s = spark
    val df = s.range(4).select(
      lit("t.m").as("class"),
      map(lit("u"), (col("id") % 2).cast("string")).as("labels"),
      lit(0L).as("gtsid"), (col("id") * 1000L).as("ts"),
      when(col("id") === 1, lit(48.5)).cast("double").as("lat"),
      when(col("id") === 1, lit(-4.25)).cast("double").as("lon"),
      when(col("id") === 2, lit(100L)).cast("long").as("elev"),
      lit(graft.model.GtsType.DOUBLE).as("vtype"),
      lit(null).cast("long").as("vlong"),
      col("id").cast("double").as("vdouble"),
      lit(null).cast("boolean").as("vbool"),
      lit(null).cast("string").as("vstring"),
      lit(null).cast("binary").as("vbinary"))
    val f = graft.operators.GtsFrame(graft.model.Gts.canonicalRehash(df))
    val e = new WarpScriptEngine(
      fetch = (cls, labels, lo, hi) => f.select(cls, labels).timeclip(lo, hi),
      nowTs = 0L, session = Some(spark))
    val out = e.run("[ '' 't.m' { } 100000 100001 ] FETCH ->PICKLE PICKLE->")
      .head.asInstanceOf[Vector[Any]]
    assert(out.size == 2) // two series (u=0, u=1)
    val m = out.map(_.asInstanceOf[Map[Any, Any]])
      .find(_("labels").asInstanceOf[Map[Any, Any]]("u") == "1").get
    assert(m("classname") == "t.m")
    assert(m("timestamps") == Vector(1000L, 3000L))
    assert(m("values") == Vector(1.0, 3.0))
    // id=1 located, id=3 not → NaN sentinel (GTSPickler.java:82-92)
    val lats = m("latitudes").asInstanceOf[Vector[Any]]
    assert(lats(0) == 48.5 && lats(1).asInstanceOf[Double].isNaN)
    // series u=1 has no elevations (elev only on id=2 in series u=0)
    assert(!m.contains("elevations"))
    val m0 = out.map(_.asInstanceOf[Map[Any, Any]])
      .find(_("labels").asInstanceOf[Map[Any, Any]]("u") == "0").get
    // missing elevation → Long.MIN_VALUE sentinel (GTSPickler.java:99)
    assert(m0("elevations") == Vector(Long.MinValue, 100L))
  }
}
