package graft

import org.apache.spark.sql.functions._

import graft.script.WarpScriptEngine

/** Round-6 word tail: bitwise/shifts, ALMOSTEQ, Morton Z-codec, MAPID,
  * UNSET, MDETACH, MSEC, POLYFUNC, FIND/FINDSTATS, ATTRSKIP, ACCEL.*. */
class WsExt5Spec extends SparkSpec {

  private def eng = new WarpScriptEngine(
    fetch = (_, _, _, _) => throw new UnsupportedOperationException,
    nowTs = 0L, session = Some(spark))

  private def fixtureEngine = {
    val s = spark
    import org.apache.spark.sql.functions._
    val df = s.range(6).select(
      lit("t.m").as("class"),
      map(lit("u"), (col("id") % 3).cast("string"),
        lit("dc"), lit("eu")).as("labels"),
      lit(0L).as("gtsid"), (col("id") * 1000L).as("ts"),
      lit(null).cast("double").as("lat"), lit(null).cast("double").as("lon"),
      lit(null).cast("long").as("elev"),
      lit(graft.model.GtsType.DOUBLE).as("vtype"),
      lit(null).cast("long").as("vlong"),
      col("id").cast("double").as("vdouble"),
      lit(null).cast("boolean").as("vbool"),
      lit(null).cast("string").as("vstring"),
      lit(null).cast("binary").as("vbinary"))
    val f = graft.operators.GtsFrame(graft.model.Gts.canonicalRehash(df))
    new WarpScriptEngine(
      fetch = (cls, labels, lo, hi) => f.select(cls, labels).timeclip(lo, hi),
      nowTs = 0L, session = Some(spark))
  }

  test("bitwise and shift words match Java long semantics") {
    val e = eng
    assert(e.run("12 10 &").head == 8L)
    assert(e.run("12 10 |").head == 14L)
    assert(e.run("12 10 ^").head == 6L)
    assert(e.run("0 ~").head == -1L)
    assert(e.run("1 8 <<").head == 256L)
    assert(e.run("-16 2 >>").head == -4L)       // arithmetic
    assert(e.run("-1 60 >>>").head == 15L)       // logical
  }

  test("ALMOSTEQ: lambda tolerance and NaN==NaN") {
    val e = eng
    assert(e.run("1.0 1.05 0.1 ~=").head == true)
    assert(e.run("1.0 1.25 0.1 ~=").head == false)
    assert(e.run("NaN NaN 0.0 ~=").head == true)
    assert(e.run("NaN 1.0 100.0 ~=").head == false)
  }

  test("Morton ->Z encodes bit-exactly and Z-> round-trips") {
    // single long, 8 bits: LSB-first accumulation + in-byte reversal
    // puts bit0 of the value in bit0 of the byte
    val e = eng
    def enc(prog: String) = e.run(prog).head.asInstanceOf[Array[Byte]]
    assert(enc("[ 1 ] 8 ->Z").toSeq == Seq(1.toByte))
    assert(enc("[ 128 ] 8 ->Z").toSeq == Seq(0x80.toByte))
    val out = e.run("[ 123456789 987654321 40 ] 30 ->Z 3 30 Z->")
      .head.asInstanceOf[Vector[Any]]
    assert(out == Vector(123456789L, 987654321L, 40L))
    // interleave of (1,0) vs (0,1) must differ (order matters)
    assert(!java.util.Arrays.equals(enc("[ 1 0 ] 4 ->Z"), enc("[ 0 1 ] 4 ->Z")))
  }

  test("SipHash-2-4 kernel matches the published reference vectors") {
    // Aumasson & Bernstein reference vectors: key 000102..0f,
    // data = 00 01 02 ... (len bytes), little-endian key halves
    val k0 = 0x0706050403020100L; val k1 = 0x0f0e0d0c0b0a0908L
    def data(n: Int) = Array.tabulate[Byte](n)(_.toByte)
    val e = eng
    def hash(n: Int): Long = {
      val hex = data(n).map(b => f"$b%02x").mkString
      e.run(s"'$hex' HEX-> $k0 $k1 HASH").head.asInstanceOf[Long]
    }
    assert(hash(0) == 0x726fdb47dd0e0e31L)
    assert(hash(8) == 0x93f5f5799a932462L)
    assert(hash(15) == 0xa129ca6149be45e5L)
  }

  test("MAPID is deterministic, label-order independent, UUID shaped") {
    val e = eng
    val a = e.run("{ 'a' '1' 'b' '2' } MAPID").head.asInstanceOf[String]
    val b = e.run("{ 'b' '2' 'a' '1' } MAPID").head.asInstanceOf[String]
    val c = e.run("{ 'a' '1' 'b' '3' } MAPID").head.asInstanceOf[String]
    assert(a == b)
    assert(a != c)
    assert(java.util.UUID.fromString(a).toString == a)
  }

  test("UNSET spreads a set behind a mark; ] collects it back") {
    val e = eng
    val out = e.run("[ 3 1 2 ] ->SET UNSET ]").head.asInstanceOf[Vector[Any]]
    assert(out.toSet == Set(1L, 2L, 3L))
  }

  test("MDETACH splits the signature; MSEC hides the body from rendering") {
    val e = eng
    val out = e.run(
      """<% 1 2 + %> 'secp256r1' ECGEN DROP MSIGN MDETACH
        |SWAP MSIGCOUNT SWAP SIZE""".stripMargin)
    // after MDETACH: body-macro sig-macro; body has no signatures left,
    // the signature macro carries the 4 statements
    assert(out(1) == 0L)
    assert(out(0) == 4L)
    val hidden = e.run("<% 1 2 + %> MSEC MACRO->").head.asInstanceOf[String]
    assert(hidden == "<% %>")
    // a secure macro still evaluates
    assert(e.run("<% 1 2 + %> MSEC EVAL").head == 3L)
  }

  test("POLYFUNC: EVAL on numbers/lists and tick-mapping over a frame") {
    val e = fixtureEngine
    // p(x) = 2 + 3x + x^2
    assert(e.run("10 [ 2.0 3.0 1.0 ] POLYFUNC EVAL").head == 132.0)
    val l = e.run("[ 0 1 2 ] [ 2.0 3.0 1.0 ] POLYFUNC EVAL")
      .head.asInstanceOf[Vector[Any]]
    assert(l == Vector(2.0, 6.0, 12.0))
    // over a frame: vdouble = p(ts); ticks are 0,1000,...
    val df = e.runToFrame(
      "[ '' '~.*' { } 100000000 100000001 ] FETCH [ 0.0 2.0 ] POLYFUNC EVAL")
    val got = df.select("ts", "vdouble").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got(3000L) == 6000.0)
    // mapper face under MAP
    val m = e.runToFrame(
      "[ [ '' '~.*' { } 100000000 100000001 ] FETCH [ 0.0 1.0 ] POLYFUNC 0 0 0 ] MAP")
    assert(m.select("ts", "vdouble").collect()
      .forall(r => r.getDouble(1) == r.getLong(0).toDouble))
  }

  test("FIND returns metadata-only series; FINDSTATS exact cardinalities") {
    val e = fixtureEngine
    val found = e.run("[ 'tok' '~t\\..*' { } ] FIND").head.asInstanceOf[Vector[Any]]
    assert(found.size == 3) // users 0,1,2
    val names = e.run("[ 'tok' '~t\\..*' { } ] FIND <% DROP NAME %> LMAP")
      .head.asInstanceOf[Vector[Any]]
    assert(names.forall(_ == Vector("t.m")))
    // FIND result accessors run with zero Spark jobs (driver metadata)
    val labels = e.run("[ '' '~.*' { 'u' '1' } ] FIND 0 GET LABELS")
      .head.asInstanceOf[Map[Any, Any]]
    assert(labels("u") == "1")
    val stats = e.run("[ '' '~.*' { } ] FINDSTATS").head.asInstanceOf[Map[Any, Any]]
    assert(stats("gts.estimate") == 3L)
    assert(stats("classes.estimate") == 1L)
    assert(stats("labelnames.estimate") == 2L)   // u, dc
    assert(stats("labelvalues.estimate") == 4L)  // 0,1,2 + eu
    assert(stats("error.rate") == 0.0)
    val perLabel = stats("per.label.value.estimate").asInstanceOf[Map[Any, Any]]
    assert(perLabel("u") == 3L && perLabel("dc") == 1L)
  }

  test("ATTRSKIP suppresses FINDSETS attribute sets") {
    val e = fixtureEngine
    val withAttrs = e.run(
      """[ '' '~.*' { 'u' '1' } 100000000 100000001 ] FETCH { 'owner' 'ops' } SETATTRIBUTES DROP
        |true ATTRSKIP
        |[ '' '~.*' { } ] FINDSETS""".stripMargin)
    assert(withAttrs(0).asInstanceOf[Map[Any, Any]].isEmpty)
    val read = e.run("NULL ATTRSKIP").head
    assert(read == false) // fresh engine default
  }

  test("ACCEL.CACHE persists subsequent FETCHes at the requested level") {
    val e = fixtureEngine
    val cached = e.runToFrame("ACCEL.CACHE [ '' '~.*' { } 100000000 100000001 ] FETCH")
    assert(cached.storageLevel.useMemory)
    cached.unpersist()
    val plain = e.runToFrame(
      "ACCEL.CACHE ACCEL.NOCACHE [ '' '~.*' { } 100000000 100000001 ] FETCH")
    assert(!plain.storageLevel.useMemory && !plain.storageLevel.useDisk)
    val rep = e.run("ACCEL.PERSIST ACCEL.REPORT").head.asInstanceOf[Map[Any, Any]]
    assert(rep("persist") == true && rep("accelerated") == true)
  }
}
