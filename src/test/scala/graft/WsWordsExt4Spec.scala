package graft

import org.apache.spark.sql.functions._

import graft.script.{WarpScriptEngine, WsToken}
import graft.script.WarpScriptEngine.WsMacro

/** Round-5 word tail: FUNCTIONS/TDESCRIBE introspection, PERMUTE,
  * LOCATIONOFFSET, PIVOTSTRICT, FINDSETS/METASET, KVSTORE/KVLOAD,
  * macro signing (MSIGN/MSIG/MCHECKSIG/MVERIFY/MSIGINFO/MSIGCOUNT),
  * ECRECOVER, ->MVSTRING. */
class WsWordsExt4Spec extends SparkSpec {

  private def seqFrame = {
    val s = spark
    val pts = Seq((0L, 1.0), (10L, 2.0), (20L, 4.0), (40L, 8.0))
    val df = s.createDataFrame(pts).toDF("t", "v").select(
      lit("p.q").as("class"), typedLit(Map("u" -> "1")).as("labels"),
      lit(0L).as("gtsid"), col("t").as("ts"),
      lit(48.5).as("lat"), lit(-4.25).as("lon"),
      lit(100L).as("elev"),
      lit(graft.model.GtsType.DOUBLE).as("vtype"),
      lit(null).cast("long").as("vlong"), col("v").as("vdouble"),
      lit(null).cast("boolean").as("vbool"),
      lit(null).cast("string").as("vstring"),
      lit(null).cast("binary").as("vbinary"))
    graft.operators.GtsFrame(graft.model.Gts.canonicalRehash(df))
  }

  private def eng = new WarpScriptEngine(
    fetch = (_, _, _, _) => seqFrame, nowTs = 0L, session = Some(spark))

  private def top(p: String): Any = eng.run(p).head

  test("FUNCTIONS needs the inventory capability and lists the words") {
    intercept[Exception] { top("FUNCTIONS") }
    val names = top("'inventory=1' CAPADD FUNCTIONS")
      .asInstanceOf[Vector[Any]].map(_.toString)
    assert(names.length > 850)
    for (w <- Seq("FETCH", "BUCKETIZE", "MSIGN", "ECRECOVER", "KVSTORE",
        "mapper.sum", "reducer.sd", "op.add", "->MVSTRING", "PERMUTE"))
      assert(names.contains(w), s"inventory missing $w")
    assert(names == names.sorted && names.distinct == names)
  }

  test("TDESCRIBE recurses into lists and maps") {
    assert(top("[ 1 2 3 ] TDESCRIBE") == "LIST [ LONG ]")
    assert(top("[ [ 'a' ] ] TDESCRIBE") == "LIST [ LIST [ STRING ] ]")
    assert(top("{ 'a' 1.5 } TDESCRIBE") == "MAP { STRING : DOUBLE } ")
    assert(top("[ ] TDESCRIBE") == "LIST []")
    assert(top("42 TDESCRIBE") == "LONG")
  }

  test("PERMUTE transposes a 2x3 tensor and validates shape") {
    assert(top("[ [ 1 2 3 ] [ 4 5 6 ] ] [ 1 0 ] PERMUTE") ==
      Vector(Vector(1L, 4L), Vector(2L, 5L), Vector(3L, 6L)))
    // 2x2x2: reverse all axes
    assert(top("[ [ [ 1 2 ] [ 3 4 ] ] [ [ 5 6 ] [ 7 8 ] ] ] [ 2 1 0 ] PERMUTE") ==
      Vector(Vector(Vector(1L, 5L), Vector(3L, 7L)),
        Vector(Vector(2L, 6L), Vector(4L, 8L))))
    intercept[Exception] { top("[ [ 1 2 ] [ 3 ] ] [ 1 0 ] PERMUTE") }
    intercept[Exception] { top("[ [ 1 2 ] ] [ 0 0 ] PERMUTE") }
  }

  test("LOCATIONOFFSET keeps first, >=dist-from-last-kept, and last") {
    // equator track: 0.1 deg lon ~ 11.1 km, 1 deg ~ 111 km; dist 100 km
    val prog =
      """NEWGTS 'g' RENAME
        |0 0.0 0.0  NULL 1.0 ADDVALUE
        |1 0.0 0.1  NULL 1.0 ADDVALUE
        |2 0.0 0.5  NULL 1.0 ADDVALUE
        |3 0.0 1.0  NULL 1.0 ADDVALUE
        |4 0.0 1.05 NULL 1.0 ADDVALUE
        |5 0.0 2.0  NULL 1.0 ADDVALUE
        |6 0.0 2.05 NULL 1.0 ADDVALUE
        |7 0.0 2.1  NULL 1.0 ADDVALUE
        |100000.0 LOCATIONOFFSET TICKS""".stripMargin
    assert(top(prog) == Vector(0L, 3L, 5L, 7L))
  }

  test("PIVOTSTRICT labels data at ticks common to all labeling series") {
    val prog =
      """[ NEWGTS 'data' RENAME
        |  0 NaN NaN NULL 10.0 ADDVALUE
        |  10 NaN NaN NULL 20.0 ADDVALUE
        |  20 NaN NaN NULL 40.0 ADDVALUE ]
        |[ NEWGTS 'phase' RENAME
        |  0 NaN NaN NULL 1.0 ADDVALUE
        |  20 NaN NaN NULL 2.0 ADDVALUE ]
        |PIVOTSTRICT""".stripMargin
    val f = top(prog).asInstanceOf[graft.operators.GtsFrame]
    val rows = f.df.select(col("ts"), col("labels").getItem("phase"),
      col("vdouble")).collect().sortBy(_.getLong(0))
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 0L && rows(0).getString(1) == "1.0" &&
      rows(0).getDouble(2) == 10.0)
    assert(rows(1).getLong(0) == 20L && rows(1).getString(1) == "2.0" &&
      rows(1).getDouble(2) == 40.0)
  }

  test("FINDSETS pushes class, label-value and attribute-value sets") {
    val out = eng.run("[ '' '~.*' { } ] FINDSETS")
    val attrs = out(0).asInstanceOf[Map[Any, Any]]
    val labels = out(1).asInstanceOf[Map[Any, Any]]
    val classes = out(2).asInstanceOf[Vector[Any]]
    assert(classes == Vector("p.q"))
    assert(labels == Map("u" -> Vector("1")))
    assert(attrs.isEmpty)
  }

  test("METASET carries ttl, selector and the matched metadata") {
    val ms = top("[ '' '~.*' { } ] 3600000000 METASET")
      .asInstanceOf[Map[Any, Any]]
    assert(ms("ttl") == 3600000000L)
    val metas = ms("metadatas").asInstanceOf[Vector[Any]]
    assert(metas.length == 1)
    assert(metas.head.asInstanceOf[Map[Any, Any]]("c") == "p.q")
  }

  test("META and METADIFF validate and consume") {
    assert(eng.run("[ '' '~.*' { } 100 101 ] FETCH 'tok' META").isEmpty)
    assert(eng.run("[ '' '~.*' { } 100 101 ] FETCH 'tok' METADIFF").isEmpty)
  }

  test("KVSTORE / KVLOAD round-trip over the session store") {
    val got = top(
      """{ 'a' 1 'b' 'two' } 'tok' KVSTORE
        |{ 'token' 'tok' 'keys' [ 'a' 'b' 'c' ] } KVLOAD""".stripMargin)
      .asInstanceOf[Map[Any, Any]]
    assert(got == Map("a" -> 1L, "b" -> "two"))
    // range form + null deletion
    val got2 = top(
      """{ 'a' 1 'b' 2 'c' 3 } 'tok' KVSTORE
        |{ 'b' NULL } 'tok' KVSTORE
        |{ 'token' 'tok' 'start' 'a' 'end' 'd' } KVLOAD""".stripMargin)
      .asInstanceOf[Map[Any, Any]]
    assert(got2 == Map("a" -> 1L, "c" -> 3L))
  }

  test("MSIGN signs a macro and MCHECKSIG verifies it") {
    val out = eng.run("<% 1 2 + %> 'secp256r1' ECGEN DROP MSIGN")
    val sig = out.head.asInstanceOf[WsMacro]
    assert(sig.tokens.length == 4)
    val Vector(WsToken.WsStr(curve), WsToken.WsStr(pub),
      WsToken.WsStr(sigHex), WsToken.WsWord("MSIG")) = sig.tokens
    assert(curve == "secp256r1" && pub.startsWith("04"))
    val signed = s"<% 1 2 + '$curve' '$pub' '$sigHex' MSIG %>"
    assert(top(s"$signed MCHECKSIG") == true)
    assert(top(s"$signed MSIGCOUNT") == 1L)
    // MVERIFY passes the macro through on success
    assert(top(s"$signed MVERIFY").isInstanceOf[WsMacro])
    // MSIGINFO exposes the signature and the key map
    val info = top(s"$signed MSIGINFO").asInstanceOf[Map[Any, Any]]
    assert(info("key").asInstanceOf[Map[Any, Any]]("curve") == "secp256r1")
    // a tampered body fails
    val bad = s"<% 1 3 + '$curve' '$pub' '$sigHex' MSIG %>"
    assert(top(s"$bad MCHECKSIG") == false)
    intercept[Exception] { top(s"$bad MVERIFY") }
    // an unsigned macro extracts an empty signature via MSIG
    assert(top("<% 1 2 + %> MSIG").asInstanceOf[WsMacro].tokens.isEmpty)
  }

  test("ECRECOVER recovers the signing public key") {
    // fixed private scalar so the expected pubkey is deterministic;
    // MSIGN embeds the derived public key hex in its signature macro
    val d = "12345678901234567890"
    val sigm = eng.run(s"<% 1 2 + %> { 'curve' 'secp256r1' 'd' '$d' } MSIGN")
      .head.asInstanceOf[WsMacro]
    val qHex = sigm.tokens(1).asInstanceOf[WsToken.WsStr].v
    // JDK cross-check: the derived pubkey verifies a JDK signature
    val prog =
      s"""'hello graft' 'UTF-8' ->BYTES 'SHA256WITHECDSA'
         |{ 'curve' 'secp256r1' 'd' '$d' } ECPRIVATE ECSIGN ->HEX 'sh' STORE
         |{ 'curve' 'secp256r1'
         |  'hash' 'hello graft' 'UTF-8' ->BYTES SHA256
         |  'sig' $$sh HEX-> } ECRECOVER""".stripMargin
    val cands = top(prog).asInstanceOf[Vector[Any]]
      .map(_.asInstanceOf[Map[Any, Any]])
    assert(cands.length == 2)
    assert(cands.exists(_("q") == qHex))
    assert(cands.forall(_("curve") == "secp256r1"))
  }

  test("->MVSTRING renders the multivalue string form") {
    val prog =
      """NEWGTS 'm' RENAME
        |0 NaN NaN NULL 42.0 ADDVALUE
        |1 NaN NaN NULL 3.5 ADDVALUE
        |->MVSTRING""".stripMargin
    assert(top(prog) == "[! 42.0 1/3.5 ]")
  }
}
