package graft

import graft.script.WarpScriptEngine

/** Encoder/multivalue words, the Keccak sponge (public test vectors)
  * and shape renderers. */
class WsEncoderSpec extends SparkSpec {

  private def eng = new WarpScriptEngine(
    fetch = (_, _, _, _) => throw new UnsupportedOperationException("no storage"),
    nowTs = 0L, session = Some(spark))

  private def top(p: String): Any = eng.run(p).head

  test("Keccak against the published vectors (original 0x01 padding)") {
    assert(top("'' KECCAK.256 ->HEX") ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(top("'abc' KECCAK.256 ->HEX") ==
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert(top("'' KECCAK.512 ->HEX") ==
      "0eab42de4c3ceb9235fc91acffe746b29c29a8c366b7c60e4e67c466f36a4304" +
      "c00fa9caf9d87976ba469bcbe06713b435f091ef2769fb160cdab33d3670680e")
    // distinct from SHA3 (0x06 padding)
    assert(top("'' KECCAK.256 ->HEX") != top("'' SHA3.256 ->HEX"))
  }

  test("typed encoder: mixed-type values split by ->GTS") {
    val e = eng
    val out = e.run(
      """NEWENCODER 'enc' RENAME
        |1 NaN NaN NULL 42 ADDVALUE
        |2 NaN NaN NULL 1.5 ADDVALUE
        |3 NaN NaN NULL 'txt' ADDVALUE
        |4 NaN NaN NULL true ADDVALUE
        |->GTS 'm' STORE
        |$m SIZE $m 'LONG' GET SIZE $m 'STRING' GET SIZE""".stripMargin)
    assert(out == List(1L, 1L, 4L))
  }

  test("ENCODER-> and ASENCODERS are representation-preserving") {
    val e = eng
    assert(e.run(
      "NEWGTS 'g' RENAME 1 NaN NaN NULL 7.0 ADDVALUE ->ENCODER ENCODER-> SIZE")
      .head == 1L)
  }

  test("MVTICKS / MVVALUES on a plain frame") {
    val e = eng
    val out = e.run(
      """NEWGTS 'g' RENAME
        |5 NaN NaN NULL 50.0 ADDVALUE
        |3 NaN NaN NULL 30.0 ADDVALUE
        |MVTICKS""".stripMargin)
    assert(out.head == Vector(3L, 5L))
    val vals = e.run(
      """NEWGTS 'g' RENAME
        |5 NaN NaN NULL 50.0 ADDVALUE
        |3 NaN NaN NULL 30.0 ADDVALUE
        |MVVALUES""".stripMargin)
    assert(vals.head == Vector(30.0, 50.0))
  }

  test("->WKT round-trips through GEO.WKT") {
    val e = eng
    val wkt = "POLYGON ((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0))"
    assert(e.run(s"'$wkt' 5 GEO.WKT ->WKT").head == wkt)
    val gj = e.run(s"'$wkt' 5 GEO.WKT ->GEOJSON").head.asInstanceOf[String]
    // single-quoted strings percent-decode, so %22 carries the quotes
    assert(e.run(s"'${gj.replace("\"", "%22")}' 5 GEO.JSON ->WKT").head == wkt)
  }
}
