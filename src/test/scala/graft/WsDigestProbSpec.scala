package graft

import org.apache.spark.sql.functions._

import graft.script.WarpScriptEngine

/** MD4/RIPEMD-160 against the RFC 1320 / RIPEMD paper test vectors,
  * RLP round-trips, and the PROB/TICKINDEX/BBOX/hull GTS words. */
class WsDigestProbSpec extends SparkSpec {

  private def plainEng = new WarpScriptEngine(
    fetch = (_, _, _, _) => throw new UnsupportedOperationException("no storage"),
    nowTs = 0L, session = Some(spark))

  private def top(p: String): Any = plainEng.run(p).head

  test("MD4 RFC 1320 vectors") {
    assert(top("'' MD4 ->HEX") == "31d6cfe0d16ae931b73c59d7e0c089c0")
    assert(top("'abc' MD4 ->HEX") == "a448017aaf21d8525fc10ae87aa6729d")
    assert(top("'message digest' MD4 ->HEX") == "d9130a8164549fe818874806e1c7014b")
  }

  test("RIPEMD-160 paper vectors") {
    assert(top("'' RIPEMD160 ->HEX") == "9c1185a5c5e9fc54612808977ee8f548b2258d31")
    assert(top("'abc' RIPEMD160 ->HEX") ==
      "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc")
    assert(top("'message digest' RIPEMD160 ->HEX") ==
      "5d0689ef49d2fae572b881b123a85ffa21595f36")
  }

  test("RIPEMD-128/256/320 paper vectors") {
    assert(top("'' RIPEMD128 ->HEX") == "cdf26213a150dc3ecb610f18f6b38b46")
    assert(top("'abc' RIPEMD128 ->HEX") == "c14a12199c66e4ba84636b0f69144c77")
    assert(top("'' RIPEMD256 ->HEX") ==
      "02ba4c4e5f8ecd1877fc52d64d30e37a2d9774fb1e5d026380ae0168e3c5522d")
    assert(top("'abc' RIPEMD256 ->HEX") ==
      "afbd6e228b9d8cbbcef5ca2d03e6dba10ac0bc7dcbe4680e1e42d2e975459b65")
    assert(top("'' RIPEMD320 ->HEX") ==
      "22d65d5661536cdc75c1fdf5c6de7b41b9f27325ebc61e8557177d705a0ec880151c3a32a00899b8")
    assert(top("'abc' RIPEMD320 ->HEX") ==
      "de4c01b3054f8930a79d09ae738e92301e5a17085beffdc1b8d116713e74f82fa942d64cdbc4682d")
  }

  test("RLP encode vectors and round-trip") {
    // 'dog' → 0x83646f67; empty string → 0x80; list ['cat','dog'] → c8 83.. 83..
    assert(top("'dog' ->RLP ->HEX") == "83646f67")
    assert(top("'' ->RLP ->HEX") == "80")
    assert(top("[ 'cat' 'dog' ] ->RLP ->HEX") == "c88363617483646f67")
    assert(top("0 ->RLP ->HEX") == "80")
    assert(top("15 ->RLP ->HEX") == "0f")
    assert(top("1024 ->RLP ->HEX") == "820400")
    assert(top("[ 'cat' 'dog' ] ->RLP RLP-> 0 GET 'UTF-8' BYTES->") == "cat")
  }

  private def seqFrame = {
    val s = spark
    val pts = Seq((0L, 1.0), (1L, 2.0), (2L, 1.0), (5L, 3.0), (9L, 1.0))
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
    graft.operators.GtsFrame(graft.model.Gts.canonicalRehash(df))
  }

  private def eng = new WarpScriptEngine(
    fetch = (_, _, _, _) => seqFrame, nowTs = 0L, session = Some(spark))

  test("PROB: value probability per series") {
    // values 1,2,1,3,1 → P(1)=0.6, P(2)=0.2, P(3)=0.2
    val out = eng.run("[ '' '~.*' { } 100 101 ] FETCH PROB VALUES").head
    assert(out == Vector(0.6, 0.2, 0.6, 0.2, 0.6))
  }

  test("TICKINDEX remaps ticks to 0..n-1") {
    assert(eng.run("[ '' '~.*' { } 100 101 ] FETCH TICKINDEX TICKS").head ==
      Vector(0L, 1L, 2L, 3L, 4L))
  }

  test("UPPERHULL / LOWERHULL monotone chains") {
    // points (0,1),(1,2),(2,1),(5,3),(9,1): upper hull (0,1),(1,2),(5,3),(9,1)
    assert(eng.run("[ '' '~.*' { } 100 101 ] FETCH UPPERHULL TICKS").head ==
      Vector(0L, 1L, 5L, 9L))
    // (2,1) is collinear with (0,1)-(9,1) → excluded (strict hull)
    assert(eng.run("[ '' '~.*' { } 100 101 ] FETCH LOWERHULL TICKS").head ==
      Vector(0L, 9L))
  }

  test("CPROB conditional probability over separator events") {
    val s = spark
    val pts = Seq((0L, "a:x"), (1L, "a:y"), (2L, "a:x"), (3L, "b:x"))
    val df = s.createDataFrame(pts).toDF("t", "v").select(
      lit("p.q").as("class"), typedLit(Map("u" -> "1")).as("labels"),
      lit(0L).as("gtsid"), col("t").as("ts"),
      lit(null).cast("double").as("lat"), lit(null).cast("double").as("lon"),
      lit(null).cast("long").as("elev"),
      lit(graft.model.GtsType.STRING).as("vtype"),
      lit(null).cast("long").as("vlong"), lit(null).cast("double").as("vdouble"),
      lit(null).cast("boolean").as("vbool"),
      col("v").as("vstring"),
      lit(null).cast("binary").as("vbinary"))
    val f = graft.operators.GtsFrame(graft.model.Gts.canonicalRehash(df))
    val e = new WarpScriptEngine(fetch = (_, _, _, _) => f, nowTs = 0L,
      session = Some(spark))
    // P('a:x'|'a:') = 2/3; P('a:y'|'a:') = 1/3; P('b:x'|'b:') = 1
    val out = e.run("[ '' '~.*' { } 100 101 ] FETCH ':' CPROB VALUES").head
      .asInstanceOf[Vector[Any]].map(_.asInstanceOf[Double])
    assert(math.abs(out(0) - 2.0 / 3) < 1e-12)
    assert(math.abs(out(1) - 1.0 / 3) < 1e-12)
    assert(out(3) == 1.0)
  }
}
