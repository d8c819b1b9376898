package graft

import graft.script.WarpScriptEngine

/** Word-registry extension semantics: control flow (fn/FOR.java,
  * WHILE, UNTIL, BREAK, RETURN), registers (POPR/PUSHR), scalar math
  * tail (Math exact ops, bits), conversions (OPB64, varint,
  * durations), collections (sets, shapes, matrices) and the crypto
  * tail (SHA3 via JDK, SipHash-2-4 against the published SipHash
  * paper vectors). */
class WarpScriptSpec2 extends SparkSpec {

  private def eng = new WarpScriptEngine(
    fetch = (_, _, _, _) => throw new UnsupportedOperationException("no storage"),
    nowTs = 1000000000L)

  private def top(program: String): Any = eng.run(program).head

  // --------------------------------------------------------- control flow

  test("FOR pushes the counter, inclusive bounds") {
    assert(top("0 1 5 <% + %> FOR") == 15L)
    assert(eng.run("1 3 <% %> FOR DEPTH") == List(3L, 3L, 2L, 1L))
  }

  test("FORSTEP with a step macro, descending") {
    assert(top("0 10 0 <% -2 + %> <% + %> FORSTEP") == 30L) // 10+8+6+4+2+0
  }

  test("WHILE and UNTIL") {
    assert(top("1 <% DUP 100 < %> <% 2 * %> WHILE") == 128L)
    assert(top("1 <% 2 * %> <% DUP 100 > %> UNTIL") == 128L)
  }

  test("BREAK and CONTINUE inside FOREACH and FOR") {
    assert(top("0 [ 1 2 3 4 5 ] <% DUP 4 == <% DROP BREAK %> IFT + %> FOREACH") == 6L)
    // CONTINUE skips even numbers
    assert(top("0 1 10 <% DUP 2 % 0 == <% DROP CONTINUE %> IFT + %> FOR") == 25L)
  }

  test("RETURN exits one macro level, NRETURN several") {
    assert(eng.run("<% 1 RETURN 99 %> EVAL") == List(1L))
    assert(eng.run("<% <% 1 2 NRETURN 98 %> EVAL 99 %> EVAL") == List(1L))
    // one level: the outer macro continues
    assert(eng.run("<% <% 1 RETURN 98 %> EVAL 99 %> EVAL") == List(99L, 1L))
  }

  test("STOP ends the program silently; ASSERT/MSGFAIL raise") {
    assert(eng.run("1 STOP 2") == List(1L))
    assert(top("true ASSERT 7") == 7L)
    intercept[IllegalStateException](eng.run("false ASSERT"))
    intercept[IllegalStateException](eng.run("'boom' MSGFAIL"))
    assert(top("<% 'x' MSGFAIL %> <% 'caught' %> <% %> TRY") == "caught")
  }

  test("GUARD restores the symbol table except kept symbols") {
    assert(eng.run("1 'a' STORE <% 2 'a' STORE 3 'b' STORE %> GUARD $a") == List(1L))
    intercept[IllegalArgumentException](eng.run("<% 3 'b' STORE %> GUARD $b"))
    assert(eng.run("<% 2 'a' STORE 3 'b' STORE %> [ 'b' ] GUARD $b") == List(3L))
  }

  test("MARK / COUNTTOMARK / CLEARTOMARK / DROPN / STACKTOLIST") {
    assert(top("MARK 1 2 3 COUNTTOMARK") == 3L)
    assert(eng.run("7 MARK 1 2 3 CLEARTOMARK") == List(7L))
    assert(eng.run("1 2 3 2 DROPN") == List(1L))
    assert(top("1 2 3 STACKTOLIST") == Vector(1L, 2L, 3L))
  }

  test("registers: POPRn/PUSHRn/RUNRn, STORE to register, CSTORE") {
    assert(top("42 POPR3 PUSHR3") == 42L)
    assert(top("<% 2 3 + %> POPR0 RUNR0") == 5L)
    assert(top("7 5 STORE 5 LOAD") == 7L)
    assert(top("1 'x' STORE 2 'x' CSTORE $x") == 1L)
    assert(top("[ 10 20 ] [ 'p' 'q' ] LSTORE $q 10 * $p +") == 210L)
  }

  test("FOREACH over a map pushes key then value") {
    assert(top("'' { 'a' 1 'b' 2 } <% TOSTRING + + %> FOREACH") == "a1b2")
  }

  // --------------------------------------------------------- scalar tail

  test("exact arithmetic overflows throw") {
    assert(top("9 3 MULTIPLYEXACT") == 27L)
    intercept[ArithmeticException](eng.run("MAXLONG 1 ADDEXACT"))
    assert(top("5 NEGATEEXACT") == -5L)
  }

  test("bit words") {
    assert(top("255 BITCOUNT") == 8L)
    assert(top("5 0 BITGET") == 1L)
    assert(top("5 1 BITGET") == 0L)
    assert(top("1 REVBITS") == Long.MinValue)
    assert(top("'ff' FROMHEX") == 255L)
    assert(top("'101' FROMBIN") == 5L)
    assert(top("'01000001' BITSTOBYTES 'UTF-8' BYTES->") == "A")
    assert(top("'A' 'UTF-8' ->BYTES BYTESTOBITS") == "01000001")
  }

  test("IEEE words and constants") {
    assert(top("1.0 ULP") == Math.ulp(1.0))
    assert(top("8.0 GETEXPONENT") == 3L)
    assert(top("1.5 3 SCALB") == 12.0)
    assert(top("pi") == math.Pi)
    assert(top("e") == math.E)
  }

  test("PRNG/RAND are deterministic and reseedable") {
    val a = eng
    val r1 = a.run("42 PRNG SRAND SRAND").map(_.asInstanceOf[Double])
    val b = eng
    val r2 = b.run("42 PRNG SRAND SRAND").map(_.asInstanceOf[Double])
    assert(r1 == r2)
  }

  test("NPDF builds an evaluable density") {
    val p = top("0.0 1.0 NPDF 'f' STORE 0.0 $f EVAL").asInstanceOf[Double]
    assert(math.abs(p - 1.0 / math.sqrt(2 * math.Pi)) < 1e-12)
  }

  test("MATCH full-match group list") {
    assert(top("'2024-01-31' '(\\d+)-(\\d+)-(\\d+)' MATCH") ==
      Vector("2024-01-31", "2024", "01", "31"))
    assert(top("'abc' 'z+' MATCH") == Vector.empty[Any])
    assert(top("'ab' 'a.' MATCHER MATCH SIZE") == 1L)
  }

  // --------------------------------------------------------- conversions

  test("OPB64 round-trip and ordering") {
    assert(top("'hello' 'UTF-8' ->BYTES ->OPB64 OPB64-> 'UTF-8' BYTES->") == "hello")
    val a = top("'abc' 'UTF-8' ->BYTES ->OPB64").asInstanceOf[String]
    val b = top("'abd' 'UTF-8' ->BYTES ->OPB64").asInstanceOf[String]
    assert(a < b) // order-preserving
  }

  test("varint round-trip") {
    assert(top("[ 0 1 127 128 300 ] ->VARINT VARINT->") ==
      Vector(0L, 1L, 127L, 128L, 300L))
  }

  test("double/float bits round-trip") {
    assert(top("1.5 ->DOUBLEBITS DOUBLEBITS->") == 1.5)
    assert(top("1.5 ->FLOATBITS FLOATBITS->") == 1.5)
  }

  test("->LONGBYTES big-endian truncation") {
    assert(top("258 2 ->LONGBYTES ->HEX") == "0102")
  }

  test("durations: DURATION, HUMANDURATION, ISODURATION, ADDDAYS") {
    assert(top("'PT1H30M' DURATION") == 5400000000L)
    assert(top("'P2DT1S' DURATION") == (2L * 86400 + 1) * 1000000L)
    assert(top("90061000001 HUMANDURATION") == "1d1h1m1.000001s")
    assert(top("5400000000 ISODURATION") == "PT1H30M")
    // 2024-01-31 UTC + 1 month = 2024-02-29 (leap clamp)
    assert(top("1706659200000000 1 ADDMONTHS") == 1709164800000000L)
    assert(top("1706659200000000 1 ADDDAYS") == 1706659200000000L + 86400000000L)
    assert(top("'2024-01-31T00:00:00Z' TOTIMESTAMP") == 1706659200000000L)
  }

  test("TSELEMENTS-> inverse") {
    assert(top("[ 2024 1 31 12 30 15 250 ] TSELEMENTS->") ==
      1706704215000250L)
    assert(top("1706704215000250 TSELEMENTS TSELEMENTS->") == 1706704215000250L)
  }

  test("AGO and time-unit constants") {
    assert(top("1 s AGO") == 1000000000L - 1000000L)
    assert(top("STU") == 1000000L)
    assert(top("MSTU") == 1000L)
  }

  // --------------------------------------------------------- collections

  test("->LIST / LIST-> / UNLIST / ->MAP / MAP->") {
    assert(top("10 20 30 3 ->LIST") == Vector(10L, 20L, 30L))
    assert(top("[ 1 2 ] LIST->") == 2L)
    assert(top("[ 1 2 3 ] UNLIST ]") == Vector(1L, 2L, 3L))
    assert(top("'a' 1 'b' 2 4 ->MAP") == Map("a" -> 1L, "b" -> 2L))
    assert(top("{ 'a' 1 } MAP->") == 2L)
  }

  test("set algebra is deterministic") {
    assert(top("[ 1 2 3 ] ->SET [ 2 3 4 ] ->SET INTERSECTION SET->") ==
      Vector(2L, 3L))
    assert(top("[ 1 2 ] ->SET [ 2 3 ] ->SET UNION SET-> SIZE") == 3L)
    assert(top("[ 1 2 3 ] ->SET [ 2 ] ->SET DIFFERENCE SET->") == Vector(1L, 3L))
  }

  test("CONTAINSKEY peeks, SUBMAP filters") {
    assert(eng.run("{ 'a' 1 } 'a' CONTAINSKEY").head == true)
    assert(top("{ 'a' 1 'b' 2 'c' 3 } [ 'a' 'c' ] SUBMAP SIZE") == 2L)
  }

  test("LFILTER / LFLATMAP / SORTWITH / NONNULL / SHUFFLE") {
    assert(top("[ 1 2 3 4 ] <% DROP 2 % 0 == %> LFILTER") == Vector(2L, 4L))
    assert(top("[ 1 2 ] <% DROP DUP 2 ->LIST %> LFLATMAP") ==
      Vector(1L, 1L, 2L, 2L))
    assert(top("[ 3 1 2 ] <% - %> SORTWITH") == Vector(1L, 2L, 3L))
    assert(top("[ 1 NULL 2 ] NONNULL") == Vector(1L, 2L))
    assert(top("[ 1 2 3 ] SHUFFLE SIZE") == 3L)
  }

  test("SHAPE / CHECKSHAPE / RESHAPE") {
    assert(top("[ [ 1 2 3 ] [ 4 5 6 ] ] SHAPE") == Vector(2L, 3L))
    assert(eng.run("[ [ 1 2 ] [ 3 ] ] CHECKSHAPE").head == false)
    assert(top("[ 1 2 3 4 5 6 ] [ 2 3 ] RESHAPE") ==
      Vector(Vector(1L, 2L, 3L), Vector(4L, 5L, 6L)))
  }

  test("matrix words: DET, INV, TRANSPOSE, TR, products") {
    assert(top("[ [ 2.0 0.0 ] [ 0.0 3.0 ] ] ->MAT DET") == 6.0)
    assert(top("[ [ 1.0 2.0 ] [ 3.0 4.0 ] ] ->MAT TR") == 5.0)
    assert(top("[ [ 1.0 2.0 ] [ 3.0 4.0 ] ] ->MAT TRANSPOSE MAT->") ==
      Vector(Vector(1.0, 3.0), Vector(2.0, 4.0)))
    // inverse times original = identity
    assert(top("""[ [ 4.0 7.0 ] [ 2.0 6.0 ] ] ->MAT DUP INV * MAT->
                  0 GET 0 GET 100 * ROUND""") == 100L)
    // mat·vec (operate) and vecᵀ·mat (preMultiply); the reference has
    // NO vec·vec dot face on `*` (binary/MUL.java matrix branch set)
    assert(top("[ [ 1.0 2.0 ] [ 3.0 4.0 ] ] ->MAT [ 1.0 1.0 ] ->VEC * VEC->") ==
      Vector(3.0, 7.0))
    assert(top("[ 1.0 1.0 ] ->VEC [ [ 1.0 2.0 ] [ 3.0 4.0 ] ] ->MAT * VEC->") ==
      Vector(4.0, 6.0))
    assertThrows[Exception](top("[ 1.0 2.0 ] ->VEC [ 3.0 4.0 ] ->VEC *"))
    assert(top("[ 1.0 2.0 ] ->VEC TYPEOF") == "VECTOR")
  }

  // --------------------------------------------------------- crypto tail

  test("SHA3 and SHA-2 tail digests (JDK provider)") {
    // NIST SHA-3 test vector: empty message
    assert(top("'' SHA3.256 ->HEX") ==
      "a7ffc6f8bf1ed76651c14756a061d662f580ff4de43b49fa82d80a4b80f8434a")
    assert(top("'abc' SHA224 ->HEX") ==
      "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7")
  }

  test("SipHash-2-4 HASH against the SipHash paper vector") {
    // Aumasson-Bernstein appendix: key 000102..0f, msg 00..0e
    assert(top(
      "'000102030405060708090a0b0c0d0e' HEX-> 0x0706050403020100 0x0f0e0d0c0b0a0908 HASH") ==
      0xa129ca6149be45e5L)
    // default key (0, 0) is stable
    assert(top("'' HASH") == top("'' HASH"))
  }

  test("HMAC words match RFC 2202/4231 vectors") {
    assert(top("'what do ya want for nothing?' 'Jefe' SHA256HMAC ->HEX") ==
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
  }

  test("GZIP/DEFLATE stack round-trips") {
    assert(top("'squeeze me' 'UTF-8' ->BYTES GZIP UNGZIP 'UTF-8' BYTES->") ==
      "squeeze me")
    assert(top("'flate' 'UTF-8' ->BYTES DEFLATE INFLATE 'UTF-8' BYTES->") ==
      "flate")
  }

  test("EC keygen / sign / verify / ECDH round-trip") {
    assert(eng.run(
      """'secp256r1' ECGEN 'pub' STORE 'priv' STORE
        |'msg' 'SHA256WITHECDSA' $priv ECPRIVATE ECSIGN
        |'sig' STORE 'msg' $sig 'SHA256WITHECDSA' $pub ECPUBLIC ECVERIFY
        |""".stripMargin).head == true)
    // two keypairs agree on the shared secret
    assert(eng.run(
      """'secp256r1' ECGEN 'pubA' STORE 'privA' STORE
        |'secp256r1' ECGEN 'pubB' STORE 'privB' STORE
        |$privA ECPRIVATE $pubB ECPUBLIC ECDH
        |$privB ECPRIVATE $pubA ECPUBLIC ECDH
        |==""".stripMargin).head == true)
  }

  // --------------------------------------------------------- GTS tail

  private def sampleFrame = {
    val s = spark
    import org.apache.spark.sql.functions._
    val df = s.range(10).select(
      lit("t.m").as("class"),
      typedLit(Map("u" -> "1")).as("labels"),
      lit(0L).as("gtsid"),
      (col("id") * 1000000L).as("ts"),
      lit(null).cast("double").as("lat"), lit(null).cast("double").as("lon"),
      lit(null).cast("long").as("elev"),
      lit(graft.model.GtsType.DOUBLE).as("vtype"),
      lit(null).cast("long").as("vlong"),
      (col("id") % 4).cast("double").as("vdouble"),
      lit(null).cast("boolean").as("vbool"),
      lit(null).cast("string").as("vstring"),
      lit(null).cast("binary").as("vbinary"))
    graft.operators.GtsFrame(graft.model.Gts.canonicalRehash(df))
  }

  private def engWith(f: graft.operators.GtsFrame) = new WarpScriptEngine(
    fetch = (_, _, _, _) => f, nowTs = 0L,
    session = Some(spark))

  test("SHRINK keeps earliest (positive) / latest (negative) points") {
    val e = engWith(sampleFrame)
    assert(e.run("[ '' '~.*' { } 100000000 100000001 ] FETCH 3 SHRINK SIZE").head == 3L)
    assert(e.run("[ '' '~.*' { } 100000000 100000001 ] FETCH 3 SHRINK TICKS").head ==
      Vector(0L, 1000000L, 2000000L))
    assert(e.run("[ '' '~.*' { } 100000000 100000001 ] FETCH -2 SHRINK TICKS").head ==
      Vector(8000000L, 9000000L))
  }

  test("VALUES, VALUEHISTOGRAM, VALUEDEDUP") {
    val e = engWith(sampleFrame)
    assert(e.run("[ '' '~.*' { } 100000000 100000001 ] FETCH VALUES SIZE").head == 10L)
    assert(e.run("[ '' '~.*' { } 100000000 100000001 ] FETCH VALUEHISTOGRAM 0.0 GET")
      .head == 3L) // values 0,4,8 → three 0.0
    assert(e.run("[ '' '~.*' { } 100000000 100000001 ] FETCH true VALUEDEDUP SIZE")
      .head == 4L)
    assert(e.run("[ '' '~.*' { } 100000000 100000001 ] FETCH true VALUEDEDUP TICKS")
      .head == Vector(0L, 1000000L, 2000000L, 3000000L))
  }

  test("MUSIGMA and NSUMSUMSQ scalars") {
    val e = engWith(sampleFrame)
    val out = e.run("[ '' '~.*' { } 100000000 100000001 ] FETCH NSUMSUMSQ")
    assert(out == List(29.0, 13.0, 10L)) // sumsq, sum, n (top first)
    val ms = e.run("[ '' '~.*' { } 100000000 100000001 ] FETCH false MUSIGMA")
    assert(ms(1) == 1.3) // mu = 13/10
  }

  test("MONOTONIC running clamp") {
    val e = engWith(sampleFrame)
    // ascending clamp: values 0 1 2 3 0→3 1→3 2→3 3 0→3 1→3
    assert(e.run("[ '' '~.*' { } 100000000 100000001 ] FETCH false MONOTONIC VALUES")
      .head == Vector(0.0, 1.0, 2.0, 3.0, 3.0, 3.0, 3.0, 3.0, 3.0, 3.0))
  }

  test("CLIP, REMOVETICK, SETVALUE, ATTICK") {
    val e = engWith(sampleFrame)
    assert(e.run(
      "[ '' '~.*' { } 100000000 100000001 ] FETCH [ [ 1000000 3000000 ] ] CLIP SIZE")
      .head == 3L)
    assert(e.run("[ '' '~.*' { } 100000000 100000001 ] FETCH 0 REMOVETICK SIZE")
      .head == 9L)
    assert(e.run(
      "[ '' '~.*' { } 100000000 100000001 ] FETCH [ 500 99.0 ] SETVALUE 500 ATTICK 4 GET")
      .head == 99.0)
  }

  test("THRESHOLDTEST and GRUBBSTEST flag shapes") {
    val e = engWith(sampleFrame)
    assert(e.run("[ '' '~.*' { } 100000000 100000001 ] FETCH 3.0 THRESHOLDTEST SIZE")
      .head == 2L) // values >= 3: ticks 3,7
  }

  test("PARTITION and FILTERBY group series") {
    val s = spark
    import org.apache.spark.sql.functions._
    val df = s.range(6).select(
      lit("t.m").as("class"),
      map(lit("u"), (col("id") % 2).cast("string")).as("labels"),
      lit(0L).as("gtsid"), (col("id") * 1000L).as("ts"),
      lit(null).cast("double").as("lat"), lit(null).cast("double").as("lon"),
      lit(null).cast("long").as("elev"),
      lit(graft.model.GtsType.DOUBLE).as("vtype"),
      lit(null).cast("long").as("vlong"),
      col("id").cast("double").as("vdouble"),
      lit(null).cast("boolean").as("vbool"),
      lit(null).cast("string").as("vstring"),
      lit(null).cast("binary").as("vbinary"))
    val e = engWith(graft.operators.GtsFrame(graft.model.Gts.canonicalRehash(df)))
    assert(e.run("[ '' '~.*' { } 100000000 100000001 ] FETCH [ 'u' ] PARTITION SIZE")
      .head == 2L)
    assert(e.run(
      """[ '' '~.*' { } 100000000 100000001 ] FETCH
        |<% LABELS 'u' GET '0' == %> FILTERBY SIZE""".stripMargin)
      .head == 3L)
  }

  test("GROUPBY keys series via metadata macro (fast path) and outer-scope macro (fallback)") {
    val s = spark
    import org.apache.spark.sql.functions._
    val df = s.range(6).select(
      lit("t.m").as("class"),
      map(lit("u"), (col("id") % 3).cast("string")).as("labels"),
      lit(0L).as("gtsid"), (col("id") * 1000L).as("ts"),
      lit(null).cast("double").as("lat"), lit(null).cast("double").as("lon"),
      lit(null).cast("long").as("elev"),
      lit(graft.model.GtsType.DOUBLE).as("vtype"),
      lit(null).cast("long").as("vlong"),
      col("id").cast("double").as("vdouble"),
      lit(null).cast("boolean").as("vbool"),
      lit(null).cast("string").as("vstring"),
      lit(null).cast("binary").as("vbinary"))
    val e = engWith(graft.operators.GtsFrame(graft.model.Gts.canonicalRehash(df)))
    // metadata-only macro → ScalarEval single-pass path; 3 user groups
    val m = e.run(
      """[ '' '~.*' { } 100000000 100000001 ] FETCH
        |<% LABELS 'u' GET %> GROUPBY""".stripMargin)
      .head.asInstanceOf[Map[Any, Any]]
    assert(m.keySet == Set("0", "1", "2"))
    assert(m("1").asInstanceOf[graft.operators.GtsFrame].df.count() == 2L)
    // outer-$var macro → engine fallback path, same grouping
    val m2 = e.run(
      """'u' 'k' STORE
        |[ '' '~.*' { } 100000000 100000001 ] FETCH
        |<% LABELS $k GET %> GROUPBY""".stripMargin)
      .head.asInstanceOf[Map[Any, Any]]
    assert(m2.keySet == Set("0", "1", "2"))
  }

  test("MAKEGTS and PARSE construct frames") {
    val e = engWith(sampleFrame)
    assert(e.run(
      "[ 1 2 ] [ ] [ ] [ ] [ 10.0 20.0 ] MAKEGTS " +
        "'made' RENAME { 'x' '1' } RELABEL SIZE")
      .head == 2L)
    // reference padding rules (fn/MAKEGTS.java:89-108): a short values
    // list repeats its LAST element; missing ticks auto-increment from
    // the last explicit one; value types are preserved
    assert(e.run("[ 5 ] [ ] [ ] [ ] [ 7 8 ] MAKEGTS TICKLIST").head ==
      Vector(5L, 6L))
    assert(e.run("[ 1 2 3 ] [ ] [ ] [ ] [ 9 ] MAKEGTS VALUES").head ==
      Vector(9L, 9L, 9L))
    assert(e.run("<'\n1000// p.q{a=b} 42.0\n2000// p.q{a=b} 43.0\n'>\nPARSE SIZE")
      .head == 2L)
  }

  test("order words on stack-built series (faithful r13 audit)") {
    // CLONEREVERSE = REVERSE(stable=false): a LIST word, not a GTS one
    // (WarpScriptLib.java:2042)
    assert(top("[ 1 2 3 ] CLONEREVERSE") == Vector(3L, 2L, 1L))
    assert(top("'abc' CLONEREVERSE") == "cba")
    val dup = """NEWGTS 'g' RENAME
                |300 NaN NaN NULL 7 ADDVALUE
                |100 NaN NaN NULL 9 ADDVALUE
                |100 NaN NaN NULL 5 ADDVALUE""".stripMargin
    // TICKLIST: one entry per point, CURRENT order, duplicates kept
    // (GTSHelper.tickList:1310); TICKS is the set+sort word
    assert(top(s"$dup TICKLIST") == Vector(300L, 100L, 100L))
    // VALUESORT reorders by (value, tick) — observable via VALUES
    // (current-order read, fn/VALUES.java); RVALUESORT reverses both
    assert(top(s"$dup VALUESORT VALUES") == Vector(5L, 7L, 9L))
    assert(top(s"$dup RVALUESORT VALUES") == Vector(9L, 7L, 5L))
    // ATINDEX: current order, python-style negative wrap, OOB throws
    // (GET.computeAndCheckIndex:111-122)
    // absent lat/elev slots are Double.NaN (ATINDEX.getTupleAtIndex)
    def tsAndValue(p: Any) = {
      val v = p.asInstanceOf[Vector[Any]]
      assert(v(1).asInstanceOf[Double].isNaN &&
        v(3).asInstanceOf[Double].isNaN)
      (v(0), v(4))
    }
    assert(tsAndValue(top(s"$dup -1 ATINDEX")) == ((100L, 5L)))
    assert(tsAndValue(top(s"$dup VALUESORT 0 ATINDEX")) == ((100L, 5L)))
    intercept[Exception](top(s"$dup 3 ATINDEX"))
    // LASTSORT: by value at the newest tick, empty series last
    // (fn/LASTSORT.java LAST_COMPARATOR)
    val g1 = "NEWGTS 'a' RENAME 10 NaN NaN NULL 9 ADDVALUE"
    val g2 = "NEWGTS 'b' RENAME 20 NaN NaN NULL 2 ADDVALUE"
    val g3 = "NEWGTS 'c' RENAME"
    val ls = eng.run(s"[ $g1 $g2 $g3 ] LASTSORT").head
      .asInstanceOf[Vector[WarpScriptEngine.GtsBuilder]]
    assert(ls.map(_.cls) == Vector("b", "a", "c"))
    // METASORT consumes its fields list (the old binding left it on
    // the stack) and sorts by name / by a label field, nulls first
    val ms = eng.run(s"[ $g2 $g1 ] [ ] METASORT").head
      .asInstanceOf[Vector[WarpScriptEngine.GtsBuilder]]
    assert(ms.map(_.cls) == Vector("a", "b"))
    val byLabel = eng.run(
      s"""[ NEWGTS 'x' RENAME { 'u' '2' } RELABEL
         |  NEWGTS 'y' RENAME { 'u' '1' } RELABEL ] [ 'u' ] METASORT"""
        .stripMargin).head.asInstanceOf[Vector[WarpScriptEngine.GtsBuilder]]
    assert(byLabel.map(_.cls) == Vector("y", "x"))
  }

  test("SORT/SETVALUE/ADDVALUE/REMOVETICK faithful faces (r13 audit)") {
    val dup = """NEWGTS 'g' RENAME
                |300 NaN NaN NULL 7 ADDVALUE
                |100 NaN NaN NULL 9 ADDVALUE
                |100 NaN NaN NULL 5 ADDVALUE""".stripMargin
    // SORT by tick (stable among equal ticks), RSORT reversed,
    // FULLSORT by (tick, value) — GTSHelper.sort / fullsort:282-331
    assert(top(s"$dup SORT TICKLIST") == Vector(100L, 100L, 300L))
    assert(top(s"$dup SORT VALUES") == Vector(9L, 5L, 7L))
    assert(top(s"$dup RSORT TICKLIST") == Vector(300L, 100L, 100L))
    assert(top(s"$dup FULLSORT VALUES") == Vector(5L, 9L, 7L))
    // SETVALUE (= ADDVALUE overwrite=true): replaces the FIRST point
    // at the tick IN PLACE, keeps other duplicates; appends if absent
    assert(top(s"$dup [ 100 NaN NaN NULL 42 ] SETVALUE VALUES") ==
      Vector(7L, 42L, 5L))
    // the five-scalar reference arity (ADDVALUE.java:30-56)
    assert(top(s"$dup 100 NaN NaN NULL 42 SETVALUE VALUES") ==
      Vector(7L, 42L, 5L))
    assert(top(s"$dup 500 NaN NaN NULL 1 SETVALUE TICKLIST") ==
      Vector(300L, 100L, 100L, 500L))
    // ADDVALUE's tuple arity (the mapper-result shape)
    assert(top(s"$dup [ 400 NaN NaN NULL 1 ] ADDVALUE TICKLIST") ==
      Vector(300L, 100L, 100L, 400L))
    // REMOVETICK takes a tick or a collection (REMOVETICK.java:9-28)
    assert(top(s"$dup [ 100 ] REMOVETICK TICKLIST") == Vector(300L))
    assert(top(s"$dup 300 REMOVETICK TICKLIST") == Vector(100L, 100L))
  }

  test("EMPTY/NONEMPTY filter GTS lists (r13 audit)") {
    // fn/EMPTY.java / NONEMPTY.java: both FILTER a list of series
    // (flattened one level) — the old NONEMPTY merged into one frame
    val lst = """[ NEWGTS 'a' RENAME 1 NaN NaN NULL 1 ADDVALUE
                |  [ NEWGTS 'b' RENAME 2 NaN NaN NULL 2 ADDVALUE
                |    NEWGTS 'c' RENAME ] ]""".stripMargin
    def classes(x: Any) = x.asInstanceOf[Vector[WarpScriptEngine.GtsBuilder]]
      .map(_.cls)
    assert(classes(top(s"$lst NONEMPTY")) == Vector("a", "b"))
    assert(classes(top(s"$lst EMPTY")) == Vector("c"))
  }

  test("bucket metadata words") {
    val e = engWith(sampleFrame)
    val prog = "[ [ '' '~.*' { } 100000000 100000001 ] FETCH bucketizer.sum 9000000 1 s 0 ] BUCKETIZE"
    assert(e.run(s"$prog LASTBUCKET").head == 9000000L)
    assert(e.run(s"$prog BUCKETSPAN").head == 1000000L)
    assert(e.run(s"$prog BUCKETCOUNT").head == 10L)
    assert(e.run(s"$prog UNBUCKETIZE TYPEOF").head == "GTS")
  }
}
