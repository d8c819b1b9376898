package graft

import graft.script.WarpScriptEngine

/** BD suite, JSON words, SNAPSHOT variants, macro words, Base58 and
  * TEMPLATE semantics (fn/BDMOD.java family, fn/TOJSON.java,
  * fn/SNAPSHOT.java variants, fn/TOB58.java). */
class WarpScriptSpec3 extends SparkSpec {

  private def eng = new WarpScriptEngine(
    fetch = (_, _, _, _) => throw new UnsupportedOperationException("no storage"),
    nowTs = 0L)

  private def top(program: String): Any = eng.run(program).head
  private def bd(s: String) = new java.math.BigDecimal(s)

  test("BD arithmetic tail") {
    assert(top("17 5 BDMOD") == bd("2"))
    assert(top("-17 5 BDMOD") == bd("3")) // mod is non-negative
    assert(top("-17 5 BDREM") == bd("-2")) // remainder keeps sign
    assert(top("'1.5' TOBD 3 BDPOW") == bd("3.375"))
    assert(top("17 5 BDDIVINT") == bd("3"))
    assert(eng.run("17 5 BDDIVIDEANDREMAINDER") == List(bd("2"), bd("3")))
    assert(top("'2.5' TOBD BDCEIL") == bd("3"))
    assert(top("'2.5' TOBD BDFLOOR") == bd("2"))
    assert(top("'-2.5' TOBD BDCLEAR") == bd("-2"))
    assert(top("3 7 BDCOMP") == -1L)
  }

  test("BD number theory and bits") {
    assert(top("48 36 BDGCD") == bd("12"))
    assert(top("4 13 497 BDMODPOW") == bd("445"))
    assert(top("3 11 BDMODINVERSE") == bd("4"))
    assert(eng.run("97 30 BDISPROBABLEPRIME").head == true)
    assert(top("90 BDNEXTPROBABLEPRIME") == bd("97"))
    assert(top("12 10 BDAND") == bd("8"))
    assert(top("12 10 BDOR") == bd("14"))
    assert(top("12 10 BDXOR") == bd("6"))
    assert(top("12 10 BDANDNOT") == bd("4"))
    assert(top("0 BDNOT") == bd("-1"))
    assert(top("3 4 BDSHIFTLEFT") == bd("48"))
    assert(top("48 4 BDSHIFTRIGHT") == bd("3"))
    assert(top("0 3 BDSETBIT") == bd("8"))
    assert(top("15 0 BDCLEARBIT") == bd("14"))
    assert(top("8 3 BDFLIPBIT") == bd("0"))
    assert(eng.run("8 3 BDTESTBIT").head == true)
    assert(top("255 BDBITCOUNT") == 8L)
    assert(top("255 BDBITLENGTH") == 8L)
    assert(top("48 BDLOWESTSETBIT") == 4L)
    assert(top("'3.25' TOBD BD->") == "3.25")
    assert(top("255 ->BD 1 BDSHIFTLEFT BD->") == "510")
  }

  test("JSON round-trip and deterministic rendering") {
    assert(top("'{\"b\": [1, 2.5, \"x\"], \"a\": true}' JSON->") ==
      Map("b" -> Vector(1L, 2.5, "x"), "a" -> true))
    assert(top("{ 'b' 2 'a' 1 } ->JSON") == """{"a":1,"b":2}""")
    assert(top("[ 1 2.5 'x' true NULL ] ->JSON") == """[1,2.5,"x",true,null]""")
    assert(top("'[1,2]' JSON-> ->JSON") == "[1,2]")
    // loose mode accepts NaN
    assert(top("JSONLOOSE '[NaN]' JSON-> 0 GET ISNaN") == true)
  }

  test("SNAPSHOT variants rebuild the stack") {
    assert(eng.run("1 'two' 3.5 SNAPSHOTALL").head == "1 'two' 3.5")
    assert(eng.run("1 'two' SNAPSHOTCOPY") ==
      List("'two'", "two", 1L))
    assert(eng.run("7 MARK 1 2 SNAPSHOTTOMARK") == List("1 2", 7L))
    assert(eng.run("1 2 3 2 SNAPSHOTN") == List("2 3", 1L))
    // snapshot text re-evaluates to the same stack
    assert(eng.run("1 'two' 3.5 SNAPSHOTALL EVAL") == List(3.5, "two", 1L))
  }

  test("macro words: MACRO->, ->MACRO, RUN, DEFINEDMACRO, XEVAL") {
    assert(top("<% 1 2 + %> MACRO->") == "<% 1 2 + %>")
    // (multiline string: '%' needs no %25 escape there)
    assert(top("<'\n<% 2 3 * %>\n'>\n->MACRO EVAL") == 6L)
    assert(top("<% 5 %> 'm' STORE 'm' RUN") == 5L)
    assert(eng.run("<% 1 %> 'm' STORE 'm' DEFINEDMACRO").head == true)
    assert(eng.run("'nope' DEFINEDMACRO").head == false)
    assert(top("'7 3 +' XEVAL") == 10L)
    assert(top("<% 1 2 + %> MACRO-> ->MACRO EVAL") == 3L)
  }

  test("TEMPLATE variable interpolation") {
    assert(top("'x={{a}} y={{b}} z={{missing}}' { 'a' 1 'b' 'two' } TEMPLATE") ==
      "x=1 y=two z=")
  }

  test("TOBOOLEAN and PARSEVALUE") {
    assert(eng.run("'true' TOBOOLEAN").head == true)
    assert(eng.run("0 TOBOOLEAN").head == false)
    assert(top("'42' PARSEVALUE") == 42L)
    assert(top("'4.5' PARSEVALUE") == 4.5)
    assert(top("\"'hello'\" PARSEVALUE") == "hello")
    assert(eng.run("'T' PARSEVALUE").head == true)
  }

  test("Base58 and Base58Check round-trips") {
    // well-known vector: 'Hello World!' in base58
    assert(top("'Hello World!' 'UTF-8' ->BYTES ->B58") ==
      "2NEpo7TZRRrLZSi2U")
    assert(top("'2NEpo7TZRRrLZSi2U' B58-> 'UTF-8' BYTES->") == "Hello World!")
    assert(top("'payload' 'UTF-8' ->BYTES '00' HEX-> ->B58C B58C-> ->HEX") ==
      "007061796c6f6164") // prefix 00 + 'payload' UTF-8 hex
    intercept[IllegalArgumentException](
      eng.run("'payload' 'UTF-8' ->BYTES '00' HEX-> ->B58C " +
        "DUP SIZE 1 - 1 SWAP SUBSTRING B58C->")) // corrupt → checksum fails
  }
}
