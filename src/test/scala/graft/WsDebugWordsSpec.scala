package graft

import graft.script.WarpScriptEngine

/** Stack introspection / limits / DEF / secure / debug word batch. */
class WsDebugWordsSpec extends SparkSpec {

  private def eng = new WarpScriptEngine(
    fetch = (_, _, _, _) => throw new UnsupportedOperationException("no storage"),
    nowTs = 0L, session = Some(spark))

  private def top(p: String): Any = eng.run(p).head

  test("DEF defines a word dispatched before builtins; CLEARDEFS removes") {
    assert(top("<% 2 * %> 'DOUBLEIT' DEF 21 DOUBLEIT") == 42L)
    // redefining works (REDEFS allows)
    assert(top("<% 2 * %> 'DOUBLEIT' DEF <% 3 * %> 'DOUBLEIT' DEF 10 DOUBLEIT") == 30L)
    intercept[IllegalArgumentException] {
      top("<% 2 * %> 'DOUBLEIT' DEF CLEARDEFS 21 DOUBLEIT")
    }
  }

  test("OPS counts, limits store, ELAPSED is positive") {
    assert(top("1 2 + OPS").asInstanceOf[Long] >= 2L)
    assert(top("100000 MAXOPS 1 1 + ") == 2L)
    assert(top("ELAPSED").asInstanceOf[Long] > 0L)
  }

  test("CHRONOSTART/CHRONOEND/CHRONOSTATS accumulate per alias") {
    val stats = top(
      "'a' CHRONOSTART 1 2 + DROP 'a' CHRONOEND CHRONOSTATS")
      .asInstanceOf[Map[Any, Any]]
    val a = stats("a").asInstanceOf[Map[Any, Any]]
    assert(a("calls") == 1L && a("total_ns").asInstanceOf[Long] >= 0L)
  }

  test("TIMED pushes nanos; TIMEBOX aborts a runaway macro") {
    val st = eng.run("<% 1 1 + DROP %> TIMED")
    assert(st.head.asInstanceOf[Long] >= 0L)
    intercept[Exception] {
      // infinite loop, 50 ms box
      top("<% <% true %> <% %> WHILE %> 50000 TIMEBOX")
    }
  }

  test("HIDE / SHOW with and without counts") {
    assert(eng.run("1 2 3 NULL HIDE") == List(3L))
    assert(eng.run("1 2 3 NULL HIDE DROP NULL SHOW") == List(3L, 2L, 1L))
    // keep top 1 visible, hide 2; then restore all
    assert(eng.run("1 2 3 1 HIDE DROP NULL SHOW") == List(3L, 2L, 1L))
    // HIDE pushed the count (2) which DROP removed; 1 SHOW restores the
    // shallowest hidden level (2) under the visible 3
    assert(eng.run("1 2 3 1 HIDE DROP 1 SHOW") == List(3L, 2L))
  }

  test("SAVE / RESTORE round-trips symbols; RESET truncates the stack") {
    assert(top("5 'x' STORE SAVE 9 'x' STORE RESTORE $x") == 5L)
    // reset truncates from the top, keeping the DEEPEST n levels
    assert(eng.run("1 2 3 4 2 RESET") == List(2L, 1L))
  }

  test("SECUREKEY / SECURE / UNSECURE / EVALSECURE round-trip") {
    assert(top("'k1' SECUREKEY '1 2 +' SECURE UNSECURE") == "1 2 +")
    assert(top("'k1' SECUREKEY '1 2 +' SECURE EVALSECURE") == 3L)
    intercept[IllegalStateException] { top("'x' SECURE") }
  }

  test("VARS lists macro symbols; DEREF substitutes literals") {
    assert(top("<% 'a' STORE $b 'c' LOAD %> VARS").asInstanceOf[Vector[Any]]
      .toSet == Set("a", "b", "c"))
    assert(top("<% $x 2 * %> { 'x' 21 } DEREF EVAL") == 42L)
    assert(top("<% 'y' LOAD 3 + %> { 'y' 39 } DEREF EVAL") == 42L)
  }

  test("SET updates list elements incl. nested paths and negative index") {
    assert(top("[ 1 2 3 ] 9 1 SET") == Vector(1L, 9L, 3L))
    assert(top("[ 1 2 3 ] 9 -1 SET") == Vector(1L, 2L, 9L))
    assert(top("[ [ 1 2 ] [ 3 4 ] ] 9 [ 1 0 ] SET") ==
      Vector(Vector(1L, 2L), Vector(9L, 4L)))
  }

  test("CAPADD / CAPGET / CAPCHECK / CAPDEL capability store") {
    assert(top("'sleep.max=5000,kv.limit=10' CAPADD 'sleep.max' CAPGET") == "5000")
    assert(top("'a=1' CAPADD 'a' CAPCHECK") == true)
    assert(top("'a=1' CAPADD 'a' CAPDEL 'a' CAPCHECK") == false)
    assert(top("'a=1,b=2' CAPADD [ 'a' 'z' ] CAPGET") ==
      Map("a" -> "1", "z" -> null))
  }

  test("FUNCREF / COMPILE / DUMP / REV / STACKATTRIBUTE") {
    assert(top("'ABS' FUNCREF 'f' STORE -4 $f EVAL") == 4L)
    assert(top("<% 1 + %> COMPILE 'm' STORE 41 $m EVAL") == 42L)
    assert(top("1 2 DUMP").asInstanceOf[String].contains("1: 2"))
    assert(top("REV").asInstanceOf[String].nonEmpty)
    assert(top("123 MAXOPS 'MAXOPS' STACKATTRIBUTE") == 123L)
  }
}
