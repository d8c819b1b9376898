package graft

import graft.script.WarpScriptEngine

/** Round-6 word tail, part 2: collection literals, sliding-window
  * sentinels, MFILTER, MINREV/MAXREV, REF, UPDATE/DELETE session store,
  * MACROCONFIG family. */
class WsExt5bSpec extends SparkSpec {

  private def eng = new WarpScriptEngine(
    fetch = (_, _, _, _) => graft.operators.GtsFrame(
      graft.model.Gts.canonical(spark.emptyDataFrame
        .sparkSession.range(0).selectExpr(
          "'x' as class", "map('u','0') as labels", "id as ts",
          "cast(null as double) as lat", "cast(null as double) as lon",
          "cast(null as long) as elev", "cast(1 as tinyint) as vtype",
          "cast(null as long) as vlong", "cast(id as double) as vdouble",
          "cast(null as boolean) as vbool", "cast(null as string) as vstring",
          "cast(null as binary) as vbinary"))),
    nowTs = 0L, session = Some(spark))

  test("empty-collection literals and set/vector delimiters") {
    val e = eng
    assert(e.run("[] SIZE").head == 0L)
    assert(e.run("{} SIZE").head == 0L)
    assert(e.run("() SIZE").head == 0L)
    assert(e.run("[[]] SIZE").head == 0L)
    assert(e.run("( 1 2 2 3 ) SIZE").head == 3L)   // set dedups
    assert(e.run("( 1 2 ) TYPEOF").head == "SET")
    assert(e.run("[[ 1 2 3 ]] SIZE").head == 3L)
    assert(e.run("[[ 1 2 3 ]] TYPEOF").head == "LIST")
  }

  test("sliding-window sentinels carry the reference values") {
    val e = eng
    assert(e.run("max.tick.sliding.window").head == Long.MaxValue / 2L)
    assert(e.run("max.time.sliding.window").head == Long.MinValue / 2L)
  }

  test("MFILTER keeps entries the macro accepts") {
    val e = eng
    val m = e.run("{ 'a' 1 'b' 2 'c' 3 } <% DROP 'v' STORE DROP $v 1 > %> MFILTER")
      .head.asInstanceOf[Map[Any, Any]]
    assert(m.keySet == Set("b", "c"))
    // boolean false suppresses the index argument
    val m2 = e.run("{ 'a' 1 'b' 2 } <% 'v' STORE DROP $v 2 == %> false MFILTER")
      .head.asInstanceOf[Map[Any, Any]]
    assert(m2.keySet == Set("b"))
  }

  test("MINREV/MAXREV gate on the platform revision") {
    val e = eng
    e.run("'1.0.0' MINREV")          // ok: platform >= 1.0.0
    e.run("'99.0.0' MAXREV")         // ok: platform <= 99
    intercept[IllegalStateException](e.run("'99.0.0' MINREV"))
    intercept[IllegalStateException](e.run("'1.0.0' MAXREV"))
  }

  test("REF pushes an EVAL-able self reference") {
    val e = eng
    assert(e.run("REF TYPEOF").head == "FUNCTION")
  }

  test("UPDATE feeds subsequent FETCH; DELETE removes from the session store") {
    val e = eng
    val prog =
      """[ 1000 2000 3000 ] [ ] [ ] [ ] [ 1.0 2.0 3.0 ] MAKEGTS
        |'sensor.temp' RENAME { 'room' 'a' } RELABEL UPDATE
        |[ '' 'sensor.temp' { 'room' 'a' } 10000 10001 ] FETCH SIZE""".stripMargin
    assert(e.run(prog).head == 3L)
    // time-ranged FETCH clips session points too
    val clipped =
      """NEWGTS 'sensor.hum' RENAME 'g' STORE
        |$g 1000 NaN NaN NULL 1.0 ADDVALUE
        |2000 NaN NaN NULL 2.0 ADDVALUE UPDATE
        |[ '' 'sensor.hum' { } 1500 1501 ] FETCH SIZE""".stripMargin
    assert(eng.run(clipped).head == 1L)
    // DELETE removes a tick range and reports the touched series
    val deleted =
      """NEWGTS 'sensor.co2' RENAME 'g' STORE
        |$g 1000 NaN NaN NULL 1.0 ADDVALUE
        |2000 NaN NaN NULL 2.0 ADDVALUE UPDATE
        |'tok' 'sensor.co2{}' 0 1500 DELETE
        |[ '' 'sensor.co2' { } 100000 100001 ] FETCH SIZE""".stripMargin
    val out = eng.run(deleted)
    assert(out(0) == 1L) // one point remains
    assert(out(1) == 1L) // one series touched
  }

  test("MACROCONFIG resolves config, defaults, and throws when absent") {
    val e = eng
    assert(e.run("'k' 42 SETMACROCONFIG 'k' MACROCONFIG").head == 42L)
    assert(e.run("'d' 'fallback' MACROCONFIGDEFAULT 'd' MACROCONFIG").head == "fallback")
    intercept[IllegalArgumentException](e.run("'missing' MACROCONFIG"))
  }
}
