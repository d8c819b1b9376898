package graft

import org.apache.spark.sql.functions._

import graft.script.WarpScriptEngine

/** MACRO* adapter words: user macros running as mapper/bucketizer/
  * reducer/filter on the executors via ScalarEval. */
class WsMacroAdapterSpec extends SparkSpec {

  private def mkFrame(series: Seq[(String, String, Seq[(Long, Double)])]) = {
    val s = spark
    val rows = series.flatMap { case (cls, user, pts) =>
      pts.map { case (t, v) => (cls, user, t, v) }
    }
    val df = s.createDataFrame(rows).toDF("c", "u", "t", "v").select(
      col("c").as("class"),
      map(lit("user"), col("u")).as("labels"),
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

  private def eng(f: graft.operators.GtsFrame) = new WarpScriptEngine(
    fetch = (_, _, _, _) => f, nowTs = 0L, session = Some(spark))

  test("MACROMAPPER: window sum-of-values macro == mapper.sum") {
    val f = mkFrame(Seq(("a.b", "1", Seq(0L -> 1.0, 1L -> 2.0, 2L -> 4.0, 5L -> 8.0))))
    val e = eng(f)
    // the macro pops the 8-element params list, keeps values (idx 7), sums
    val macroSum =
      """<% 7 GET 0.0 SWAP <% + %> FOREACH %> MACROMAPPER"""
    val out = e.run(
      s"""[ [ '' '~.*' { } 100 101 ] FETCH $macroSum -2 0 0 ] MAP VALUES""")
      .head.asInstanceOf[Vector[Any]]
    // time window [t-2, t]: sums 1 / 1+2 / 1+2+4 / 8
    assert(out == Vector(1.0, 3.0, 7.0, 8.0))
  }

  test("MACROMAPPER list return overrides the tick/value") {
    val f = mkFrame(Seq(("a.b", "1", Seq(0L -> 1.0, 1L -> 2.0))))
    val e = eng(f)
    // [ tick value ] form: shift tick +10, value = 2x
    val df = e.runToFrame(
      """[ [ '' '~.*' { } 100 101 ] FETCH
        |<% LIST-> DROP 'vs' STORE DROP DROP DROP DROP DROP 'ns' STORE 'tick' STORE
        |   [ $tick 10 + $vs 0 GET 2.0 * ] %> MACROMAPPER
        |0 0 0 ] MAP""".stripMargin)
    val rows = df.select("ts", "vdouble").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((10L, 2.0), (11L, 4.0)))
  }

  test("MACROBUCKETIZER: bucket max via macro") {
    val f = mkFrame(Seq(("a.b", "1", Seq(1L -> 1.0, 2L -> 5.0, 11L -> 3.0, 12L -> 2.0))))
    val e = eng(f)
    val out = e.run(
      """[ [ '' '~.*' { } 100 101 ] FETCH
        |<% 7 GET DUP 0 GET SWAP <% MAX %> FOREACH %> MACROBUCKETIZER
        |20 10 0 ] BUCKETIZE VALUES""".stripMargin)
      .head.asInstanceOf[Vector[Any]]
    assert(out.toSet == Set(5.0, 3.0))
  }

  test("MACROREDUCER: per-tick mean across series") {
    val f = mkFrame(Seq(
      ("a.b", "1", Seq(0L -> 1.0, 1L -> 3.0)),
      ("a.c", "2", Seq(0L -> 3.0, 1L -> 5.0))))
    val e = eng(f)
    val df = e.runToFrame(
      """[ [ '' '~.*' { } 100 101 ] FETCH [ ]
        |<% DUP 7 GET 0.0 SWAP <% + %> FOREACH SWAP 7 GET SIZE TODOUBLE / %>
        |MACROREDUCER ] REDUCE""".stripMargin)
    val rows = df.select("ts", "vdouble").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((0L, 2.0), (1L, 4.0)))
  }

  test("MACROFILTER: keep series whose name matches") {
    val f = mkFrame(Seq(
      ("a.b", "1", Seq(0L -> 1.0)),
      ("a.c", "2", Seq(0L -> 2.0))))
    val e = eng(f)
    val df = e.runToFrame(
      """[ [ '' '~.*' { } 100 101 ] FETCH [ ]
        |<% 0 GET NAME 'a.b' == %> MACROFILTER ] FILTER""".stripMargin)
    val classes = df.select("class").collect().map(_.getString(0)).toSet
    assert(classes == Set("a.b"))
  }
}
