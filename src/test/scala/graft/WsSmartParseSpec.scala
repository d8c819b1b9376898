package graft

import org.apache.spark.sql.functions._

import graft.script.WarpScriptEngine

/** SMARTPARSE: named-group regexp extraction over a STRING GTS. */
class WsSmartParseSpec extends SparkSpec {

  private def strFrame(vals: Seq[(Long, String)]) = {
    val s = spark
    val df = s.createDataFrame(vals).toDF("t", "v").select(
      lit("log.line").as("class"), typedLit(Map("h" -> "web1")).as("labels"),
      lit(0L).as("gtsid"), col("t").as("ts"),
      lit(null).cast("double").as("lat"), lit(null).cast("double").as("lon"),
      lit(null).cast("long").as("elev"),
      lit(graft.model.GtsType.STRING).as("vtype"),
      lit(null).cast("long").as("vlong"), lit(null).cast("double").as("vdouble"),
      lit(null).cast("boolean").as("vbool"),
      col("v").as("vstring"),
      lit(null).cast("binary").as("vbinary"))
    graft.operators.GtsFrame(graft.model.Gts.canonicalRehash(df))
  }

  test("SMARTPARSE extracts typed value series, labels and timestamps") {
    val f = strFrame(Seq(
      (100L, "lvl=warn cpu=42 mem=1.5 at=7"),
      (200L, "lvl=info cpu=13 mem=2.25 at=9"),
      (300L, "no match here")))
    val e = new WarpScriptEngine(fetch = (_, _, _, _) => f, nowTs = 0L,
      session = Some(spark))
    val df = e.runToFrame(
      """[ '' '~.*' { } 1000 1001 ] FETCH
        |'lvl=(?<Llvl>\w+) cpu=(?<VLcpu>\d+) mem=(?<VDmem>[0-9.]+) at=(?<Ts>\d+)'
        |SMARTPARSE""".stripMargin)
    val rows = df.select(col("class"), col("labels").getItem("lvl").as("lvl"),
        col("ts"), col("vlong"), col("vdouble")).collect()
    // two matching lines x two value groups
    assert(rows.length == 4)
    val cpu = rows.filter(_.getString(0) == "cpu").sortBy(_.getLong(2))
    assert(cpu.map(_.getLong(3)).toSeq == Seq(42L, 13L))
    assert(cpu.map(_.getString(1)).toSeq == Seq("warn", "info"))
    // Ts group overrides the tick: at=7 seconds -> 7e6 us
    assert(cpu.map(_.getLong(2)).toSeq == Seq(7000000L, 9000000L))
    val mem = rows.filter(_.getString(0) == "mem")
    assert(mem.map(_.getDouble(4)).toSet == Set(1.5, 2.25))
  }

  test("SMARTPARSE emits a point per match, not just the first (matcher.find loop)") {
    val f = strFrame(Seq(
      (100L, "cpu=1 at=10; cpu=2 at=20; cpu=3 at=30"),
      (200L, "cpu=7 at=70")))
    val e = new WarpScriptEngine(fetch = (_, _, _, _) => f, nowTs = 0L,
      session = Some(spark))
    val df = e.runToFrame(
      """[ '' '~.*' { } 1000 1001 ] FETCH
        |'cpu=(?<VLcpu>\d+) at=(?<Tus>\d+)'
        |SMARTPARSE""".stripMargin)
    val rows = df.select("ts", "vlong").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(rows.toSeq == Seq((10L, 1L), (20L, 2L), (30L, 3L), (70L, 7L)))
  }

  test("SMARTPARSE parses lat/lon/elev groups") {
    val f = strFrame(Seq((5L, "pos 48.5,-4.25 alt 120 v=1")))
    val e = new WarpScriptEngine(fetch = (_, _, _, _) => f, nowTs = 0L,
      session = Some(spark))
    val df = e.runToFrame(
      """[ '' '~.*' { } 1000 1001 ] FETCH
        |'pos (?<lat>[0-9.-]+),(?<lon>[0-9.-]+) alt (?<elev>\d+) v=(?<VLv>\d+)'
        |SMARTPARSE""".stripMargin)
    val r = df.select("lat", "lon", "elev", "vlong").collect()(0)
    assert(r.getDouble(0) == 48.5 && r.getDouble(1) == -4.25)
    assert(r.getLong(2) == 120L && r.getLong(3) == 1L)
  }

  test("METAMATCH evaluates a selector against series metadata") {
    val f = strFrame(Seq((1L, "x")))
    val e = new WarpScriptEngine(fetch = (_, _, _, _) => f, nowTs = 0L,
      session = Some(spark))
    assert(e.run("[ '' '~.*' { } 10 11 ] FETCH 'log.line{h=web1}' METAMATCH").head == true)
    assert(e.run("[ '' '~.*' { } 10 11 ] FETCH 'log.line{h=other}' METAMATCH").head == false)
    assert(e.run("[ '' '~.*' { } 10 11 ] FETCH '~log\\..*{}' METAMATCH").head == true)
  }
}
