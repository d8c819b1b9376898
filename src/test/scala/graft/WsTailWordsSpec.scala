package graft

import org.apache.spark.sql.functions._

import graft.script.WarpScriptEngine

/** Tail word batch: BUCKETIZE.CALENDAR, P-aliases, IMMUTABLE,
  * PROBABILITY, ->V/V->, RETHROW/ERROR, SNAPSHOT mark variants. */
class WsTailWordsSpec extends SparkSpec {

  private def seqFrame = {
    val s = spark
    // two months of daily points (2024-01 and 2024-02), value = day
    val jan1 = 1704067200000000L
    val day = 86400000000L
    val pts = (0 until 59).map(i => (jan1 + i * day, (i % 9 + 1).toDouble))
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

  private def top(p: String): Any = eng.run(p).head

  private val F = "[ '' '~.*' { } 9999999999999999 10000000000000000 ] FETCH"

  test("BUCKETIZE.CALENDAR groups by calendar month") {
    val rows = eng.runToFrame(
      s"[ $F bucketizer.count 0 '1m' 0 ] BUCKETIZE.CALENDAR")
      .select(col("ts"), col("vdouble")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    // Jan has 31 points, Feb 28
    assert(rows.map(_._2).toSeq == Seq(31.0, 28.0))
    assert(rows(0)._1 == 1704067200000000L) // 2024-01-01T00:00:00Z
  }

  test("BUCKETIZE.CALENDAR honors the timezone argument") {
    val utc = eng.runToFrame(
      s"[ $F bucketizer.count 0 '1d' 0 ] BUCKETIZE.CALENDAR").count()
    val paris = eng.runToFrame(
      s"[ $F bucketizer.count 0 '1d' 0 'Europe/Paris' ] BUCKETIZE.CALENDAR")
      .select(col("ts")).collect().map(_.getLong(0))
    assert(utc == 59L && paris.length == 59)
    // Paris local midnight is 23:00 UTC the previous day in winter
    assert(paris.min < 1704067200000000L)
  }

  test("PROBABILITY function from a histogram") {
    assert(top("{ 'a' 1 'b' 3 } PROBABILITY 'f' STORE 'b' $f EVAL") == 0.75)
    assert(top("{ 'a' 1 'b' 3 } PROBABILITY 'f' STORE 'z' $f EVAL") == 0.0)
  }

  test("IMMUTABLE / ->V / V-> are identity on immutable containers") {
    assert(top("[ 1 2 ] IMMUTABLE") == Vector(1L, 2L))
    assert(top("[ 1 2 ] ->V V->") == Vector(1L, 2L))
  }

  test("RETHROW and ERROR surface the last TRY error") {
    val err = top(
      "<% 'boom' MSGFAIL %> <% %> <% %> TRY ERROR").asInstanceOf[Vector[Any]]
    assert(err.nonEmpty)
    intercept[IllegalStateException] {
      top("<% 'boom' MSGFAIL %> <% %> <% %> TRY RETHROW")
    }
  }

  test("SNAPSHOTALLTOMARK keeps the mark; SNAPSHOTREADABLE renders") {
    // MARK word exists? use [ as the mark
    val s = eng.run("1 MARK 2 3 SNAPSHOTALLTOMARK")
    assert(s.head.isInstanceOf[String])
    assert(top("42 SNAPSHOTREADABLE").asInstanceOf[String].contains("42"))
  }
}
