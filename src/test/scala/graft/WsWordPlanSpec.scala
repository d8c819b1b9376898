package graft

import org.apache.spark.sql.functions._

import graft.script.WarpScriptEngine

/** Plan-shape locks for this round's distributed words: SMARTPARSE
  * must stay pure regexp_extract Columns (no UDF), FILLTICKS must
  * broadcast its tick grid, the interpolant mapper must stay inside
  * whole-stage codegen, and PATTERNDETECTION must plan no join. */
class WsWordPlanSpec extends SparkSpec {

  private def mkFrame = {
    val s = spark
    val pts = (0 until 200).map(i => (i.toLong, s"cpu=${i % 50}"))
    val df = s.createDataFrame(pts).toDF("t", "v").select(
      lit("p.q").as("class"), typedLit(Map("u" -> "1")).as("labels"),
      lit(0L).as("gtsid"), col("t").as("ts"),
      lit(null).cast("double").as("lat"), lit(null).cast("double").as("lon"),
      lit(null).cast("long").as("elev"),
      lit(graft.model.GtsType.STRING).as("vtype"),
      lit(null).cast("long").as("vlong"),
      col("t").cast("double").as("vdouble"),
      lit(null).cast("boolean").as("vbool"),
      col("v").as("vstring"),
      lit(null).cast("binary").as("vbinary"))
    graft.operators.GtsFrame(graft.model.Gts.canonicalRehash(df))
  }

  private def eng = new WarpScriptEngine(
    fetch = (_, _, _, _) => mkFrame, nowTs = 0L, session = Some(spark))

  private val F = "[ '' '~.*' { } 1000 1001 ] FETCH"

  test("SMARTPARSE plans as regexp Columns: no UDF, no join, no cartesian") {
    val df = eng.runToFrame(s"$F 'cpu=(?<VLcpu>\\d+)' SMARTPARSE")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BatchEvalPython") && !p.contains("CartesianProduct"))
    assert(!p.toLowerCase.contains("scalaudf"))
    assert(df.count() == 200)
  }

  test("FILLTICKS broadcasts the tick grid (no shuffle of the frame for the grid join)") {
    val df = eng.runToFrame(s"$F [ NaN NaN NULL 0.0 [ 500 501 ] ] FILLTICKS")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastExchange"))
    assert(df.count() == 202)
  }

  test("interpolant MAP stays in whole-stage codegen (no UDF, no exchange beyond the scan)") {
    val df = eng.runToFrame(
      s"""[ [ $F 7.0 mapper.mod 0 0 0 ] MAP
         |  [ 0.0 3.0 7.0 ] [ 0.0 9.0 21.0 ]
         |  INTERPOLATOR.1D.LINEAR 0 0 0 ] MAP""".stripMargin)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("scalaudf"))
    // pure-Column proof: over a local relation Catalyst constant-folds
    // the whole piecewise-Horner chain away (LocalTableScan); over a
    // file source it stays inside a WholeStageCodegen span
    assert(p.contains("WholeStageCodegen") || p.contains("LocalTableScan"))
  }

  test("PATTERNDETECTION plans one window pass: no join of any kind") {
    val df = graft.operators.StatOps.bsaxDetect(mkFrame,
      Seq(graft.kernels.SaxCodec.bsaxWord(2, Array(0, 1, 2, 3))), 4, 4, 4,
      standardizePAA = true)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("CartesianProduct"))
    // word assembly is a table lookup, not a UDF
    assert(!p.toLowerCase.contains("scalaudf"))
  }
}
