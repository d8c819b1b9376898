package graft

import org.apache.spark.sql.functions._

import graft.script.{WarpScriptEngine, WordsExt6}

/** Infra/runner word tail (WordsExt6): scheduling attributes, exec
  * headers, namespace imports, audit collection, WarpFleet repos,
  * REOPTALT trie regex, MODE statistic, capability gates. */
class WsInfraWordsSpec extends SparkSpec {

  private def modeFrame = {
    val s = spark
    val pts = Seq(1L -> 5.0, 2L -> 3.0, 3L -> 5.0, 4L -> 2.0, 5L -> 3.0, 6L -> 5.0)
    val df = s.createDataFrame(pts).toDF("t", "v").select(
      lit("m").as("class"), typedLit(Map("u" -> "1")).as("labels"),
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
    fetch = (_, _, _, _) => modeFrame, nowTs = 0L, session = Some(spark))

  private val F = "[ '' '~.*' { } 9999999999999999 10000000000000000 ] FETCH"

  test("BOOTSTRAP is a NOOP; EVERY runs the macro once") {
    assert(eng.run("1 BOOTSTRAP 2") == List(2L, 1L))
    assert(eng.run("<% 41 1 + %> 5000 EVERY") == List(42L))
  }

  test("HEADER enforces the X- prefix and supports removal") {
    assert(eng.run("'X-Graft' 'on' HEADER DEPTH") == List(0L))
    intercept[Exception] { eng.run("'Bad' 'v' HEADER") }
    // null value removes — no error even for non-X names
    assert(eng.run("'Bad' NULL HEADER DEPTH") == List(0L))
  }

  test("INFO swallows the doc map normally, pushes it and stops in INFOMODE") {
    assert(eng.run("{ 'name' 'm' } INFO 7") == List(7L))
    val out = eng.run("INFOMODE { 'name' 'm' } INFO 7")
    assert(out == List(Map("name" -> "m"))) // 7 never executes
  }

  test("MODE replays the reference's boxed-identity run detection") {
    // DOUBLE GTS: MODE.java:59 compares boxed values by object
    // identity and valueAtIndex boxes doubles fresh per call, so every
    // run has length 1 → the whole value-sorted value list comes back
    assert(eng.run(s"$F MODE").head ==
      Vector(2.0, 3.0, 3.0, 5.0, 5.0, 5.0))
    val e2 = new WarpScriptEngine(
      fetch = (_, _, _, _) => graft.operators.GtsFrame(
        modeFrame.df.filter(col("ts") =!= 6L)), nowTs = 0L, session = Some(spark))
    assert(e2.run(s"$F MODE").head == Vector(2.0, 3.0, 3.0, 5.0, 5.0))
    // LONG GTS in the Long.valueOf cache range [-128,127]: runs ARE
    // detected (the cached boxes are identity-equal) → true modes,
    // tie kept in value order
    val longFrame = graft.operators.GtsFrame(graft.model.Gts.canonicalRehash(
      modeFrame.df
        .withColumn("vlong", col("vdouble").cast("long"))
        .withColumn("vdouble", lit(null).cast("double"))
        .withColumn("vtype", lit(graft.model.GtsType.LONG))))
    val e3 = new WarpScriptEngine(
      fetch = (_, _, _, _) => graft.operators.GtsFrame(
        longFrame.df.filter(col("ts") =!= 6L)), nowTs = 0L, session = Some(spark))
    assert(e3.run(s"$F MODE").head == Vector(3L, 5L))
  }

  test("REPORT requires the report capability") {
    intercept[Exception] { eng.run("REPORT") }
    val m = eng.run("'report=x' CAPADD REPORT").head.asInstanceOf[Map[Any, Any]]
    assert(m("rt") == "spark-graft")
  }

  test("IMPORT aliases namespaced macro names") {
    val out = eng.run(
      "<% 2 * %> 'util/double' DEF 'util/' 'u/' IMPORT 21 u/double")
    // alias u/ → util/ resolves u/double to the DEF'd macro
    assert(out == List(42L))
  }

  test("EXTLOADED is false; GETHOOK yields an empty macro; RUNNERNONCE is null") {
    assert(eng.run("'ext' EXTLOADED") == List(false))
    assert(eng.run("'t' 'hook' GETHOOK EVAL DEPTH") == List(0L))
    assert(eng.run("'abc' RUNNERNONCE") == List(null))
    assert(eng.run("'abc' RUNNERPATH") == List(null))
  }

  test("MACROTTL and RUNNERIN store scheduling attributes; RUNNERIN is capability-gated") {
    assert(eng.run("1000000 MACROTTL DEPTH") == List(0L))
    intercept[Exception] { eng.run("5000000 RUNNERIN") }
    assert(eng.run(
      "'runner.reschedule.min.period=1000' CAPADD 5000000 RUNNERIN DEPTH") == List(0L))
    intercept[Exception] { eng.run(
      "'runner.reschedule.min.period=1000' CAPADD 500000 RUNNERIN") }
  }

  test("TOKENINFO reports decode errors for both token faces") {
    val m = eng.run("'sometoken' TOKENINFO").head.asInstanceOf[Map[Any, Any]]
    assert(m.contains("ReadTokenDecodeError") && m.contains("WriteTokenDecodeError"))
  }

  test("PIGSCHEMA renders the stack types top-first") {
    assert(eng.run("1.5 'a' 3 PIGSCHEMA").head ==
      "(top: long, l2: chararray, l3: double)")
  }

  test("REOPTALT builds a regex matching exactly the alternatives") {
    val re = eng.run("[ 'cat' 'car' 'dog' ] REOPTALT").head.asInstanceOf[String]
    assert("cat".matches(re) && "car".matches(re) && "dog".matches(re))
    assert(!"ca".matches(re) && !"doge".matches(re) && !"".matches(re))
    // factored prefix: ca appears once
    assert(re.indexOf("ca") == re.lastIndexOf("ca"))
    val re2 = WordsExt6.optAlt(Seq("a", "ab", ""))
    assert("".matches(re2) && "a".matches(re2) && "ab".matches(re2) && !"b".matches(re2))
  }

  test("WSAUDITMODE collects unknown statements; WSAUDIT returns them") {
    val out = eng.run("WSAUDITMODE 1 NOSUCHWORD 2 WSAUDIT")
    val audits = out.head.asInstanceOf[Vector[Any]]
    assert(audits.length == 1)
    assert(audits.head.asInstanceOf[Map[String, Any]]("statement") == "NOSUCHWORD")
    assert(out.tail == List(2L, 1L))
    // without audit mode the unknown word throws
    intercept[Exception] { eng.run("NOSUCHWORD") }
  }

  test("WF repos accumulate and replace") {
    assert(eng.run(
      "'https://repo1' WF.ADDREPO 'https://repo1' WF.ADDREPO 'https://repo2' WF.ADDREPO WF.GETREPOS")
      == List(Vector("https://repo1", "https://repo2")))
    assert(eng.run("[ 'r3' ] WF.SETREPOS WF.GETREPOS") == List(Vector("r3")))
  }

  test("CAPEXPORT only inside GUARD") {
    intercept[Exception] { eng.run("'cap' CAPEXPORT") }
    assert(eng.run("<% 'cap' CAPEXPORT 1 %> [] GUARD") == List(1L))
  }

  test("GOLDWRAP produces a deterministic reference-wire wrapper string") {
    val out = eng.run(s"$F GOLDWRAP").head
    val s1 = out.asInstanceOf[String]
    // deterministic: re-running yields the identical string, and it
    // decodes through the byte-compat codec
    assert(eng.run(s"$F GOLDWRAP").head == s1)
    val (w, pts) = graft.sources.WrapperCodec.unwrapString(s1)
    assert(pts.nonEmpty && w.name.nonEmpty)
  }
}
