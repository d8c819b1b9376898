package graft

import org.apache.spark.sql.functions._

import graft.script.WarpScriptEngine

/** GTS meta/MV/wrapper word tail: ATBUCKET, attributes, FILLTICKS,
  * PACK/UNPACK, LOCSTRINGS, LASTACTIVITY, MV splits, WRAP variants. */
class WsGtsMetaSpec extends SparkSpec {

  private def seqFrame = {
    val s = spark
    val pts = Seq((0L, 1.0), (10L, 2.0), (20L, 4.0), (40L, 8.0))
    val df = s.createDataFrame(pts).toDF("t", "v").select(
      lit("p.q").as("class"), typedLit(Map("u" -> "1")).as("labels"),
      lit(0L).as("gtsid"), col("t").as("ts"),
      lit(48.5).as("lat"), lit(-4.25).as("lon"),
      lit(100L).as("elev"),
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

  private val F = "[ '' '~.*' { } 100 101 ] FETCH"

  test("ATBUCKET extracts the point at the Nth bucket") {
    // buckets of span 10 ending at 40, 5 buckets: idx 4 = tick 40
    val out = top(s"[ $F bucketizer.sum 40 10 5 ] BUCKETIZE 4 ATBUCKET")
      .asInstanceOf[Vector[Any]]
    assert(out(0) == 40L && out.last == 8.0)
  }

  test("SETATTRIBUTES / ATTRIBUTES / ATTRDELTA engine-side store") {
    val e = eng
    // SETATTRIBUTES MERGES (updateAttribute:84-106): '' value removes,
    // an EMPTY update map keeps everything, a NULL key resets first
    val out = e.run(
      s"""$F { 'k1' 'v1' 'k2' 'v2' } SETATTRIBUTES
         |{ 'k2' '' 'k3' 'v3' } SETATTRIBUTES
         |{ } SETATTRIBUTES ATTRIBUTES""".stripMargin)
    assert(out.head == Map("k1" -> "v1", "k3" -> "v3"))
    val reset = e.run(
      s"""$F { 'k1' 'v1' } SETATTRIBUTES
         |{ NULL 'x' 'k9' 'v9' } SETATTRIBUTES ATTRIBUTES""".stripMargin)
    assert(reset.head == Map("k9" -> "v9"))
    // ATTRDELTA (fn/ATTRDELTA.java) is the stack delta-mode toggle:
    // BOOLEAN sets it, NULL reads it back
    assert(e.run("NULL ATTRDELTA true ATTRDELTA NULL ATTRDELTA")
      == List(true, false))
  }

  test("METAMATCH replays the reference's MetadataSelectorMatcherTest") {
    // every assertion of the reference's OWN test
    // (continuum/gts/MetadataSelectorMatcherTest.java:33-95), driven
    // through SETATTRIBUTES + METAMATCH:
    // test = temperature{sensor=23} attrs {room:A}
    val t = """NEWGTS 'temperature' RENAME { 'sensor' '23' } RELABEL
              |1 NaN NaN NULL 1 ADDVALUE
              |{ 'room' 'A' } SETATTRIBUTES""".stripMargin
    // testemptyclassname = ''{sensor=23} attrs {attr:yes, attr2:...}
    val t0 = """NEWGTS { 'sensor' '23' } RELABEL
               |1 NaN NaN NULL 1 ADDVALUE
               |{ 'attr' 'yes' 'attr2' 'afalse detection failure' }
               |SETATTRIBUTES""".stripMargin
    val e = eng
    def m(fix: String, sel: String) =
      e.run(s"$fix '$sel' METAMATCH").head.asInstanceOf[Boolean]
    // no such label or attributes
    assert(!m(t, "~.*{toto~tata.*}{attr=yes,attr2~.false.*}"))
    // there IS a room attribute, but room=A (extended + standard)
    assert(!m(t, "~temp.*{sensor~(23|22),room=B}{}"))
    assert(!m(t, "~temp.*{sensor~(23|22),room=B}"))
    // ...and the standard form DOES match through the attribute
    assert(m(t, "~temp.*{sensor~(23|22),room=A}"))
    // bare '=' class = exact empty name; attributes via fallback
    assert(m(t0, "={attr=yes,attr2~.false.*}"))
    assert(!m(t, "={attr=yes,attr2~.false.*}"))
    // bare '~' class = empty-name regex
    assert(m(t0, "~{attr=yes,attr2~.false.*}"))
    assert(!m(t, "~{attr=yes,attr2~.false.*}"))
    // '={}' matches only empty classnames — incl. an EMPTY series
    assert(m("NEWGTS", "={}"))
    assert(!m("NEWGTS 'temperature' RENAME", "={}"))
    // absent-key assertion (Constants.ABSENT_LABEL_SUPPORT): matches
    // only when neither label nor attribute carries the key
    assert(m(t, "~temp.*{nosuch=}"))
    assert(!m(t, "~temp.*{room=}"))
    assert(!m(t, "~temp.*{sensor=}"))
  }

  test("TIMECLIP replays the reference's SubSerieTest semantics") {
    // continuum/gts/SubSerieTest.java: inclusive [from,to] bounds,
    // DUPLICATE ticks all kept (testDuplicates: 3 copies per tick),
    // out-of-range / inverted clips empty. TIMECLIP's long form is
    // (end, timespan) → [end−timespan+1, end].
    val dup3 = (1 to 3).map(_ =>
      """0 NaN NaN NULL 0 ADDVALUE
        |1 NaN NaN NULL 1 ADDVALUE
        |2 NaN NaN NULL 2 ADDVALUE""".stripMargin)
      .mkString("NEWGTS 'g' RENAME\n", "\n", "")
    assert(top(s"$dup3 1 2 TIMECLIP SIZE") == 6L) // [0,1] → 2 ticks × 3
    assert(top(s"$dup3 1 1 TIMECLIP SIZE") == 3L) // [1,1] → 1 tick × 3
    assert(top(s"$dup3 2 3 TIMECLIP SIZE") == 9L) // [0,2] → everything
    assert(top(s"$dup3 10 5 TIMECLIP SIZE") == 0L) // [6,10] → empty
  }

  test("LOCSTRINGS and LASTACTIVITY") {
    val locs = top(s"$F LOCSTRINGS").asInstanceOf[Vector[Any]]
    assert(locs.length == 4 && locs.distinct.size == 1)
    assert(locs.head.asInstanceOf[String].matches("[0-9a-f]{16}"))
    assert(top(s"$F LASTACTIVITY") == 40L)
  }

  test("FILLTICKS adds points only at missing ticks") {
    val vals = top(
      s"$F [ NaN NaN NULL 99.0 [ 10 15 25 ] ] FILLTICKS TICKS")
      .asInstanceOf[Vector[Any]]
    assert(vals == Vector(0L, 10L, 15L, 20L, 25L, 40L))
    val vv = top(
      s"$F [ NaN NaN NULL 99.0 [ 10 15 25 ] ] FILLTICKS VALUES")
      .asInstanceOf[Vector[Any]]
    assert(vv == Vector(1.0, 2.0, 99.0, 4.0, 99.0, 8.0))
  }

  test("PACK / UNPACK round-trip longs, doubles, booleans, skips") {
    val out = top("[ 123 -5 3.25 true ] '<L12>L8>DB' PACK '<L12>L8>DB' UNPACK")
      .asInstanceOf[Vector[Any]]
    assert(out == Vector(123L, -5L, 3.25, true))
    // skip specs consume bits but produce no values
    val out2 = top("[ 7 9 ] '<L8S4<L8' PACK '<L8s4<L8' UNPACK")
      .asInstanceOf[Vector[Any]]
    assert(out2 == Vector(7L, 9L))
    // unsigned keeps the raw bits
    assert(top("[ 255 ] '<U8' PACK '<U8' UNPACK") == Vector(255L))
    assert(top("[ 255 ] '<L8' PACK '<L8' UNPACK") == Vector(-1L))
  }

  test("WRAP variants round-trip; UNWRAPSIZE and UNWRAPEMPTY") {
    assert(top(s"$F WRAPFAST UNWRAPSIZE") == 4L)
    val e = eng
    val df = e.runToFrame(s"$F WRAPOPT UNWRAPEMPTY")
    assert(df.count() == 0)
    // full round-trip through a variant equals the original values
    assert(top(s"$F WRAPRAW UNWRAP VALUES") == Vector(1.0, 2.0, 4.0, 8.0))
  }

  test("MVTICKSPLIT / MVINDEXSPLIT label the split key") {
    val labels = eng.runToFrame(s"$F MVTICKSPLIT")
      .select(col("labels").getItem(".mvsplit")).collect().map(_.getString(0)).toSet
    assert(labels == Set("0", "10", "20", "40"))
    val idx = eng.runToFrame(s"$F MVINDEXSPLIT")
      .select(col("labels").getItem(".mvsplit")).collect().map(_.getString(0)).toSet
    assert(idx == Set("0")) // single value per tick -> index 0
    val hh = top(s"$F MVHHCODES").asInstanceOf[Vector[Any]]
    assert(hh.length == 4 && hh.forall(_ != null))
  }
}
