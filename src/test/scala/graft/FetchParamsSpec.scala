package graft

import org.apache.spark.sql.functions._

import graft.operators.GtsFrame
import graft.script.WarpScriptEngine

/** FETCH map params skip/step/timestep/sample/type/gskip/gcount —
  * reference semantics from the store scan (StandaloneStoreClient.java:
  * 398-487, newest-first per series), parameter validation
  * (fn/FETCH.java:1380-1394, 1489-1538, 1561-1584) and decode-time type
  * forcing (GTSDecoder.decode(type) → GTSHelper.setValue:1578-1731). */
class FetchParamsSpec extends SparkSpec {

  private def eng(f: GtsFrame) = new WarpScriptEngine(
    fetch = (cls, labels, _, _) => f.select(cls, labels),
    nowTs = 0L, session = Some(spark))

  /** One series with ticks 10,20,...,100 valued ts/10. */
  private def ticksFrame = GtsFrame(gtsOf(
    (1 to 10).map(i => ("a", "1", i * 10L, i.toDouble)): _*))

  private def fetchMap(extra: String) =
    s"{ 'class' '~.*' 'labels' {} 'end' 1000 'timespan' 1000 $extra } FETCH"

  private def ticks(f: GtsFrame, extra: String): Seq[Long] =
    eng(f).runToFrame(fetchMap(extra))
      .select(col("ts")).collect().map(_.getLong(0)).sorted.toSeq

  test("skip drops the newest points; count applies after skip") {
    assert(ticks(ticksFrame, "'skip' 3") == (1 to 7).map(_ * 10L))
    // count counts ACCEPTED points, so it composes after skip
    val got = eng(ticksFrame).runToFrame(
        "{ 'class' '~.*' 'labels' {} 'end' 1000 'count' 2 'skip' 3 } FETCH")
      .select(col("ts")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(60L, 70L))
  }

  test("timestep thins greedily from the newest accepted point") {
    // newest-first: 100 accepted, next needs ts <= 100-25=75 → 70,
    // then <= 45 → 40, then <= 15 → 10
    assert(ticks(ticksFrame, "'timestep' 25") == Seq(10L, 40L, 70L, 100L))
    // after skip 1 the scan starts at 90: 90, 60, 30
    assert(ticks(ticksFrame, "'skip' 1 'timestep' 25") == Seq(30L, 60L, 90L))
  }

  test("step strides over the (timestep-)accepted sequence") {
    // every 3rd point newest-first: 100, 70, 40, 10
    assert(ticks(ticksFrame, "'step' 3") == Seq(10L, 40L, 70L, 100L))
    // composed: timestep 25 accepts 100,70,40,10; step 2 keeps 100,40
    assert(ticks(ticksFrame, "'timestep' 25 'step' 2") == Seq(40L, 100L))
  }

  test("sample is deterministic, a subset, and ~proportional") {
    val big = GtsFrame(gtsOf(
      (1 to 400).map(i => ("a", "1", i.toLong, i.toDouble)): _*))
    val once = ticks(big, "'sample' 0.5")
    assert(once == ticks(big, "'sample' 0.5")) // reproducible
    assert(once.toSet.subsetOf((1 to 400).map(_.toLong).toSet))
    assert(once.size > 120 && once.size < 280) // ~200 expected
    // monotone: a smaller rate selects a subset of the md5 buckets
    assert(ticks(big, "'sample' 0.2").toSet.subsetOf(once.toSet))
  }

  test("gskip/gcount page over the DIRECTORY match set: a series with " +
    "no in-range points still occupies its slot (FETCH.java:325-331)") {
    // engine that respects the range, so in-range != all-time
    def rangedEng(f: GtsFrame) = new WarpScriptEngine(
      fetch = (cls, labels, a, b) => f.select(cls, labels).timeclip(a, b),
      nowTs = 0L, session = Some(spark))
    val multi = GtsFrame(gtsOf(
      ("a", "u1", 10L, 1.0), ("a", "u2", 5000L, 2.0), ("a", "u3", 20L, 3.0)))
    val byId = multi.df.select(col("gtsid"), col("labels").getItem("user"))
      .distinct().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ordered = byId.keys.toSeq.sorted.map(byId) // users in gtsid order
    def users(extra: String): Set[String] =
      rangedEng(multi).runToFrame(fetchMap(extra))
        .select(col("labels").getItem("user")).distinct().collect()
        .map(_.getString(0)).toSet
    // range [1,1000] excludes the ts=5000 series (u2), but the
    // directory page 'gcount' 2 still spends a slot on it: only the
    // in-range members of the first two slots come back (ranking over
    // in-range ids instead would wrongly backfill the slot)
    assert(users("'gcount' 2") == Set(ordered(0), ordered(1)) - "u2")
    // the paged-out series' boundary.post points DO arrive when its
    // slot is selected
    val emptyUser = "u2"
    val slotOfEmpty = ordered.indexOf(emptyUser)
    val got = rangedEng(multi).runToFrame(
        fetchMap(s"'gskip' $slotOfEmpty 'gcount' 1 'boundary.post' 1"))
      .select(col("labels").getItem("user"), col("ts")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set((emptyUser, 5000L)))
  }

  test("gskip/gcount paginate series in gtsid order") {
    val multi = GtsFrame(gtsOf(
      (1 to 4).flatMap(u => Seq(("a", u.toString, 1L, u.toDouble),
        ("a", u.toString, 2L, u.toDouble))): _*))
    val ids = multi.df.select(col("gtsid")).distinct()
      .collect().map(_.getLong(0)).sorted
    def users(extra: String): Set[String] =
      eng(multi).runToFrame(fetchMap(extra))
        .select(col("labels").getItem("user")).collect()
        .map(_.getString(0)).toSet
    val byId = multi.df.select(col("gtsid"), col("labels").getItem("user"))
      .distinct().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(users("'gskip' 1 'gcount' 2") == ids.slice(1, 3).map(byId).toSet)
    assert(users("'gcount' 1") == Set(byId(ids.head)))
    assert(users("'gskip' 3") == Set(byId(ids.last)))
  }

  test("type forces value columns with setValue conversion rules") {
    import spark.implicits._
    val mixed = graft.model.Gts.canonical(Seq(
      ("a", 1L, graft.model.GtsType.LONG, Some(7L), Option.empty[Double], Option.empty[Boolean], Option.empty[String]),
      ("a", 2L, graft.model.GtsType.DOUBLE, None, Some(2.9), None, None),
      ("a", 3L, graft.model.GtsType.BOOLEAN, None, None, Some(true), None),
      ("a", 4L, graft.model.GtsType.STRING, None, None, None, Some("12.5")),
      ("a", 5L, graft.model.GtsType.STRING, None, None, None, Some("nope")),
      ("a", 6L, graft.model.GtsType.DOUBLE, None, Some(Double.NaN), None, None))
      .toDF("class", "ts", "vtype", "vlong", "vdouble", "vbool", "vstring")
      .select(col("class"), map(lit("user"), lit("1")).as("labels"),
        col("ts"), lit(null).cast("double").as("lat"),
        lit(null).cast("double").as("lon"), lit(null).cast("bigint").as("elev"),
        col("vtype"), col("vlong"), col("vdouble"), col("vbool"),
        col("vstring"), lit(null).cast("binary").as("vbinary")))
    def forced(t: String) = GtsFrame(mixed).forceType(t).df
      .select(col("ts"), col("vlong"), col("vdouble"), col("vbool"), col("vstring"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
    val asLong = forced("long")
    assert(asLong(1L)._1.contains(7L))
    assert(asLong(2L)._1.contains(2L))    // (long) 2.9 truncates
    assert(asLong(3L)._1.contains(1L))    // true → 1
    assert(asLong(4L)._1.contains(12L))   // parseLong fails → (long) parseDouble
    assert(asLong(5L)._1.contains(0L))    // unparseable → 0
    assert(asLong(6L)._1.contains(0L))    // Java (long) NaN → 0, never null
    assert(asLong.values.forall(v => v._2.isEmpty && v._3.isEmpty && v._4.isEmpty))
    val asStr = forced("string")
    assert(asStr(3L)._4.contains("T"))    // boolean prints T, not "true"
    assert(asStr(1L)._4.contains("7"))
    val asBool = forced("boolean")
    assert(asBool(1L)._3.contains(true))  // 7 != 0
    assert(asBool(5L)._3.contains(true))  // non-empty string
    val asDbl = forced("double")
    assert(asDbl(4L)._2.contains(12.5))
    assert(asDbl(3L)._2.contains(1.0))
  }

  test("parameter validation mirrors the reference bounds") {
    val e = eng(ticksFrame)
    intercept[IllegalArgumentException](e.run(fetchMap("'skip' -1")))
    intercept[IllegalArgumentException](e.run(fetchMap("'step' 0")))
    intercept[IllegalArgumentException](e.run(fetchMap("'timestep' 0")))
    intercept[IllegalArgumentException](e.run(fetchMap("'sample' 0.0")))
    intercept[IllegalArgumentException](e.run(fetchMap("'sample' 1.5")))
    intercept[IllegalArgumentException](e.run(fetchMap("'type' 'complex'")))
    intercept[IllegalArgumentException](e.run(fetchMap("'gskip' -1")))
  }
}
