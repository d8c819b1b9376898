package graft

import org.apache.spark.sql.functions._

import graft.operators.GtsFrame
import graft.script.WarpScriptEngine

/** FETCH selector forms and activity params — reference semantics from
  * fn/FETCH.java:1263-1284 ('selectors'/'selpairs'/'selector' map
  * parse), :495-541 (per-selector pair processing; the directory
  * DEDUPS the multi-selector match set at the series level — a
  * LinkedHashSet<Metadata> in StandaloneDirectoryClient.find(), and
  * iterator() falls back to find() for multi-selector requests "since
  * we cannot otherwise ensure that we do not have duplicates" — so a
  * series matched by several selectors is fetched exactly once)
  * and :1443-1455 (active.after/quiet.after, ms-resolution liveness on
  * last activity — here the last stored tick, like LASTACTIVITY). */
class FetchSelectorsSpec extends SparkSpec {

  private def eng(f: GtsFrame) = new WarpScriptEngine(
    fetch = (cls, labels, a, b) => f.select(cls, labels).timeclip(a, b),
    nowTs = 0L, session = Some(spark))

  /** Two classes x two users; u2's series stay live past the window. */
  private def frame = GtsFrame(gtsOf(
    ("a", "u1", 10L, 1.0), ("a", "u1", 20L, 2.0),
    ("a", "u2", 30L, 3.0), ("a", "u2", 5000000L, 9.0),
    ("b", "u1", 40L, 4.0), ("b", "u2", 50L, 5.0)))

  private def rows(prog: String): Seq[(String, String, Long)] =
    eng(frame).runToFrame(prog)
      .select(col("class"), col("labels").getItem("user"), col("ts"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq

  test("'selectors' unions per-selector scans; an overlapped series is " +
    "delivered ONCE (LinkedHashSet dedup of the directory match set)") {
    // selector 1 matches all of class a; selector 2 matches
    // [ab]{user~u2} → a/u2 matches both but is fetched once; b/u2
    // matches only selector 2
    val got = rows(
      "{ 'selectors' [ 'a{}' '~[ab]{user~u2}' ] 'end' 1000 'timespan' 1000 } FETCH")
    assert(got == Seq(("a", "u1", 10L), ("a", "u1", 20L), ("a", "u2", 30L),
      ("b", "u2", 50L)))
  }

  test("'selpairs' takes [ class labelsMap ] pairs; 'selector' takes one string") {
    val viaPairs = rows(
      "{ 'selpairs' [ [ 'a' { 'user' 'u1' } ] [ 'b' {} ] ] " +
        "'end' 1000 'timespan' 1000 } FETCH")
    assert(viaPairs == Seq(("a", "u1", 10L), ("a", "u1", 20L),
      ("b", "u1", 40L), ("b", "u2", 50L)))
    val viaSelector = rows(
      "{ 'selector' '~.*{user~u1}' 'end' 1000 'timespan' 1000 } FETCH")
    assert(viaSelector == Seq(("a", "u1", 10L), ("a", "u1", 20L),
      ("b", "u1", 40L)))
  }

  test("active.after/quiet.after gate on the FULL-history last tick at " +
    "ms resolution, independent of the fetch window") {
    // last ticks (ms): a/u1 -> 0, a/u2 -> 5000, b/u1 -> 0, b/u2 -> 0.
    // cut 3e6 time units = 3000 ms: only a/u2 is 'active'; its
    // IN-WINDOW points are delivered even though the live tick is
    // outside the window
    val act = rows(
      "{ 'class' '~.*' 'labels' {} 'end' 1000 'timespan' 1000 " +
        "'active.after' 3000000 } FETCH")
    assert(act == Seq(("a", "u2", 30L)))
    val quiet = rows(
      "{ 'class' '~.*' 'labels' {} 'end' 1000 'timespan' 1000 " +
        "'quiet.after' 3000000 } FETCH")
    assert(quiet == Seq(("a", "u1", 10L), ("a", "u1", 20L),
      ("b", "u1", 40L), ("b", "u2", 50L)))
  }

  test("count/skip apply once per DEDUPED series: an overlapped series " +
    "consumes its rank slots on a single delivery") {
    // a/u1 has 2 points, a/u2 has 2 in-window points; a/u2 matches
    // both selectors but is owned by the first — with count 1 each
    // series delivers its last point exactly once
    val got = rows(
      "{ 'selectors' [ 'a{}' 'a{user~u2}' ] 'end' 1000 'count' 1 } FETCH")
    assert(got == Seq(("a", "u1", 20L), ("a", "u2", 30L)))
    // skip 1 drops each series' newest point exactly once ('start'
    // supplied: end-without-count is a reference error, computeTimeRange)
    val skipped = rows(
      "{ 'selectors' [ 'a{}' 'a{user~u2}' ] 'start' 0 'end' 1000 'skip' 1 } FETCH")
    assert(skipped == Seq(("a", "u1", 10L)))
  }

  test("an exact selector value that itself starts with '~' travels " +
    "via the '=' exact marker, not as a regex") {
    val f = GtsFrame(gtsOf(
      ("a", "~prod", 10L, 1.0), ("a", "prod", 20L, 2.0)))
    val e2 = new WarpScriptEngine(
      fetch = (cls, labels, a, b) => f.select(cls, labels).timeclip(a, b),
      nowTs = 0L, session = Some(spark))
    val got = e2.runToFrame(
      "{ 'selector' 'a{user=%7Eprod}' 'end' 1000 'timespan' 1000 } FETCH")
      .select(col("labels").getItem("user"), col("ts")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("~prod", 10L)))
  }

  test("a selector string with an attribute block is rejected, like " +
    "the reference's PARSESELECTOR grammar") {
    val ex = intercept[Exception](eng(frame).runToFrame(
      "{ 'selector' 'a{user=u1}{dc=east}' 'end' 1000 'timespan' 1000 } FETCH"))
    assert(ex.getMessage.contains("attribute block"))
  }

  test("'extra' fetches companion classes under the matched labels, " +
    "set-deduped against the match set; per-scan count applies to them") {
    // selector matches a{user=u1}; extra [ 'b' 'a' ]: companion b/u1
    // joins, the 'a' companion is already matched (LinkedHashSet dedup)
    val got = rows(
      "{ 'selector' 'a{user~u1}' 'end' 1000 'timespan' 1000 " +
        "'extra' [ 'b' 'a' ] } FETCH")
    assert(got == Seq(("a", "u1", 10L), ("a", "u1", 20L), ("b", "u1", 40L)))
    val counted = rows(
      "{ 'selector' 'a{user~u1}' 'end' 1000 'count' 1 " +
        "'extra' [ 'b' ] } FETCH")
    assert(counted == Seq(("a", "u1", 20L), ("b", "u1", 40L)))
  }

  test("with an ingest-maintained directory the activity gate reads " +
    "lastactivity metadata — no full-history storage scan is issued") {
    val f = frame
    val ranges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val metaDf = graft.model.Gts.metaTable(f.df)
    val e2 = new WarpScriptEngine(
      fetch = (cls, labels, a, b) => {
        ranges += ((a, b)); f.select(cls, labels).timeclip(a, b) },
      nowTs = 0L, session = Some(spark), meta = Some(() => metaDf))
    def run(key: String) = e2.runToFrame(
      s"{ 'class' '~.*' 'labels' {} 'end' 1000 'timespan' 1000 '$key' 3000000 } FETCH")
      .select(col("class"), col("labels").getItem("user"), col("ts"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq
    assert(run("active.after") == Seq(("a", "u2", 30L)))
    assert(run("quiet.after") == Seq(("a", "u1", 10L), ("a", "u1", 20L),
      ("b", "u1", 40L), ("b", "u2", 50L)))
    // the directory answered the liveness question: the storage hook
    // was never asked for the (MinValue, MaxValue) full history the
    // fallback max(ts) path scans
    assert(!ranges.exists { case (a, b) =>
      a == Long.MinValue && b == Long.MaxValue }, ranges)
  }

  test("with a maintained directory, pagination and multi-selector " +
    "ownership also read metadata — every storage scan stays ranged") {
    val f = frame
    val ranges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val metaDf = graft.model.Gts.metaTable(f.df)
    val e2 = new WarpScriptEngine(
      fetch = (cls, labels, a, b) => {
        ranges += ((a, b)); f.select(cls, labels).timeclip(a, b) },
      nowTs = 0L, session = Some(spark), meta = Some(() => metaDf))
    // multi-selector (ownership) + gskip/gcount (pagination) together:
    // 4 series paged 2+2; the union of pages must equal the unpaged set
    val pages = (0 to 1).map { p =>
      e2.runToFrame(
        s"{ 'selectors' [ '~[ab]{}' 'a{user~u2}' ] 'start' 0 'end' 1000 " +
          s"'gskip' ${p * 2} 'gcount' 2 } FETCH")
        .select(col("class"), col("labels").getItem("user"), col("ts"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSeq
    }
    assert(pages(0).toSet.intersect(pages(1).toSet).isEmpty)
    assert((pages(0) ++ pages(1)).sorted == Seq(
      ("a", "u1", 10L), ("a", "u1", 20L), ("a", "u2", 30L), ("b", "u1", 40L),
      ("b", "u2", 50L)))
    // the directory answered ownership AND the page ranks: the storage
    // hook was only ever asked for ranges within the request (the
    // boundary-free request reads [0,1000] and nothing else)
    assert(ranges.forall { case (a, b) => a >= 0L && b <= 1000L }, ranges)
  }

  test("a session UPDATE bumps activity on the metadata-backed gate, " +
    "like ingress maintaining the directory") {
    val f = frame
    val metaDf = graft.model.Gts.metaTable(f.df)
    val e2 = new WarpScriptEngine(
      fetch = (cls, labels, a, b) => f.select(cls, labels).timeclip(a, b),
      nowTs = 0L, session = Some(spark), meta = Some(() => metaDf))
    // b/u1's stored last tick is 40 (not active past 3000 ms); a session
    // write at tick 6e6 makes it live — the overlay contributes its
    // in-memory last tick exactly like ingress bumping the metadata
    val got = e2.runToFrame(
      "NEWGTS 'b' RENAME { 'user' 'u1' } RELABEL 6000000 NaN NaN NULL 7.0 ADDVALUE UPDATE " +
        "{ 'class' '~.*' 'labels' {} 'end' 1000 'timespan' 1000 'active.after' 3000000 } FETCH")
      .select(col("class"), col("labels").getItem("user"), col("ts"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq
    assert(got.contains(("a", "u2", 30L)) && got.contains(("b", "u1", 40L)), got)
  }

  test("upsertMeta maintains the directory incrementally at ingest: " +
    "max lastactivity, summed npoints, attributes preserved") {
    import graft.model.Gts
    val m0 = Gts.metaTable(gtsOf(
      ("a", "u1", 10L, 1.0), ("a", "u1", 20L, 2.0), ("b", "u2", 50L, 5.0)))
      .withColumn("attributes", map(lit("dc"), lit("east")))
    // batch: an older + a newer point for a/u1, plus a brand-new series
    val m1 = Gts.upsertMeta(m0, gtsOf(
      ("a", "u1", 5L, 0.5), ("a", "u1", 99L, 9.9), ("c", "u3", 7L, 0.7)))
    val got = m1.select(col("class"), col("labels").getItem("user"),
        col("lastactivity"), col("npoints"),
        col("attributes").getItem("dc"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sorted.toSeq
    assert(got == Seq(
      ("a", "u1", 99L, 4L, "east"),   // bumped activity, 2+2 points
      ("b", "u2", 50L, 1L, "east"),   // untouched by the batch
      ("c", "u3", 7L, 1L, null)))     // new series from the batch
  }

  test("timespan 0 at end MAX_VALUE is rejected (start would overflow " +
    "past MAX_VALUE), like the reference's computeTimeRange edge error") {
    for (prog <- Seq(
        s"{ 'class' '~.*' 'labels' {} 'end' ${Long.MaxValue} 'timespan' 0 } FETCH",
        s"[ '~.*' {} ${Long.MaxValue} 0 ] FETCH")) {
      val ex = intercept[Exception](eng(frame).runToFrame(prog))
      assert(ex.getMessage.contains("Cannot set timespan"), s"for $prog: $ex")
    }
  }

  test("unsupported reference keys fail loudly; 'priority' and unknown " +
    "keys are ignored like the reference's map parse") {
    def prog(extra: String) =
      s"{ 'class' '~.*' 'labels' {} 'end' 1000 'timespan' 1000 $extra } FETCH"
    for (bad <- Seq("'encoders' true", "'keepempty' true", "'merge' false",
        "'wtimestamp' true", "'ttl' true", "'showuuid' true")) {
      val ex = intercept[Exception](eng(frame).runToFrame(prog(bad)))
      assert(ex.getMessage.contains("not supported"), s"for $bad: $ex")
    }
    // negated booleans are the reference defaults — accepted
    assert(rows(prog("'merge' true 'keepempty' false 'encoders' false")).size == 5)
    assert(rows(prog("'priority' [ 'user' ] 'some.unknown.key' 42")).size == 5)
  }
}
