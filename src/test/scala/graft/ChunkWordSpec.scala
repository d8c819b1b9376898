package graft

import org.apache.spark.sql.functions._

import graft.operators.GtsFrame
import graft.script.WarpScriptEngine

/** CHUNK word — the reference's 5-parameter form (fn/CHUNK.java;
  * GTSHelper.chunk:9599-9800): gts lastchunk chunkwidth chunkcount
  * chunklabel keepempty CHUNK. The chunk id becomes a label (new
  * series identity per chunk). */
class ChunkWordSpec extends SparkSpec {

  // series a: ticks 5,15,30; series b: ticks 0,100
  private def frame = GtsFrame(gtsOf(
    ("m", "a", 5L, 1.0), ("m", "a", 15L, 2.0), ("m", "a", 30L, 3.0),
    ("m", "b", 0L, 4.0), ("m", "b", 100L, 5.0)))

  private def eng(f: GtsFrame) = new WarpScriptEngine(
    fetch = (cls, labels, a, b) => f.select(cls, labels).timeclip(a, b),
    nowTs = 0L, session = Some(spark))

  private def rows(prog: String): Seq[(String, String, Long)] =
    eng(frame).runToFrame(prog)
      .select(col("labels").getItem("user"), col("labels").getItem("c"),
        col("ts"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq

  test("lastchunk 0 aligns PER SERIES to the last tick's next width " +
    "boundary; the chunk id lands in the chunklabel") {
    // series a: lt=30 → lc=50, chunks (25,50]=30, (0,25]=5,15;
    // series b: lt=100 (already aligned) → 100 and 0 in (−25,0]
    val got = rows("[ '' '~.*' { } 1000 1001 ] FETCH 0 25 0 'c' false CHUNK")
    assert(got == Seq(
      ("a", "25", 5L), ("a", "25", 15L), ("a", "50", 30L),
      ("b", "0", 0L), ("b", "100", 100L)))
  }

  test("keepempty=false shifts an explicit far-future lastchunk down " +
    "per series and SHRINKS a nonzero chunkcount by the skipped chunks") {
    // lastchunk=200, width=25, count=6: series b skips (200−100)/25=4
    // empties → lc=100, count 2 → window (50,100] keeps only tick 100;
    // series a skips (200−30)/25=6 → count 0 → no chunks at all
    val got = rows("[ '' '~.*' { } 1000 1001 ] FETCH 200 25 6 'c' false CHUNK")
    assert(got == Seq(("b", "100", 100L)))
  }

  test("keepempty=true is rejected loudly; an existing chunklabel is " +
    "the reference's hard error") {
    val e1 = intercept[Exception](eng(frame).runToFrame(
      "[ '' '~.*' { } 1000 1001 ] FETCH 0 25 0 'c' true CHUNK"))
    assert(e1.getMessage.contains("not supported"), e1.getMessage)
    val e2 = intercept[Exception](eng(frame).runToFrame(
      "[ '' '~.*' { } 1000 1001 ] FETCH 0 25 0 'user' false CHUNK").collect())
    assert(e2.getMessage.contains("already have a label"), e2.getMessage)
  }
}
