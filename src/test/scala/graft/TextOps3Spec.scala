package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps3

/** Duplicate-span marking (Lee et al. exact-substring form) and int8
  * quantization recall. */
class TextOps3Spec extends SparkSpec {

  private def docsOf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("duplicateSpans marks the shared 20-word window and its coverage") {
    val span = (1 to 20).map(i => s"w$i").mkString(" ")
    // doc 0 and 1 share `span` exactly; doc 2 is all-unique words
    val docs = docsOf(
      (0L, s"a0 b0 $span c0"),
      (1L, s"x1 $span"),
      (2L, (1 to 25).map(i => s"u$i").mkString(" ")))
    val out = TextOps3.duplicateSpans(docs, 20).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc0: 23 words -> 4 windows, exactly one (pos 2) is the shared span
    assert(out(0L) == ((4L, 1L, 20L)))
    // doc1: 21 words -> 2 windows, the span sits at pos 1
    assert(out(1L) == ((2L, 1L, 20L)))
    // doc2: 25 words, no duplicated window
    assert(out(2L) == ((6L, 0L, 0L)))
  }

  test("duplicateSpans counts overlapping dup windows' coverage once") {
    // two docs identical for 21 words -> 2 dup windows each, coverage 21
    val run = (1 to 21).map(i => s"s$i").mkString(" ")
    val docs = docsOf((0L, s"$run tail0a tail0b"), (1L, s"$run other1"))
    val out = TextOps3.duplicateSpans(docs, 20).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((2L, 21L)))
    assert(out(1L) == ((2L, 21L)))
  }

  test("quantizeInt8 bounds values at ±127 and survives a zero vector") {
    val s = spark
    import s.implicits._
    val e = Seq(
      (0L, Seq(0.5f, -1.0f, 0.25f)),
      (1L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = TextOps3.quantizeInt8(e).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](3)).toMap
    assert(q(0L) == Seq(64.0, -127.0, 32.0)) // round(±scaled*127/1000)
    assert(q(1L) == Seq(0.0, 0.0, 0.0)) // maxabs floor of 1 avoids 0/0
  }

  test("int8Recall is 1.0 when quantization preserves the ranking") {
    val s = spark
    import s.implicits._
    // well-separated unit-ish vectors: quantization cannot reorder
    val e = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val out = TextOps3.int8Recall(e, nQueries = 2, k = 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(0L -> 1.0, 1L -> 1.0))
  }

  test("duplicateSpans plan: equality joins only, no cartesian product") {
    val docs = docsOf((0L, (1 to 30).map(i => s"p$i").mkString(" ")))
    val plan = TextOps3.duplicateSpans(docs, 20)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
