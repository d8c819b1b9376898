package graft

import org.apache.spark.sql.functions._

import graft.model.{Gts, GtsType}
import graft.sources.GtsCodec
import graft.sources.GtsCodec.Point
import graft.streaming.{StreamingIngest, StreamingState}

class StatefulStreamSpec extends SparkSpec {

  test("stateful streaming counter compensation carries state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val pts = StreamingIngest.parseStream(mem.toDF(), 0L)
      .withColumn("vdouble", coalesce(col("vdouble"), col("vlong").cast("double")))
    val q = StreamingState.compensateResets(pts)
      .writeStream.format("memory").queryName("ctr_out")
      .outputMode("append").start()
    // sawtooth: 5, 8 | reset to 2, 6 — compensated: 5, 8, 10, 14
    mem.addData("1// c{u=a} 5.0", "2// c{u=a} 8.0")
    q.processAllAvailable()
    mem.addData("3// c{u=a} 2.0", "4// c{u=a} 6.0") // state crosses batches
    q.processAllAvailable()
    val got = spark.sql("SELECT ts, vdouble FROM ctr_out ORDER BY ts")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    q.stop()
    assert(got === Seq((1L, 5.0), (2L, 8.0), (3L, 10.0), (4L, 14.0)))
  }

  test("streaming timesplit continues sessions across micro-batches " +
      "and matches batch timesplit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val pts = StreamingIngest.parseStream(mem.toDF(), 0L)
      .withColumn("vdouble", coalesce(col("vdouble"), col("vlong").cast("double")))
    val q = StreamingState.timesplitSessions(pts, quiet = 10L)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    // ticks 1,5 | 8,30,35 — gap>10 only at 8→30, mid-batch-2: the
    // session must NOT restart at the batch boundary (5→8 gap is 3)
    mem.addData("1// c{u=a} 1.0", "5// c{u=a} 2.0")
    q.processAllAvailable()
    mem.addData("8// c{u=a} 3.0", "30// c{u=a} 4.0", "35// c{u=a} 5.0")
    q.processAllAvailable()
    val got = spark.sql("SELECT ts, session FROM sess_out ORDER BY ts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    q.stop()
    assert(got === Seq((1L, 0L), (5L, 0L), (8L, 0L), (30L, 1L), (35L, 1L)))
    // batch parity: GtsFrame.timesplit on the same points yields the
    // same grouping (its session numbering also gap-cumsums from 0)
    val batch = graft.operators.GtsFrame(gtsOf(
        ("c", "a", 1L, 1.0), ("c", "a", 5L, 2.0), ("c", "a", 8L, 3.0),
        ("c", "a", 30L, 4.0), ("c", "a", 35L, 5.0)))
      .timesplit(10L)
    val sessCol = batch.columns.find(_.contains("session"))
      .orElse(batch.columns.find(_ == "split")).getOrElse("session")
    val bm = batch.select(col("ts"), col(sessCol).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamed = got.toMap
    // same partition of ticks into sessions (ids may be offset)
    val pairs = got.map(_._1).combinations(2).map { case Seq(a, b) =>
      (streamed(a) == streamed(b)) == (bm(a) == bm(b))
    }
    assert(pairs.forall(identity))
  }

  test("mvSplit explodes encoder-valued points (fn/MVSPLIT.java)") {
    // a carrier point whose BINARY value is an encoded sub-stream
    val sub = GtsCodec.encode(Seq(
      Point(10L, None, None, None, GtsType.DOUBLE, None, Some(1.5), None, None, None),
      Point(11L, None, None, None, GtsType.DOUBLE, None, Some(2.5), None, None, None)))
    val carrier = gtsOf(("mv", "u", 100L, 99.0)) // plain point
    import org.apache.spark.sql.Row
    val binRow = spark.createDataFrame(
      java.util.List.of(Row("mv", Map("user" -> "u"), 0L, 200L, null, null, null,
        GtsType.BINARY, null, null, null, null, sub)),
      Gts.pointSchema)
    val points = carrier.unionByName(Gts.canonicalRehash(binRow))
    val out = GtsCodec.mvSplit(points)
    assert(out.count() === 3) // 1 plain + 2 exploded
    assert(out.filter(col("ts") === 10L && col("vdouble") === 1.5).count() === 1)
    assert(out.filter(col("vtype") === GtsType.BINARY).count() === 0)
  }
  test("streaming dedup keeps the first occurrence of each digest " +
      "across batches and matches the batch dedup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
      .withColumn("digest", md5(col("text")))
    val q = graft.streaming.StreamingDedup.firstSeen(docs)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    // batch 1: doc 7 and 3 share content -> min id 3 survives
    mem.addData((7L, "same text"), (3L, "same text"), (1L, "unique a"))
    q.processAllAvailable()
    // batch 2: doc 9 repeats batch-1 content -> dropped; 5 is new
    mem.addData((9L, "same text"), (5L, "unique b"))
    q.processAllAvailable()
    val got = spark.sql("SELECT doc_id FROM dedup_out ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    q.stop()
    assert(got === Seq(1L, 3L, 5L))
    // batch parity: groupBy(digest).min(doc_id) over the union of all
    // batches picks the same survivors
    val all = Seq((7L, "same text"), (3L, "same text"), (1L, "unique a"),
      (9L, "same text"), (5L, "unique b")).toDF("doc_id", "text")
      .withColumn("digest", md5(col("text")))
    val batch = all.groupBy(col("digest")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(batch.toSeq === got)
  }

}
