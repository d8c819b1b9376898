package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingIngest

/** FIXTURES.md §6 streaming cases: file-source line-protocol ingest,
  * Plasma-style selector subscription, tumbling bucketize with
  * watermark. Memory sink + processAllAvailable makes them
  * deterministic. */
class StreamingSpec extends SparkSpec {

  private val NOW = 1700000000000000L

  test("file-source line protocol stream appends to the long table") {
    val dir = Files.createTempDirectory("graft-stream-in").toFile
    val out = Files.createTempDirectory("graft-stream-out").toFile
    val ckpt = Files.createTempDirectory("graft-ckpt").toFile
    Files.writeString(new java.io.File(dir, "batch1.txt").toPath,
      """1440000000000000// temp.a{room=x} 1.0
        |=1440000001000000// 2.0
        |1440000002000000// temp.b{room=y} 3.0
        |""".stripMargin)
    val q = StreamingIngest.ingestFiles(spark, dir.getAbsolutePath,
      out.getAbsolutePath, ckpt.getAbsolutePath, NOW)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val res = spark.read.parquet(out.getAbsolutePath)
    assert(res.count() === 3)
    assert(res.select("gtsid").distinct().count() === 2)
  }

  test("mobius periodic push re-evaluates the query per trigger") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val points = StreamingIngest.parseStream(mem.toDF(), NOW)
    val pushed = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = StreamingIngest.mobius(points, "1 second",
      b => b.groupBy(col("class")).agg(count(lit(1)).as("n"))) {
      (res, id) => res.collect().foreach(r => pushed.synchronized {
        pushed += ((id, r.getLong(1))) })
    }.start()
    mem.addData("1440000000000000// temp.a{room=x} 1.0",
      "1440000001000000// temp.a{room=x} 2.0")
    q.processAllAvailable()
    mem.addData("1440000002000000// temp.a{room=x} 3.0")
    q.processAllAvailable()
    q.stop()
    val counts = pushed.synchronized(pushed.toList)
    assert(counts.map(_._2) == List(2L, 1L)) // one push per micro-batch
    assert(counts.map(_._1).distinct.size == 2) // distinct batch ids
  }

  test("plasma subscription delivers only selector-matching points") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val pts = StreamingIngest.parseStream(mem.toDF(), NOW)
    val sub = StreamingIngest.subscribe(pts, "~temp\\..*{room=x}")
    val q = sub.writeStream.format("memory").queryName("plasma_out")
      .outputMode("append").start()
    mem.addData(
      "1// temp.a{room=x} 1.0",
      "2// temp.a{room=y} 2.0",
      "3// humidity.a{room=x} 3.0",
      "4// temp.b{room=x} 4.0")
    q.processAllAvailable()
    val got = spark.sql("SELECT class, vdouble FROM plasma_out ORDER BY ts")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    q.stop()
    assert(got === Seq(("temp.a", 1.0), ("temp.b", 4.0)))
  }

  test("streaming bucketize: late-within-watermark kept, beyond dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val pts = StreamingIngest.parseStream(mem.toDF(), NOW)
    val agg = StreamingIngest.streamingBucketize(pts, 10000000L, "10 seconds")
    val q = agg.writeStream.format("memory").queryName("buck_out")
      .outputMode("append").start()
    val base = 1700000000000000L
    mem.addData(s"$base// m{} 1.0", s"${base + 1000000}// m{} 2.0")
    q.processAllAvailable()
    // advance watermark far ahead, then send one within-bound late point
    mem.addData(s"${base + 60000000}// m{} 5.0")
    q.processAllAvailable()
    mem.addData(s"${base + 2000000}// m{} 100.0") // beyond watermark → dropped
    q.processAllAvailable()
    mem.addData(s"${base + 120000000}// m{} 7.0") // push watermark → close windows
    q.processAllAvailable()
    val rows = spark.sql("SELECT ts, vdouble, n FROM buck_out ORDER BY ts").collect()
    q.stop()
    // first window [base, base+10s) closed with only the two on-time points
    val first = rows.find(_.getLong(0) == base + 10000000L)
    assert(first.isDefined)
    assert(first.get.getDouble(1) === 3.0 && first.get.getLong(2) === 2L)
  }
}
