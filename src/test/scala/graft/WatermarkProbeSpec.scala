package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Empirical probe of append-mode watermark semantics (3 file batches):
  * does a late row for an ALREADY-EVICTED window get dropped, and does a
  * late row for a STILL-OPEN window get merged? Documents the rules the
  * s03 oracle twin encodes.
  */
class WatermarkProbeSpec extends SparkSpec {

  test("late row for evicted window dropped; late row for open window merged") {
    val s = spark
    import s.implicits._
    val tmp = Files.createTempDirectory("wmprobe").toString
    val in = s"$tmp/in"; val outP = s"$tmp/out"; val ck = s"$tmp/ck"
    Files.createDirectories(Paths.get(in))
    val MIN = 60000000L // 1 min in µs
    def write(name: String, mtime: Long, rows: Seq[Long]): Unit = {
      val stage = s"$tmp/stage_$name"
      rows.toDF("ts").coalesce(1).write.parquet(stage)
      val part = Files.list(Paths.get(stage)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      val dst = Paths.get(in, s"$name.parquet")
      Files.move(part, dst)
      dst.toFile.setLastModified(mtime)
    }
    val now = System.currentTimeMillis()
    // windows are 1-min tumbling; watermark delay 2 min
    // b0: rows in windows w0 [0,1m) and w9 [9m,10m) -> wm after b0 = 8m
    write("b0", now - 90000, Seq(10L * 1000000, 9L * MIN + 1000000))
    // b1: row in w20 -> advances wm to 19m; at b1 commit windows
    // ending <= 8m (w0) are evicted+emitted; late row for w0 (ts=20s)
    // and late row for w9 (ts 9m30s, end 10m > wm 8m) ride along
    write("b1", now - 60000, Seq(20L * 1000000 + 20L * MIN * 0, 20L * MIN + 1000000, 20L * 1000000, 9L * MIN + 30000000L))
    // b2: late rows again: one for w0 (evicted), one for w9 (end 10m <=
    // wm 19m -> evicted at b1? no: w9 end=10m > 8m so still open at b1,
    // evicted at b2 commit). ts=30s (w0) and 9m45s (w9)
    write("b2", now - 30000, Seq(30L * 1000000, 9L * MIN + 45000000L))
    val schema = StructType(Seq(StructField("ts", LongType)))
    val pts = s.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in)
    val agg = pts.withColumn("etime", timestamp_micros(col("ts")))
      .withWatermark("etime", "2 minutes")
      .groupBy(window(col("etime"), "1 minute")).count()
      .select(unix_micros(col("window.start")).as("ws"), col("count").as("n"))
    val q = agg.writeStream.format("parquet").option("path", outP)
      .option("checkpointLocation", ck)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    val out = s.read.parquet(outP).collect()
      .map(r => (r.getLong(0) / MIN, r.getLong(1))).sorted.toSeq
    println(s"WMPROBE OUTPUT: $out")
    // offsets dir tells how many batches ran
    println(s"WMPROBE BATCHES: ${new java.io.File(s"$ck/offsets").list().toSeq.sorted}")
    assert(out.nonEmpty)
  }
}
