package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Gts

/** Canary for the events-loader schema coupling: the driver has shipped
  * `events.ts` as TIMESTAMP(NANOS) (read as BIGINT nanos), as a µs
  * TIMESTAMP, and as TIMESTAMP_NTZ across testdata regenerations.
  * [[Gts.eventsRaw]] must produce identical µs ticks for all encodings —
  * round 5 lost the whole GTS board to a hard-coded nanos read, so this
  * spec writes one tiny fixture per encoding and asserts tick equality.
  */
class EventsLoaderSpec extends SparkSpec {

  private val ticksUs = Seq(1735689600000000L, 1735689601500000L, 1735775999999999L)

  private def fixture(writeTs: org.apache.spark.sql.Column, tsType: DataType): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("events_canary").toFile
    dir.deleteOnExit()
    val df = ticksUs.zipWithIndex
      .map { case (t, i) => (i.toLong, t, i.toLong % 7, s"type$i", i * 1.5, s"p$i") }
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", writeTs).drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(df.schema("ts").dataType == tsType)
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.getAbsolutePath
  }

  private def ticksOf(dir: String): Seq[Long] =
    Gts.eventsRaw(spark, dir).select("ts").collect().map(_.getLong(0)).toSeq.sorted

  test("eventsRaw normalizes µs TIMESTAMP, TIMESTAMP_NTZ, and legacy nanos-long to identical ticks") {
    val asTimestamp = fixture(timestamp_micros(col("ts_us")), TimestampType)
    val asNtz = fixture(
      timestamp_micros(col("ts_us")).cast(TimestampNTZType), TimestampNTZType)
    val asNanosLong = fixture((col("ts_us") * 1000L).as("ts"), LongType)

    assert(ticksOf(asTimestamp) == ticksUs.sorted)
    assert(ticksOf(asNtz) == ticksUs.sorted)
    assert(ticksOf(asNanosLong) == ticksUs.sorted)
  }

  test("eventsRaw matches the driver's current testdata encoding end-to-end") {
    val ts = ticksOf("/root/testdata/sf0.001")
    assert(ts.nonEmpty)
    // ticks are µs in a sane epoch range (2020-2040), not nanos or millis
    assert(ts.forall(t => t > 1577836800000000L && t < 2208988800000000L))
    // fromEvents builds the canonical frame without throwing at plan time
    val n = Gts.fromEvents(spark, "/root/testdata/sf0.001").count()
    assert(n == ts.size)
  }
}
