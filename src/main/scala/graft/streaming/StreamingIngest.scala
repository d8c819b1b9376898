package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.model.Gts
import graft.sources.{LineProtocol, Selector}

/** Structured-Streaming surface of the engine (SURVEY.md §2.10):
  *
  *  - live ingest of GTS line protocol (reference: WebSocket
  *    /streamupdate StandaloneStreamUpdateHandler; Kafka Ingress →
  *    Store/Directory pipeline) → append to the long table
  *  - Plasma-style subscriptions (StandalonePlasmaHandler:88-180):
  *    a selector-filtered continuous query over new points
  *  - maxpast/maxfuture ingest bounds (GTSHelper.parse:2920-2932) —
  *    the reference REJECTS beyond bounds and stores anything
  *    in-bounds; event-time watermarks only bound STATEFUL aggs,
  *    a semantic difference documented here: the raw append path
  *    drops nothing inside the bounds.
  */
object StreamingIngest {

  /** Parse a streaming text source of line protocol into canonical GTS
    * rows. `now` is fixed per query start (the reference uses server
    * receive time; deterministic tests inject it). */
  def parseStream(lines: DataFrame, now: Long,
                  maxpast: Option[Long] = None,
                  maxfuture: Option[Long] = None): DataFrame = {
    val schema = Gts.pointSchema
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    val parsed = lines.select(col("value").cast("string"))
      .mapPartitions { it =>
        LineProtocol.parseBatch(it.map(_.getString(0)), now, maxpast, maxfuture)
          .map { p =>
            Row(p.cls, p.labels, 0L, p.ts,
              p.lat.orNull, p.lon.orNull, p.elev.orNull, p.vtype,
              p.vlong.orNull, p.vdouble.orNull, p.vbool.orNull,
              p.vstring.orNull, p.vbinary.orNull)
          }
      }
    Gts.canonicalRehash(parsed)
  }

  /** File-source line-protocol ingest → parquet/Delta append of the
    * long table. At scale: same code, Kafka source, partitioned sink. */
  def ingestFiles(spark: SparkSession, inPath: String, outPath: String,
                  checkpoint: String, now: Long): DataStreamWriter[Row] = {
    val lines = spark.readStream.text(inPath)
    parseStream(lines, now).writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
  }

  /** Plasma subscription: selector-filtered view of a streaming point
    * frame (each subscriber is one lightweight filtered query). */
  def subscribe(points: DataFrame, selector: String): DataFrame =
    points.filter(Selector.parse(selector).predicate)

  /** Mobius-style periodic query push (reference
    * StandaloneMobiusHandler: a WarpScript macro re-executed on a fixed
    * period, results pushed to the subscriber): the frame query
    * re-evaluates against each micro-batch on a processing-time
    * trigger and the result is pushed through `push` — foreachBatch is
    * the Spark-native push surface (WebSocket/Kafka/etc. live inside
    * the callback). */
  def mobius(points: DataFrame, period: String,
             query: DataFrame => DataFrame)
            (push: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    points.writeStream
      .trigger(Trigger.ProcessingTime(period))
      .foreachBatch { (batch: DataFrame, id: Long) => push(query(batch), id) }

  /** Windowed streaming bucketize: tumbling event-time buckets with a
    * watermark bounding state (SURVEY §2.10 'windows in streaming').
    * Bucket identity = window END, matching batch BUCKETIZE's
    * end-anchored tick. */
  def streamingBucketize(points: DataFrame, spanMicros: Long,
                         watermark: String): DataFrame = {
    val withEventTime = points
      .withColumn("eventtime", timestamp_micros(col("ts")))
      .withWatermark("eventtime", watermark)
    withEventTime
      .groupBy(col("gtsid"),
        window(col("eventtime"), s"${spanMicros / 1000000} seconds"))
      .agg(sum(col("vdouble")).as("vdouble"), count(lit(1)).as("n"))
      .select(col("gtsid"), unix_micros(col("window.end")).as("ts"),
        col("vdouble"), col("n"))
  }
}
