package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest layout of the canonical long table (FIXTURES.md §1 DDL):
  * parquet partitioned by UTC day of the tick, rows clustered by
  * (gtsid, ts) inside each file.
  *
  * This is the 100 TB design (SURVEY §4.1 "time-range pushdown"):
  *  - `tsday` partition column → FETCH time ranges prune whole
  *    directories before any IO (the analogue of the reference's
  *    rowkey seek on reversed timestamps, StandaloneStoreClient:180);
  *  - within a partition, parquet row-group min/max stats on `gtsid`
  *    and `ts` (from the sortWithinPartitions clustering) narrow the
  *    scan to the selected series — the analogue of the
  *    classId/labelsId rowkey prefix;
  *  - DELTA_BINARY_PACKED on sorted `ts` replaces GTSEncoder's
  *    per-point delta compression (SURVEY §1.1).
  */
object LongTable {

  val DayMicros: Long = 86400000000L

  /** Write points in the canonical at-rest layout. */
  def write(points: DataFrame, path: String): Unit =
    points
      .withColumn("tsday", (col("ts") / DayMicros).cast("long"))
      .repartition(col("tsday"))
      .sortWithinPartitions(col("gtsid"), col("ts"))
      .write.mode("overwrite")
      .partitionBy("tsday")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** FETCH-range scan: the tsday predicate prunes partitions, the ts
    * predicate prunes row groups; both reach the scan node. */
  def fetchRange(spark: SparkSession, path: String,
                 startTs: Long, endTs: Long): DataFrame =
    read(spark, path)
      .filter(col("tsday") >= startTs / DayMicros &&
        col("tsday") <= endTs / DayMicros)
      .filter(col("ts") >= startTs && col("ts") <= endTs)
      .drop("tsday")

  /** Bucketed at-rest layout: `bucketBy(gtsid)` + per-bucket
    * (gtsid, ts) sort. Every per-series operator (window specs,
    * groupBy(gtsid) aggregations, series-aligned self-joins) then
    * plans WITHOUT an Exchange — the scan itself satisfies the
    * clustered distribution, which is the single biggest shuffle in a
    * per-series workload at 100 TB. Size `buckets` ≈ cluster cores ×
    * a small factor; co-bucketed tables join shuffle-free.
    * (External table: data lives at `path`, metadata in the session
    * catalog under `table`.) */
  def writeBucketed(points: DataFrame, table: String, path: String,
                    buckets: Int): Unit =
    points.write.mode("overwrite")
      .bucketBy(buckets, "gtsid")
      .sortBy("gtsid", "ts")
      .option("path", path)
      .saveAsTable(table)

  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
