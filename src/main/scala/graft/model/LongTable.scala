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
}
