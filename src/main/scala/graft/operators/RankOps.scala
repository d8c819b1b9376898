package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-safe global ordering/ranking building blocks — replacements for
  * the `row_number().over(Window.orderBy(...))` anti-pattern, which
  * funnels the whole input through ONE task (reference sorts:
  * fn/VALUESORT.java, fn/SORTBY.java operate on in-memory GTS lists; on
  * a cluster the equivalent needs a distributed sort).
  *
  * The `order` columns must define a TOTAL order (add unique tiebreakers)
  * or assigned ranks are nondeterministic.
  */
object RankOps {

  /** Global top-k with dense 1..k ranks. `orderBy(...).limit(k)` plans as
    * `TakeOrderedAndProject` — each task keeps a k-size heap, the driver
    * merges k·numPartitions rows — then the rank column is a window over
    * only the k surviving rows. Scale-safe for any input size when k is
    * small (the single-partition window sees exactly k rows).
    */
  def topK(df: DataFrame, order: Seq[Column], k: Int,
           rankCol: String = "rk"): DataFrame =
    df.orderBy(order: _*).limit(k)
      .withColumn(rankCol, row_number().over(Window.orderBy(order: _*))
        .cast(IntegerType))

  /** Full global ranking of ALL rows without a single-partition sort:
    * range-repartition on the sort key (each partition holds a contiguous
    * key range, ranges ascending by partition id), rank locally within
    * each partition, then add the broadcast per-partition row-count
    * prefix offsets. Three narrow passes; the only global window runs
    * over numPartitions rows.
    *
    * The ranged frame is persisted (disk-spillable) before fan-out: both
    * consumers (local ranks and offsets) must observe IDENTICAL
    * `spark_partition_id()` assignments. Physical exchange reuse usually
    * guarantees that, but it is an optimizer behavior, not a contract —
    * the persist makes it one (the same two-passes-over-a-snapshot shape
    * as `RDD.zipWithIndex`). The cache entry is one range-shuffle of the
    * input, spilled to disk beyond memory.
    */
  def globalRank(df: DataFrame, order: Seq[Column], rankCol: String = "rank",
                 numParts: Int = 0): DataFrame = {
    val parts =
      if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val local = ranged.withColumn("__lrn",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(order: _*)))
    val offs = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offs), "__pid")
      .withColumn(rankCol, (col("__off") + col("__lrn")).cast(IntegerType))
      .drop("__pid", "__lrn", "__off")
  }
}
