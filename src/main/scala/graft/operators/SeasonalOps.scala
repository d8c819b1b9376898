package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition — the SQL-expressible core
  * of the reference's STL surface (fn/STL.java; our LOWESS-based STL
  * lives in [[graft.kernels.SeriesKernels]]): trend = centered moving
  * average, seasonal = per-phase mean of the detrended series, residual
  * = value − trend − seasonal.
  *
  * Exactness discipline: with integer-valued input on a regular grid,
  * the detrended value is kept as the EXACT integer `win·v − Σwin v`
  * (never the inexact `v − Σ/win`), so every aggregation is exact and
  * the final divisions are single identically-structured roundings —
  * bit-reproducible across engines with no tolerance rounding.
  */
object SeasonalOps {

  /** Decompose a regular-grid series table (one point per `span` tick).
    * `period` = ticks per season cycle; trend window = ±halfTrend rows
    * (edge rows with incomplete windows are dropped, as in classical
    * decomposition). */
  /** With `keepExact = true`, the EXACT integer intermediates survive as
    * `detr` (= win·v − Σwin v), `ssum` (= Σphase detr) and `scnt`
    * (phase count): downstream exact compositions (the STL→ESD test,
    * g94) need `scnt·win·resid = scnt·detr − ssum`-style scaled
    * residuals whose sums stay exact integers. */
  def classicalDecompose(points: DataFrame, span: Long, period: Int,
                         halfTrend: Int, keepExact: Boolean = false): DataFrame = {
    val win = 2 * halfTrend + 1
    val w = Window.partitionBy(col("gtsid")).orderBy(col("ts"))
      .rowsBetween(-halfTrend, halfTrend)
    // pin the series shuffle width: AQE sizes partitions on the (small)
    // pre-fill bytes and coalesces the window exchange to ~1 task, but
    // the dense grid multiplies rows AFTER that exchange. A
    // user-specified repartition keeps its partition count under AQE
    // and satisfies both windows' gtsid distribution (no extra shuffle).
    val spread = points.repartition(
      points.sparkSession.sessionState.conf.numShufflePartitions, col("gtsid"))
    val t = spread
      .withColumn("__tsum", sum(col("vdouble")).over(w))
      .withColumn("__tn", count(lit(1)).over(w))
      .filter(col("__tn") === win)
      .withColumn("__detr", lit(win) * col("vdouble") - col("__tsum"))
      .withColumn("__phase",
        ((col("ts") % (span * period)) / span).cast(org.apache.spark.sql.types.LongType))
    // per-phase seasonal means via a phase-partitioned window — one
    // shuffle on (gtsid, phase) instead of groupBy + join-back (sums
    // are exact integers, so the aggregation route is value-neutral)
    val wp = Window.partitionBy(col("gtsid"), col("__phase"))
    val full = t.withColumn("__ssum", sum(col("__detr")).over(wp))
      .withColumn("__scnt", count(lit(1)).over(wp))
      .withColumn("trend", col("__tsum") / win.toDouble)
      .withColumn("seasonal", col("__ssum") / (lit(win.toDouble) * col("__scnt")))
      .withColumn("resid", col("vdouble") - col("trend") - col("seasonal"))
    if (keepExact)
      full.withColumnRenamed("__detr", "detr")
        .withColumnRenamed("__ssum", "ssum").withColumnRenamed("__scnt", "scnt")
        .drop("__tsum", "__tn", "__phase")
    else
      full.drop("__tsum", "__tn", "__detr", "__phase", "__ssum", "__scnt")
  }
}
