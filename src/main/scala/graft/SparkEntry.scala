package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Gts
import graft.operators.GtsFrame
import graft.operators.GtsFrame._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-gated operator inventory: every entry has a
  * matching DuckDB SQL in `oracleSql` (or is rows-only checked when not
  * SQL-expressible). Query packs live in [[graft.queries]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: FETCH a selector, then
    * BUCKETIZE(mean) per day, then REDUCE(sum) by user — the reference's
    * canonical fetch→bucketize→reduce pipeline (SURVEY.md §7 step 2).
    */
  def entry(spark: SparkSession): DataFrame = {
    val f = GtsFrame(Gts.fromEvents(spark, "/root/testdata/sf0.001"))
      .select("~events\\..*")
      .bucketize(Mean, GtsQueries.LB, GtsQueries.DAY)
    f.reduce(Sum, Seq("user"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GtsQueries.queries ++ GtsQueries2.queries ++ GtsQueries3.queries ++ GtsQueries4.queries ++ RelationalQueries.queries ++
      TextQueries.queries ++ TextQueries2.queries ++ TextQueries3.queries ++ TextQueries4.queries ++ MiscQueries.queries ++ AnnQueries.queries ++ PqQueries.queries ++ GeoQueries.queries ++ GtsQueries5.queries ++ GtsQueries6.queries ++ WsQueries.queries ++ WsQueries2.queries ++ WsQueries3.queries ++ WsQueries4.queries ++ WsQueries5.queries ++ WsQueries6.queries ++ WsQueries7.queries ++ GtsQueries7.queries ++ GtsQueries8.queries ++ GtsQueries9.queries ++ GtsQueries10.queries ++ StreamQueries.queries

  /** Untimed one-time setup the bench runs before timing a row:
    * steady-state rows whose at-rest artifacts (a precomputed index a
    * real pipeline reads from storage) should not be billed to the
    * per-query timing. The bench lists prewarmed rows in its artifact;
    * Verify ignores this (the queries build lazily on their own). */
  def prewarm: Map[String, (SparkSession, String) => Unit] =
    TextQueries2.prewarm ++ StreamQueries.prewarm

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    GtsQueries.oracleSql ++ GtsQueries2.oracleSql ++ GtsQueries3.oracleSql ++ GtsQueries4.oracleSql ++ RelationalQueries.oracleSql ++
      TextQueries.oracleSql ++ TextQueries2.oracleSql ++ TextQueries3.oracleSql ++ TextQueries4.oracleSql ++ MiscQueries.oracleSql ++ AnnQueries.oracleSql ++ PqQueries.oracleSql ++ GeoQueries.oracleSql ++ GtsQueries5.oracleSql ++ GtsQueries6.oracleSql ++ WsQueries.oracleSql ++ WsQueries2.oracleSql ++ WsQueries3.oracleSql ++ WsQueries4.oracleSql ++ WsQueries5.oracleSql ++ WsQueries6.oracleSql ++ WsQueries7.oracleSql ++ GtsQueries7.oracleSql ++ GtsQueries8.oracleSql ++ GtsQueries9.oracleSql ++ GtsQueries10.oracleSql ++ StreamQueries.oracleSql
}
