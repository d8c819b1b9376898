package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Selector

/** Metadata-surface operators: FIND / META / DELETE (reference:
  * EgressFindHandler + fn/FIND.java; fn/META.java attribute upsert;
  * StandaloneDeleteHandler + fn/DELETE.java).
  *
  * The metadata table is one row per series (tiny next to the point
  * table) — FIND never touches points, DELETE prunes series first and
  * only then anti-joins the point table on gtsid + tick range.
  */
object MetaOps {

  /** FIND — selector search over the metadata table. */
  def find(meta: DataFrame, selector: String): DataFrame =
    meta.filter(Selector.parse(selector).metaPredicate)

  /** META — upsert attributes for the selected series (attributes are
    * mutable and NOT part of identity, thrift Metadata:50). `updates`
    * maps gtsid → attribute map; empty-string values remove keys
    * (delta semantics of fn/META.java). */
  def setAttributes(meta: DataFrame, updates: DataFrame): DataFrame = {
    val merged = meta.join(updates.withColumnRenamed("attributes", "__new"),
      Seq("gtsid"), "left")
    merged.withColumn("attributes",
      when(col("__new").isNull, col("attributes"))
        .otherwise(map_filter(map_concat(
          map_filter(col("attributes"), (k, _) => !map_contains_key(col("__new"), k)),
          col("__new")), (_, v) => v =!= "")))
      .drop("__new")
  }

  /** DELETE — remove points of selector-matched series within
    * [startTs, endTs]; returns the retained point set (storage rewrite
    * is the sink's concern — Delta delete or partition overwrite). */
  def deleteBySelector(points: DataFrame, meta: DataFrame, selector: String,
                       startTs: Long = Long.MinValue,
                       endTs: Long = Long.MaxValue): DataFrame = {
    val doomed = find(meta, selector).select(col("gtsid"))
    val inRange = col("ts") >= startTs && col("ts") <= endTs
    // keep: series not matched, or matched but outside the range
    points.join(broadcast(doomed.withColumn("__del", lit(true))),
        Seq("gtsid"), "left")
      .filter(col("__del").isNull || !inRange)
      .drop("__del")
  }
}
