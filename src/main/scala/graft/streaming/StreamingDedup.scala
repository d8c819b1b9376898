package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication — the streaming face of the batch
  * digest-groupBy dedup (t01/t02): as documents arrive, only the FIRST
  * occurrence of each content digest survives, across micro-batches.
  *
  * Spark's built-in `dropDuplicates` on a stream keeps an arbitrary
  * first row per key; this operator is deterministic (min doc_id wins
  * within a batch, earlier batch wins across batches) so streamed
  * results are reproducible and comparable to the batch pass.
  *
  * State is one boolean per digest, partitioned by digest hash — the
  * same shuffle key the batch groupBy uses, so the 100 TB sizing
  * argument carries over (state scales with DISTINCT digests; use a
  * watermark + timeout eviction for unbounded streams — kept
  * NoTimeout here because training-corpus dedup wants full history).
  */
object StreamingDedup {

  final case class DedupOut(doc_id: Long, digest: String)

  /** `docs` must have (doc_id, digest) columns; emits survivors only. */
  def firstSeen(docs: DataFrame): Dataset[DedupOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("digest").cast("string"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (digest: String, rows: Iterator[(Long, String)],
         state: GroupState[Boolean]) => {
          if (state.getOption.contains(true)) Iterator.empty
          else {
            state.update(true)
            Iterator.single(DedupOut(rows.map(_._1).min, digest))
          }
        })
  }
}
