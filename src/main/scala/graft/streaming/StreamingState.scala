package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators (SURVEY §2.10 'stateful ops' — the
  * reference keeps cross-exec state in KVSTORE/SHM extensions; here
  * Structured Streaming's mapGroupsWithState holds it natively).
  */
object StreamingState {

  final case class CounterState(lastValue: Double, compensated: Double)
  final case class CounterOut(gtsid: Long, ts: Long, vdouble: Double)

  /** Streaming COUNTERDELTA/RESETS compensation: per series, rebuild a
    * monotonic counter from a gauge that resets — identical recurrence
    * to the batch GtsFrame.compensateResets, but the carry lives in
    * stream state so it survives across micro-batches.
    */
  def compensateResets(points: DataFrame): Dataset[CounterOut] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.select(col("gtsid"), col("ts"), col("vdouble"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (gtsid: Long, rows: Iterator[(Long, Long, Double)],
         state: GroupState[CounterState]) => {
          var st = state.getOption.getOrElse(CounterState(Double.NaN, 0.0))
          val out = rows.toSeq.sortBy(_._2).map { case (_, ts, v) =>
            val delta = v - st.lastValue
            val inc = if (st.lastValue.isNaN) v else if (delta >= 0) delta else v
            st = CounterState(v, st.compensated + inc)
            CounterOut(gtsid, ts, st.compensated)
          }
          state.update(st)
          out.iterator
        })
  }

  final case class SessionState(lastTs: Long, session: Long)
  final case class SessionOut(gtsid: Long, ts: Long, vdouble: Double,
      session: Long)

  /** Streaming TIMESPLIT (fn/TIMESPLIT.java semantics): per series,
    * assign a new session id whenever the gap to the previous tick
    * reaches `quiet` µs (>= — GTSHelper.timesplit:6090, aligned with
    * the batch op in r11) — the batch GtsFrame.timesplit gap-cumsum, with
    * the (lastTs, session) carry in stream state so sessions continue
    * across micro-batches. Assumes per-key event-time ordered arrival
    * across batches (guard upstream with a watermark + sort within the
    * foreachBatch, as StreamingSpec does); within a batch rows are
    * sorted here.
    */
  def timesplitSessions(points: DataFrame, quiet: Long): Dataset[SessionOut] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.select(col("gtsid"), col("ts"), col("vdouble"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (gtsid: Long, rows: Iterator[(Long, Long, Double)],
         state: GroupState[SessionState]) => {
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
          val out = rows.toSeq.sortBy(r => (r._2, r._3)).map { case (_, ts, v) =>
            val newSession =
              if (st.lastTs != Long.MinValue && ts - st.lastTs >= quiet)
                st.session + 1
              else st.session
            st = SessionState(ts, newSession)
            SessionOut(gtsid, ts, v, newSession)
          }
          state.update(st)
          out.iterator
        })
  }
}
