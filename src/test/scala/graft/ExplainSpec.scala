package graft

import org.apache.spark.sql.functions._

import graft.operators.RankOps

/** Plan-shape assertions: the scale-sensitive rewrites must keep their
  * distributed physical form (a regression back to a global-window
  * row_number would silently reintroduce a single-partition sort).
  */
class ExplainSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def sample = {
    import spark.implicits._
    (1 to 100).map(i => (i.toLong, (i * 37 % 101).toDouble)).toDF("id", "v")
  }

  test("topK plans as TakeOrderedAndProject, not a global window sort") {
    val df = RankOps.topK(sample, Seq(col("v").desc, col("id")), 5)
    assert(plan(df).contains("TakeOrderedAndProject"))
    val got = df.select("id", "v", "rk").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).sortBy(_._3)
    assert(got.map(_._3).toSeq == Seq(1, 2, 3, 4, 5))
    // ground truth: sort locally
    val truth = sample.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, v) => (-v, id) }.take(5)
    assert(got.map(t => (t._1, t._2)).toSeq == truth.toSeq)
  }

  test("globalRank ranges-partitions the sort and matches a local sort") {
    val df = RankOps.globalRank(sample, Seq(col("v").desc, col("id")), numParts = 7)
    assert(plan(df).toLowerCase.contains("rangepartitioning"))
    val got = df.select("id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val truth = sample.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, v) => (-v, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    assert(got == truth)
  }

  test("globalRank with fewer rows than partitions still ranks densely") {
    import spark.implicits._
    val tiny = Seq((1L, 2.0), (2L, 9.0), (3L, 4.0)).toDF("id", "v")
    val got = RankOps.globalRank(tiny, Seq(col("v").desc, col("id")), numParts = 8)
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(2L -> 1, 3L -> 2, 1L -> 3))
  }
}
