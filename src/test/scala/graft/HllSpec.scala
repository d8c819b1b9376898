package graft

import org.apache.spark.sql.functions._

import graft.operators.HllOps

/** Deterministic-HLL semantics: estimate accuracy and register math.
  * Cross-engine hash equality is proven by oracle row h02. */
class HllSpec extends SparkSpec {

  test("estimate within 5% for 1k distinct values (p=12 → ~1.6% stderr)") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ("k", s"user-${i % 1000}")).toDF("k", "v")
    val est = HllOps.estimateByKey(df, col("k"), col("v"), p = 12)
      .head().getDouble(1)
    assert(math.abs(est - 1000.0) / 1000.0 < 0.05, s"est=$est")
  }

  test("estimate is cardinality-only: duplicates don't move it") {
    import spark.implicits._
    val once = (1 to 200).map(i => ("k", s"u$i")).toDF("k", "v")
    val dup = (1 to 200).flatMap(i => Seq.fill(7)(("k", s"u$i"))).toDF("k", "v")
    val e1 = HllOps.estimateByKey(once, col("k"), col("v")).head().getDouble(1)
    val e2 = HllOps.estimateByKey(dup, col("k"), col("v")).head().getDouble(1)
    assert(e1 == e2)
  }

  test("per-key isolation: keys estimate independently") {
    import spark.implicits._
    val df = ((1 to 100).map(i => ("a", s"x$i")) ++ (1 to 10).map(i => ("b", s"y$i")))
      .toDF("k", "v")
    val got = HllOps.estimateByKey(df, col("k"), col("v")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - 100.0) < 10.0)
    assert(math.abs(got("b") - 10.0) < 3.0)
  }
}
