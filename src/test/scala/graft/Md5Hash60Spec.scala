package graft

import org.apache.spark.sql.functions._

import graft.plans.Md5Hash60

class Md5Hash60Spec extends SparkSpec {

  test("md5_hash60 equals the composed conv/substring/md5 form on varied inputs") {
    import spark.implicits._
    val df = (Seq("", "a", "hello world", "é ü 中文", "x" * 10000) ++
      (1 to 1000).map(i => s"shingle $i text"))
      .toDF("s")
    val both = df.select(
      Md5Hash60.md5Hash60(spark, col("s")).as("nat"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("bigint").as("ref"))
    assert(both.filter(col("nat") =!= col("ref")).count() === 0)
  }

  test("md5_hash60 stays inside whole-stage codegen") {
    val df = spark.range(10)
      .select(Md5Hash60.md5Hash60(spark, col("id").cast("string")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix is executedPlan.toString's WholeStageCodegen marker
    assert(plan.contains("*(1) Project"))
  }
}
