package graft

import graft.plans.RewriteMd5Prefix

class ExtensionsSpec extends SparkSpec {

  test("RewriteMd5Prefix: the portable SQL spelling rewrites to md5_hash60") {
    val df = spark.range(100).selectExpr(
      "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT) AS h")
    // apply the injected rule directly (session-order independent — a
    // shared test session may predate the extension registration);
    // value identity native-vs-composed is Md5Hash60Spec's assertion
    val rewritten = RewriteMd5Prefix(df.queryExecution.optimizedPlan)
    assert(rewritten.toString.contains("md5_hash60"), rewritten.toString)
  }

  test("rule leaves non-matching conv/substring/md5 shapes alone") {
    // 14-digit prefix is NOT the 60-bit idiom — must not rewrite
    val df = spark.range(10).selectExpr(
      "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 14), 16, 10) AS BIGINT) AS h")
    val rewritten = RewriteMd5Prefix(df.queryExecution.optimizedPlan)
    assert(!rewritten.toString.contains("md5_hash60"), rewritten.toString)
  }
}
