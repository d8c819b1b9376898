package graft

import org.apache.spark.sql.functions._

import graft.text.{LangId, Winnowing}

class TextOpsSpec2 extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("winnowing: shared run of w+n-1 words shares at least one fingerprint") {
    // n=3, w=4: any shared run of 6 words guarantees a shared fingerprint
    val shared = "alpha beta gamma delta epsilon zeta"
    val d = docs(
      1L -> s"one two three $shared four five",
      2L -> s"$shared nine eight seven six")
    val fps = Winnowing.fingerprints(d, "text", 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val f1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._2).toSet
    assert((f1 & f2).nonEmpty)
  }

  test("winnowing: docs shorter than n+w-1 words produce no fingerprint") {
    val d = docs(1L -> "a b c d e") // 5 words < 3+4-1
    assert(Winnowing.fingerprints(d, "text", 3, 4).count() === 0)
  }

  test("winnowing: density is below 1 (windows collapse to shared minima)") {
    val d = docs(1L -> Seq.tabulate(50)(i => s"w$i").mkString(" "))
    val nFps = Winnowing.fingerprints(d, "text", 3, 4).count()
    val nGrams = 50 - 2
    // expected density 2/(w+1) = 0.4; assert well under all-windows
    assert(nFps < nGrams)
    assert(nFps > 0)
  }

  test("langid: classify picks the lang with most matched profile grams") {
    import spark.implicits._
    val train = Seq(
      (1L, "aaa aaa aaa", "xx"),
      (2L, "bbb bbb bbb", "yy")).toDF("doc_id", "text", "lang")
    val prof = LangId.profile(train, "text", "lang", 10)
    val res = LangId.classify(docs(9L -> "aaa aaa bbb"), "text", prof)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // "aaa aaa bbb" contains more xx-profile grams ("aaa", "aa ", ...)
    assert(res(9L) == "xx")
  }

  test("langid: equal scores break ties by lang ascending") {
    import spark.implicits._
    val train = Seq(
      (1L, "qqq", "zz"),
      (2L, "qqq", "aa")).toDF("doc_id", "text", "lang")
    val prof = LangId.profile(train, "text", "lang", 10)
    val res = LangId.classify(docs(9L -> "qqq"), "text", prof)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(res(9L) == "aa")
  }
}
