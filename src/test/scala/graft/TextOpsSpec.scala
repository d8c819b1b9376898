package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Hand goldens for the decontamination and repetition-quality
  * operators (t16/t17 oracle rows cover them end-to-end vs DuckDB). */
class TextOpsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("decontaminate: full, partial, and zero overlap") {
    val d = docs(
      0L -> "a b c d",       // benchmark (id % 2 == 0 in this test): grams "a b c", "b c d"
      1L -> "a b c d",       // corpus: both grams contaminated → ratio 1
      3L -> "x y a b c",     // grams "x y a","y a b","a b c" → 1 of 3
      5L -> "p q r s")       // no overlap → 0
    val got = TextOps.decontaminate(d, "text", 3, col("doc_id") % 2 === 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got(1L) == ((2L, 2L, 1.0)))
    assert(got(3L) == ((3L, 1L, 0.333333)))
    assert(got(5L) == ((2L, 0L, 0.0)))
    assert(!got.contains(0L)) // benchmark docs are not scored
  }

  test("repetitionScore: repeated text scores high, varied text low") {
    val d = docs(
      1L -> "spam spam spam spam", // bigrams all "spam spam": rep2 = 1-1/3
      2L -> "all words here differ")
    val got = TextOps.repetitionScore(d, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(got(1L) == ((4L, 0.666667, 1.0))) // top word 4/4
    assert(got(2L) == ((4L, 0.0, 0.25)))     // all bigrams distinct
  }
}
