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

  test("ngramJaccardPairs: df cap drops hot shingles from pair generation only") {
    // "c o m" is boilerplate shared by ALL four docs (df=4); docs 1/2
    // additionally share the rare "x y z"/"y z w" grams (df=2 each).
    val d = docs(
      1L -> "x y z w c o m",
      2L -> "x y z w c o m",
      3L -> "p q r s c o m",
      4L -> "t u v a c o m")
    // uncapped (maxDf beyond any df): boilerplate pairs all 6 doc pairs
    val all = TextOps.ngramJaccardPairs(d, "text", 3, 1L, maxDf = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(all.size == 6 && all((1L, 2L)) == 5L)
    // capped at 3: the df-4 boilerplate gram can no longer generate
    // pairs; only the genuine near-dup pair (1,2) survives, its inter
    // counting just the rare grams, its Jaccard denominator still the
    // FULL uncapped shingle sizes (5 + 5 - 4)
    val capped = TextOps.ngramJaccardPairs(d, "text", 3, 1L, maxDf = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3)))
    assert(capped.toSeq == Seq((1L, 2L) -> ((4L, 4.0 / 6.0))))
    // plan lock: the self-join consumes the df pre-aggregate (two
    // hash aggregates on h feeding the equality join), so a regression
    // back to the uncapped raw self-join is visible in the plan
    val p = TextOps.ngramJaccardPairs(d, "text", 3, 1L)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("df_h"))
  }
}
