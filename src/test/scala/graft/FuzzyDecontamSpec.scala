package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps3

/** Document-level fuzzy decontamination (t43): hand-derived Jaccard on
  * a tiny fixture + the broadcast plan lock. */
class FuzzyDecontamSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("flags corpus docs over the Jaccard threshold, exact arithmetic") {
    // doc 0 = benchmark: shingles {a b c, b c d, c d e} (3)
    // doc 1 shares 2 of its 3 shingles → J = 2/4 = 0.5 → flagged (≥)
    // doc 2 shares none → unflagged
    val d = docs(
      (0L, "a b c d e"),
      (1L, "a b c d x"), // shingles {a b c, b c d, c d x}
      (2L, "p q r s t"))
    val got = TextOps3.fuzzyDecontam(d, "text", 3,
      col("doc_id") === 0L, 1L, 2L).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Long]("ida") == 1L && r.getAs[Long]("idb") == 0L)
    assert(r.getAs[Long]("inter") == 2L)
    assert(r.getAs[Double]("jaccard") == 0.5)
  }

  test("threshold is strict rational: just-below tau stays unflagged") {
    // doc 1 shares 2 of 4 shingles with the 3-shingle bench doc:
    // J = 2/5 < 1/2 → not flagged
    val d = docs(
      (0L, "a b c d e"),
      (1L, "a b c d x y"))
    val got = TextOps3.fuzzyDecontam(d, "text", 3,
      col("doc_id") === 0L, 1L, 2L).collect()
    assert(got.isEmpty)
  }

  test("plan: benchmark side broadcasts, no cartesian join") {
    val d = docs((0L until 40L).map(i =>
      (i, s"w$i x$i y$i z$i q$i")): _*)
    val p = TextOps3.fuzzyDecontam(d, "text", 3,
      col("doc_id") % 7 === 0, 1L, 2L)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }
}
