package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQueries4
import graft.text.TextOps2

/** Hand-derived goldens for the retrieval/corpus-prep operators
  * (t25-t28 cover them vs DuckDB; these pin semantics on tiny docs). */
class TextOpsSpec3 extends SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("tfIdf: corpus-wide term scores 0, rare term scores tf*ln(N/df)") {
    val d = docs("a a a b", "a c c c", "a d")
    val got = TextOps2.tfIdf(d, minTf = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
        r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Double]("tfidf")))
    // only tf>=3 rows survive: (0, a, 3) and (1, c, 3)
    assert(got.length == 2)
    val byTerm = got.map(g => g._2 -> g).toMap
    assert(byTerm("a")._4 == 3L) // 'a' in every doc
    assert(byTerm("a")._5 == 0.0) // ln(3/3) = 0
    assert(byTerm("c")._4 == 1L)
    assert(math.abs(byTerm("c")._5 - 3.0 * math.log(3.0)) < 1e-6)
  }

  test("bm25: only docs containing a query term score; rarer term scores higher") {
    val d = docs("spark x y", "spark x y", "table x y", "z z z", "w w w",
      "v v v", "u u u")
    val got = TextOps2.bm25(d, Seq("spark", "table")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    // df(spark)=2 > df(table)=1 → table doc outranks spark docs
    assert(got(2L) > got(0L))
    assert(got(0L) == got(1L)) // identical docs, identical score
  }

  test("redactPii: every planted email/phone replaced and counted") {
    val d = docs("hi bob@x.com and +1-555-0001 end", "clean text here")
    val got = TextOps2.redactPii(d, TextQueries4.PiiRules ++ Nil)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_email"), r.getAs[Int]("n_phone"),
          r.getAs[String]("redacted"))).toMap
    assert(got(0L)._1 == 1 && got(0L)._2 == 1)
    assert(got(0L)._3 == "hi <EMAIL> and <PHONE> end")
    assert(got(1L) == ((0, 0, "clean text here")))
  }

  test("chunkWords: stride windows with kept short tail") {
    val text = (1 to 95).map(i => s"w$i").mkString(" ")
    val got = TextOps2.chunkWords(docs(text), 50, 40).collect()
      .map(r => (r.getAs[Int]("chunk_id"), r.getAs[Int]("n_words"),
        r.getAs[String]("w_first"), r.getAs[String]("w_last"))).sortBy(_._1)
    // starts 0, 40, 80 → windows [1..50], [41..90], [81..95]
    assert(got.toSeq == Seq((0, 50, "w1", "w50"), (1, 50, "w41", "w90"),
      (2, 15, "w81", "w95")))
  }
}
