package graft

import graft.text.BpeTrain

/** BPE training (t41): hand-worked merge sequences, including the
  * l=r run case where naive string replacement diverges from the
  * canonical greedy fold. */
class BpeSpec extends SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3), r.getLong(4))).sortBy(_._1)

  test("learns the classic merge sequence on a low/lower-style corpus") {
    // freq: low ×3, lowest ×2 → pairs lo:5 ow:5 we:2 es:2 st:2
    // tie lo/ow at 5 → 'lo' wins lexicographically; then lo+w (5)
    val got = rows(BpeTrain.train(docs("low low low lowest lowest"), 3))
    // tokens: 3·3 + 2·6 = 21 chars; after 'lo' (5 occurrences): 21-5=16
    assert(got(0) == (1L, "l", "o", 5L, 16L))
    // after 'lo'+'w' (5): 16-5=11
    assert(got(1) == (2L, "lo", "w", 5L, 11L))
    // remaining pairs in lowest: (low,e)·2 (e,s)·2 (s,t)·2 → tie at 2,
    // lexicographic: (e,s) < (low,e) < (s,t)
    assert(got(2) == (3L, "e", "s", 2L, 9L))
  }

  test("greedy run handling: aaaa merges to two aa, not aa a a") {
    val got = rows(BpeTrain.train(docs("aaaa aaaa aaa"), 2))
    // pair (a,a): aaaa has 3 adjacent pairs ×2 words + aaa has 2 → 8
    assert(got(0)._2 == "a" && got(0)._3 == "a" && got(0)._4 == 8L)
    // greedy application: aaaa → [aa,aa] (2 tokens), aaa → [aa,a]
    // → corpus tokens = 2+2+2 = 6 (naive replace would leave 3-token
    // aaaa words and give 8)
    assert(got(0)._5 == 6L)
    // second merge: pairs now (aa,aa)×2 and (aa,a)×1 → (aa,aa) cnt 2
    assert(got(1)._2 == "aa" && got(1)._3 == "aa" && got(1)._4 == 2L)
    assert(got(1)._5 == 4L) // aaaa→[aaaa], aaa→[aa,a]
  }

  test("tokenizeCounts segments the corpus under the learned merges") {
    // after merges lo, lo+w, e+s: low = [low], lowest = [low, es, t]
    val got = BpeTrain.tokenizeCounts(docs("low low low lowest lowest"), 3)
      .collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Long]("n_words") == 5L)
    assert(r.getAs[Long]("n_tokens") == 3 * 1 + 2 * 3)
    // 21 chars / 9 tokens
    assert(r.getAs[Double]("chars_per_tok") == 2.333333)
  }

  test("stops early when no pairs remain") {
    val got = rows(BpeTrain.train(docs("ab ab"), 5))
    assert(got.length == 1 && got(0)._2 == "a" && got(0)._3 == "b")
  }
}
