package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Character-n-gram language identification — the classic heuristic
  * (Cavnar & Trenkle 1994 n-gram profiles) as two declarative stages:
  *
  *  1. `profile`: per-language top-K character trigrams by document
  *     frequency over a labeled training slice. The profile is tiny
  *     (langs × K rows) regardless of corpus size.
  *  2. `classify`: per-document distinct trigrams, broadcast-joined
  *     against the profile; score(doc, lang) = matched profile grams;
  *     prediction = argmax with a total-order tiebreak (score DESC,
  *     lang ASC).
  *
  * 100 TB shape: the only corpus-sized shuffles are the per-doc gram
  * aggregations; the profile side is a broadcast. Everything is exact
  * integer counting — no floats anywhere — so results are
  * engine-portable by construction.
  */
object LangId {

  /** Distinct character trigrams of a text column. */
  private def gramsOf(textCol: String): Column =
    array_distinct(transform(
      sequence(lit(1), length(col(textCol)) - 2),
      i => col(textCol).substr(i, lit(3))))

  /** Top-`k` trigrams per language by training document frequency
    * (ties broken by gram ASC — a total order, so the profile is
    * deterministic). Returns (lang, gram, df). */
  def profile(train: DataFrame, textCol: String, langCol: String,
              k: Int): DataFrame = {
    val grams = TextOps.spread(train)
      .filter(length(col(textCol)) >= 3)
      .select(col(langCol).as("lang"), explode(gramsOf(textCol)).as("gram"))
      .groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("df").desc, col("gram"))
    grams.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Score each doc against the (broadcast) profile: matched-gram count
    * per language, prediction = argmax. Docs sharing no gram with any
    * profile produce no row (inner-join semantics — mirrored by the
    * oracle). Returns (doc_id, pred_lang, score, n_langs_hit). */
  def classify(docs: DataFrame, textCol: String, prof: DataFrame): DataFrame = {
    val grams = TextOps.spread(docs)
      .filter(length(col(textCol)) >= 3)
      .select(col("doc_id"), explode(gramsOf(textCol)).as("gram"))
    val scores = grams
      .join(broadcast(prof.select(col("lang"), col("gram"))), "gram")
      .groupBy(col("doc_id"), col("lang")).agg(count(lit(1)).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("lang"))
    scores
      .withColumn("n_langs_hit", count(lit(1)).over(
        Window.partitionBy(col("doc_id"))))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("doc_id"), col("lang").as("pred_lang"),
        col("score"), col("n_langs_hit"))
  }
}
