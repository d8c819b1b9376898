package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.{LangId, Winnowing}

/** Third text pack: language identification and winnowing
  * fingerprints — both exact-integer pipelines, so the DuckDB oracle
  * replays them verbatim (no rounding anywhere).
  */
object TextQueries3 {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Train slice (80%) for the language-ID profile. */
  private val TrainPred = col("doc_id") % 10 < 8
  val ProfileK = 100

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Language-ID (Cavnar-Trenkle char-trigram profiles): top-100
    // trigrams per lang from the 80% train slice, broadcast-scored
    // against the 20% held-out slice; prediction = matched-gram argmax
    "t20_langid" -> ((s, dir) => {
      val d = docs(s, dir)
      val prof = LangId.profile(d.filter(TrainPred), "text", "lang", ProfileK)
      LangId.classify(d.filter(!TrainPred), "text", prof)
    }),

    // Winnowing fingerprints (MOSS, SIGMOD'03): positional word-3-gram
    // hashes, window-4 minima, distinct per doc — local-overlap
    // fingerprinting that MinHash's bag-of-shingles can't do
    "t21_winnowing" -> ((s, dir) =>
      Winnowing.fingerprints(docs(s, dir), "text", 3, 4))
  )

  val oracleSql: Map[String, String] = Map(
    "t20_langid" ->
      s"""WITH g AS (
         |  SELECT doc_id, lang,
         |    list_distinct(list_transform(generate_series(1, length(text) - 2),
         |      i -> substring(text, i, 3))) AS grams
         |  FROM documents WHERE length(text) >= 3),
         |tg AS (SELECT lang, unnest(grams) AS gram FROM g WHERE doc_id % 10 < 8),
         |df AS (SELECT lang, gram, count(*) AS df FROM tg GROUP BY 1, 2),
         |prof AS (SELECT lang, gram FROM (
         |    SELECT lang, gram,
         |      row_number() OVER (PARTITION BY lang ORDER BY df DESC, gram) AS rk
         |    FROM df) WHERE rk <= $ProfileK),
         |cg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 10 >= 8),
         |sc AS (SELECT doc_id, p.lang, count(*) AS score
         |       FROM cg JOIN prof p USING (gram) GROUP BY 1, 2),
         |rk AS (SELECT doc_id, lang, score,
         |         count(*) OVER (PARTITION BY doc_id) AS n_langs_hit,
         |         row_number() OVER (PARTITION BY doc_id
         |           ORDER BY score DESC, lang) AS rn
         |       FROM sc)
         |SELECT doc_id, lang AS pred_lang, score, n_langs_hit
         |FROM rk WHERE rn = 1""".stripMargin,

    "t21_winnowing" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |h AS (SELECT doc_id,
        |    list_transform(generate_series(1, len(words) - 2),
        |      i -> ('0x' || substring(md5(words[i] || ' ' || words[i+1] || ' ' || words[i+2]), 1, 15))::BIGINT) AS hs
        |  FROM w WHERE len(words) >= 6),
        |mins AS (SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, len(hs) - 3),
        |      i -> list_min(hs[i:i+3]))) AS fps
        |  FROM h)
        |SELECT doc_id, unnest(fps) AS fp FROM mins""".stripMargin
  )
}
