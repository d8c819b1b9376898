package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every positional word
  * n-gram, slide a window of `w` consecutive hashes, keep the minimum
  * of each window, and the distinct kept hashes are the document's
  * fingerprint set. Guarantees: any shared run of w+n-1 words between
  * two documents shares at least one fingerprint, and the expected
  * density is 2/(w+1) — a tunable, position-robust alternative to
  * MinHash for local (substring) overlap detection.
  *
  * Everything is per-document array arithmetic on md5-derived 60-bit
  * hashes — embarrassingly parallel, no cross-document state, and
  * bit-identical in any engine that can take a min.
  */
object Winnowing {

  /** Fingerprint set per doc: (doc_id, fp). `n` = words per gram,
    * `w` = hashes per window. Docs shorter than n+w-1 words produce no
    * fingerprint (no full window exists). */
  def fingerprints(docs: DataFrame, textCol: String, n: Int, w: Int): DataFrame = {
    val words = split(col(textCol), " ")
    val cnt = size(words)
    // positional (NOT distinct) gram hashes — winnowing is about runs
    val gramHash = transform(sequence(lit(0), cnt - n),
      i => TextOps.hexHash60(
        concat_ws(" ", (0 until n).map(k => element_at(words, i + k + 1)): _*)))
    val mins = transform(sequence(lit(1), size(col("__h")) - (w - 1)),
      i => array_min(slice(col("__h"), i, lit(w))))
    TextOps.spread(docs).filter(cnt >= n + w - 1)
      .select(col("doc_id"), gramHash.as("__h"))
      .select(col("doc_id"), explode(array_distinct(mins)).as("fp"))
  }
}
