package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Retrieval-scoring and corpus-preparation operators for LLM-training
  * pipelines: TF-IDF, BM25, PII redaction, sliding-window chunking.
  * Same scale discipline as [[TextOps]]: per-document work is
  * embarrassingly parallel (spread before CPU-heavy transforms), global
  * statistics are one tiny aggregate broadcast back, and nothing ever
  * joins on raw text.
  */
object TextOps2 {

  /** TF-IDF per (doc, term): tf exact counts, df via one distinct
    * (term, doc) aggregation, score = tf·ln(N/df). The log is the only
    * non-rational step — callers round it (libm ulps), the exact tf/df
    * ingredients ride along for verification. `minTf` bounds the output
    * (and the shuffle) to terms that matter locally.
    */
  def tfIdf(docs: DataFrame, minTf: Int): DataFrame = {
    // corpus size as a LAZY broadcast 1-row aggregate (a driver-side
    // count() here would block plan construction on a full scan)
    val n = docs.agg(count(lit(1)).cast(DoubleType).as("__n"))
    val terms = TextOps.spread(docs)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = terms.groupBy(col("term"))
      .agg(count(lit(1)).as("df")) // terms already distinct per doc
    terms.filter(col("tf") >= minTf)
      .join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf") * log(col("__n") / col("df")), 6).as("tfidf"))
  }

  /** BM25 (Robertson-Spärck Jones; the standard k1/b form) of every doc
    * against a small literal term set. Per-term contributions are
    * separate columns summed in FIXED order (never an aggregation over
    * inexact doubles — that would be partitioning-order-dependent);
    * df/avglen are one global aggregate cross-joined (broadcast) back.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    val words = split(col("text"), " ")
    val baseCols = col("doc_id") +:
      size(words).cast(DoubleType).as("len") +:
      terms.zipWithIndex.map { case (t, i) =>
        size(filter(words, w => w === t)).cast(DoubleType).as(s"tf$i")
      }
    val base = TextOps.spread(docs).select(baseCols: _*)
    val gaggs = count(lit(1)).cast(DoubleType).as("n") +:
      avg(col("len")).as("avglen") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast(DoubleType).as(s"df$i"))
    val g = base.agg(gaggs.head, gaggs.tail: _*)
    val contrib = terms.indices.map { i =>
      val idf = log((col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5))
      val tfTerm = col(s"tf$i") * (k1 + 1.0) /
        (col(s"tf$i") + lit(k1) *
          (lit(1.0 - b) + lit(b) * col("len") / col("avglen")))
      when(col(s"tf$i") > 0, idf * tfTerm).otherwise(0.0)
    }
    base.crossJoin(broadcast(g))
      .select(col("doc_id"),
        round(contrib.reduceLeft(_ + _), 6).as("bm25"))
      .filter(col("bm25") =!= 0.0)
  }

  /** PII redaction (C4-style scrubbing): replace every match of each
    * (pattern → token) pair, reporting per-pattern match counts. The
    * pattern set sticks to the regex intersection both Java and RE2
    * support (no backrefs/lookahead) so the operation is
    * engine-portable. Patterns apply in the given order to the running
    * redacted text.
    */
  def redactPii(docs: DataFrame, rules: Seq[(String, String, String)]): DataFrame = {
    // rules: (name, pattern, replacement token)
    val withCounts = rules.foldLeft(TextOps.spread(docs)) {
      case (d, (name, pat, _)) =>
        d.withColumn(s"n_$name", regexp_count(col("text"), lit(pat)))
    }
    val redacted = rules.foldLeft(col("text")) { case (c, (_, pat, tok)) =>
      regexp_replace(c, pat, tok)
    }
    withCounts.select(col("doc_id") +:
      rules.map { case (name, _, _) => col(s"n_$name") } :+
      redacted.as("redacted"): _*)
  }

  /** Deterministic output sharding + balance report: shard =
    * portable-md5(doc_id) mod `shards` — stable under any partitioning
    * or cluster size (no RNG, no spark_partition_id), so re-runs and
    * the DuckDB oracle land every doc in the same shard. Returns the
    * per-(shard, source) balance table a writer would use to size
    * output files. */
  def shardAssign(docs: DataFrame, shards: Int): DataFrame =
    docs.withColumn("shard",
        pmod(TextOps.hexHash60(col("doc_id").cast(StringType)), lit(shards.toLong)))
      .groupBy(col("shard"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))

  /** Unigram-LM quality score (the CCNet/KenLM-perplexity stage,
    * reduced to the corpus' own unigram model): per-doc mean negative
    * log-likelihood under p(w) = count(w)/total. Each ln p(w) is
    * quantized IN-ENGINE to the 2⁻²⁰ dyadic grid (floor(x·2²⁰ + 0.5)),
    * so the per-doc Σ tf·lnq is a sum of exact dyadics — aggregation-
    * order-independent, unlike a raw Σ ln p which would drift with
    * partitioning. Returns (doc_id, len, nll) with nll rounded 6. */
  def unigramLogLoss(docs: DataFrame): DataFrame = {
    val q = 1048576.0
    val terms = TextOps.spread(docs)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val vocab = terms.groupBy(col("word")).agg(sum(col("tf")).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).cast(DoubleType).as("total"))
    val lnq = floor(log(col("cnt") / col("total")) * q + 0.5) / q
    terms.join(vocab, "word").crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("len"),
        sum(col("tf") * lnq).as("__s"))
      .select(col("doc_id"), col("len"),
        round(-col("__s") / col("len"), 6).as("nll"))
  }

  /** Deterministic count-min sketch over corpus words (heavy-hitter
    * estimation — the 100 TB path for "which terms dominate" without a
    * full word groupBy): depth `d` portable-md5 hash rows × width `w`
    * counter buckets. Counters are plain sums (order-independent), the
    * hashes are the same md5 idiom the DuckDB oracle spells out, so
    * the whole sketch AND its estimates are engine-reproducible — an
    * oracle-gated approximate structure, not a rows-only one. Returns
    * (word, exact, est) for words with exact count ≥ `minCount`;
    * est ≥ exact by construction (one-sided CMS error).
    */
  def cmsHeavyHitters(docs: DataFrame, width: Int, depth: Int,
                      minCount: Long): DataFrame = {
    val words = TextOps.spread(docs)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    def bucket(i: Int, w: Column) =
      pmod(TextOps.hexHash60(concat(lit(i.toString), w)), lit(width.toLong))
    // counter table: one row per (hash row, bucket) with summed counts
    val counters = words
      .select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("i"), bucket(i, col("word")).as("b"))): _*)).as("ib"),
        col("cnt"))
      .groupBy(col("ib.i").as("i"), col("ib.b").as("b"))
      .agg(sum(col("cnt")).as("c"))
    // estimate = min over rows of the addressed counter
    val addressed = words.filter(col("cnt") >= minCount)
      .select(col("word"), col("cnt"),
        explode(array((0 until depth).map(i =>
          struct(lit(i).as("i"), bucket(i, col("word")).as("b"))): _*)).as("ib"))
      .select(col("word"), col("cnt"), col("ib.i").as("i"), col("ib.b").as("b"))
    addressed.join(counters, Seq("i", "b"))
      .groupBy(col("word"))
      .agg(first(col("cnt")).as("exact"), min(col("c")).as("est"))
  }

  /** Sliding-window word chunking (RAG/training-window preparation):
    * windows of `winWords` words every `stride` words, tail windows
    * kept. One explode per doc — chunk count ≈ len/stride; no driver
    * loops, no shuffle beyond the spread. */
  def chunkWords(docs: DataFrame, winWords: Int, stride: Int): DataFrame = {
    val words = split(col("text"), " ")
    val len = size(words)
    TextOps.spread(docs)
      .select(col("doc_id"), words.as("__w"), len.as("__len"))
      .withColumn("start",
        explode(sequence(lit(0), greatest(col("__len") - 1, lit(0)), lit(stride))))
      .select(col("doc_id"), (col("start") / stride).cast(IntegerType).as("chunk_id"),
        least(lit(winWords), col("__len") - col("start")).as("n_words"),
        element_at(col("__w"), col("start") + 1).as("w_first"),
        element_at(col("__w"),
          least(col("start") + winWords, col("__len"))).as("w_last"))
  }
}
