package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BPE tokenizer training as corpus aggregation (Sennrich et al. 2016,
  * arXiv:1508.07909): learn the first `n` merge rules from the corpus.
  *
  * Scale shape — the part that matters at 100 TB: the corpus is
  * scanned ONCE, into the word-frequency table (the classic BPE
  * training input). Every merge iteration then runs on that vocab
  * table alone, whose size is the corpus' distinct-word count —
  * millions of rows against terabytes of text — so the iterative part
  * costs nothing corpus-shaped. The driver loop collects one argmax
  * row per round (the merge rule — inherently sequential, exactly like
  * the IVF trainer's Lloyd rounds), never data.
  *
  * Merge application is the canonical greedy left-to-right fold: a
  * pair merges when the accumulator's LAST symbol is `l` and the
  * incoming symbol is `r` — which resolves overlapping runs the way
  * the reference BPE implementation does ("aaaa" + (a,a) → "aa aa",
  * not "aa a a"; a plain string replace gets this wrong because the
  * consumed delimiter breaks the following match). The fold stays
  * correct for l=r runs because the merged symbol `lr` no longer
  * equals `l`. The DuckDB oracle replays the same semantics in
  * position space: match positions, gaps-and-islands, keep even
  * offsets per island (equivalent to the fold — adjacent matches only
  * arise for l=r runs).
  *
  * Ties in pair count break by (left, right) ascending — binary
  * string order on both engines.
  *
  * Returns one row per learned merge:
  * (step, left, right, pair_cnt, corpus_tokens) where corpus_tokens =
  * Σ freq·|symbols| AFTER applying that round's merge — so the oracle
  * checks rule application, not just pair counting.
  */
object BpeTrain {

  /** Words longer than this are excluded from training and
    * segmentation (both engine and oracle — a shared contract, not an
    * oracle-side truncation). */
  val MaxWordLen = 512

  def train(docs: DataFrame, nMerges: Int): DataFrame =
    trainState(docs, nMerges)._1

  /** Trained state: (merge-rule DataFrame as in [[train]], final vocab
    * symbolization (word, freq, syms)). The vocab side is the
    * broadcastable artifact segmentation joins against. */
  def trainState(docs: DataFrame, nMerges: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    var vocab = TextOps.spread(docs)
      .select(explode(split(col("text"), " ")).as("word"))
      // words over MaxWordLen chars are excluded from training AND
      // segmentation (the usual BPE vocab hygiene for URL-ish junk
      // tokens) — the oracle applies the same cap, so the contract is
      // explicit rather than a silent oracle truncation
      .filter(length(col("word")) > 0 &&
        length(col("word")) <= MaxWordLen)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      // split on the empty regex appends a trailing "" (Java limit -1
      // semantics) — strip it; real characters are never empty
      .select(col("word"), col("freq"),
        array_remove(split(col("word"), ""), "").as("syms"))
      .localCheckpoint(true)

    // One aggregate job per ROUND, not two (r14, guide §1.2): toks =
    // Σ freq·|syms| = Σ_pairs freq + Σ_words freq (each word has
    // |syms|−1 pairs), and Σ_words freq (W) is round-invariant — the
    // fold never adds or drops vocab rows. So round k+1's pair job
    // observes Σ_pairs freq over the post-merge-k vocab, which IS
    // merge k's corpus_tokens; only the LAST round needs a dedicated
    // toks job. Values are exact integer sums — identical arithmetic
    // to the per-round aggregate this replaces.
    val W = Option(vocab.agg(sum(col("freq"))).collect()(0).get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val steps = scala.collection.mutable.ArrayBuffer.empty[Row]
    // merge rule of the round whose corpus_tokens is not yet known
    var pending: Option[(Long, String, String, Long)] = None
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      val a = slice(col("syms"), lit(1), size(col("syms")) - 1)
      val b = slice(col("syms"), lit(2), size(col("syms")) - 1)
      val obs = org.apache.spark.sql.Observation()
      val best = vocab
        .select(col("freq"),
          explode(zip_with(a, b, (x, y) =>
            struct(x.as("l"), y.as("r")))).as("p"))
        .observe(obs, sum(col("freq")).as("psum"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      val toksBefore = // Σ freq·|syms| of the CURRENT vocab
        W + obs.get.get("psum").flatMap(Option(_))
          .map(_.asInstanceOf[Long]).getOrElse(0L)
      pending.foreach { case (s, l, r, cnt) =>
        steps += Row(s, l, r, cnt, toksBefore)
      }
      pending = None
      if (best.isEmpty) done = true
      else {
        val (l, r, cnt) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        val merged = l + r
        // greedy left-to-right fold; acc rebuilt per element is fine —
        // words are short, and this runs on the vocab table only
        val folded = aggregate(col("syms"),
          array().cast(ArrayType(StringType)),
          (acc, x) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
            .otherwise(concat(acc, array(x))))
        vocab = vocab.select(col("word"), col("freq"), folded.as("syms"))
          .localCheckpoint(true)
        pending = Some((step.toLong, l, r, cnt))
        step += 1
      }
    }
    // the final round's corpus_tokens: no later pair job observed it
    pending.foreach { case (s, l, r, cnt) =>
      val toks = vocab
        .agg(sum(col("freq") * size(col("syms")))).collect()(0).getLong(0)
      steps += Row(s, l, r, cnt, toks)
    }
    val merges = spark.createDataFrame(
      spark.sparkContext.parallelize(steps.toSeq, 1),
      StructType(Seq(
        StructField("step", LongType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("pair_cnt", LongType, nullable = false),
        StructField("corpus_tokens", LongType, nullable = false))))
    (merges, vocab)
  }

  /** Corpus segmentation with the trained merges — the serving pair of
    * [[train]]: per-doc token counts under the learned vocabulary.
    * The trained symbolization is a (word → |tokens|) table the size
    * of the vocab, BROADCAST back against one exploded corpus scan —
    * no merge work ever touches the corpus itself. Returns
    * (doc_id, n_words, n_tokens, chars_per_tok round 6). */
  def tokenizeCounts(docs: DataFrame, nMerges: Int): DataFrame = {
    val vocab = trainState(docs, nMerges)._2
    val wt = vocab.select(col("word"),
      size(col("syms")).cast(LongType).as("ntok"))
    TextOps.spread(docs)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      // the vocab join drops >MaxWordLen words implicitly (they were
      // never trained); the filter above only guards empties
      .join(broadcast(wt), "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("ntok")).as("n_tokens"),
        round(sum(length(col("word"))).cast(DoubleType) /
          sum(col("ntok")), 6).as("chars_per_tok"))
  }
}
