package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Large-scale text dedup & fingerprinting for LLM-training pipelines:
  * word-shingles, MinHash signatures, LSH banding, SimHash, exact
  * n-gram Jaccard. First-class engine components (BASELINE.json north
  * star), built shuffle-consciously: everything groups/joins on compact
  * integer keys (never raw text) so the 100 TB plan moves hashes, not
  * documents.
  *
  * Hashing is engine-portable by construction (md5 → 15 hex digits →
  * 60-bit int; affine permutations mod a 31-bit prime) so results are
  * bit-reproducible anywhere — including the DuckDB oracle.
  */
object TextOps {

  /** 31-bit Mersenne prime for the affine MinHash permutations. */
  val P: Long = 2147483647L
  val NumPerms = 8

  def permA(i: Int): Long = (2654435761L * (i + 1)) % P
  def permB(i: Int): Long = (40503L * (i + 1) + 7) % P

  /** Portable 60-bit content hash: first 15 hex digits of md5 —
    * computed by the native [[graft.plans.Md5Hash60]] expression
    * (digest bytes folded directly to a long; value-identical to the
    * conv/substring/md5 composition the oracles spell out, without the
    * hex-string round-trip on the hot path). */
  def hexHash60(c: Column): Column =
    graft.plans.Md5Hash60.md5Hash60(
      org.apache.spark.sql.SparkSession.active, c)

  /** Spread a per-document CPU-heavy transform across the cluster: a
    * small parquet input arrives in one or few splits (128 MB default
    * split size), which would serialize the downstream explode+hash
    * work into single-task stages. Hash-partitioning on doc_id costs a
    * tiny text shuffle and buys full-core parallelism; at real corpus
    * scale the scan already has thousands of splits and this is a no-op
    * cost-wise (same key, no skew). */
  private[text] def spread(docs: DataFrame): DataFrame = spreadBy(docs, "doc_id")

  private[text] def spreadBy(df: DataFrame, key: String): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
      col(key))

  /** Distinct word n-gram shingles per doc: (doc_id, shingle). Docs with
    * fewer than n words are dropped (no shingle exists). */
  def shingles(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    val words = split(col(textCol), " ")
    val cnt = size(words)
    val grams = transform(sequence(lit(0), cnt - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(words, i + k + 1)): _*))
    spread(docs).filter(cnt >= n)
      .select(col("doc_id"), explode(array_distinct(grams)).as("shingle"))
  }

  /** MinHash signature per doc: NumPerms affine permutations of the
    * shingle hash, min-aggregated — one shuffle on doc_id. */
  def minhashSignatures(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    // materialize the md5-derived hash ONCE per shingle — the 8 min
    // aggregates then run on a cheap long column (md5 is the hot cost)
    val sh = shingles(docs, textCol, n)
      .select(col("doc_id"), (hexHash60(col("shingle")) % P).as("hm"))
    sh.groupBy(col("doc_id"))
      .agg(min((col("hm") * permA(0) + permB(0)) % P).as("mh0"),
        (1 until NumPerms).map(i =>
          min((col("hm") * permA(i) + permB(i)) % P).as(s"mh$i")): _*)
  }

  /** Candidate near-dup pairs via LSH banding (bands of 2 rows over the
    * 8-perm signature): docs sharing ANY band collide. The self-join is
    * on (band index, band key) — tiny keys, massively selective. */
  def lshCandidates(docs: DataFrame, textCol: String, n: Int): DataFrame =
    lshCandidatesFromSig(minhashSignatures(docs, textCol, n))

  /** (doc_id, bi, bk) band keys of a signature frame — the LSH index
    * rows (bands of 2 over the NumPerms-wide signature); shared by the
    * self-join candidates below and the incremental batch-vs-index
    * join ([[TextOps3.incrementalNearDup]]). */
  def bandKeys(sig: DataFrame): DataFrame = {
    val bands = array((0 until NumPerms / 2).map(b =>
      struct(lit(b).as("bi"),
        concat_ws("_", col(s"mh${2 * b}"), col(s"mh${2 * b + 1}")).as("bk"))): _*)
    sig.select(col("doc_id"), explode(bands).as("band"))
      .select(col("doc_id"), col("band.bi").as("bi"), col("band.bk").as("bk"))
  }

  /** Band-collision candidate pairs from an existing signature frame
    * (bands of 2 rows over the NumPerms-wide signature). */
  def lshCandidatesFromSig(sig: DataFrame): DataFrame = {
    val e = bandKeys(sig)
    val l = e.select(col("doc_id").as("ida"), col("bi"), col("bk"))
    val r = e.select(col("doc_id").as("idb"), col("bi"), col("bk"))
    l.join(r, Seq("bi", "bk")).filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb")).distinct()
  }

  /** Estimated-Jaccard top-k similar pairs from MinHash signatures
    * (all-pairs over signatures — use [[lshCandidates]] at scale;
    * this exact variant is the small-data oracle baseline). */
  def minhashTopPairs(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    val sig = minhashSignatures(docs, textCol, n)
    val a = sig.columns.foldLeft(sig)((d, c) => d.withColumnRenamed(c, s"a_$c"))
    val b = sig.columns.foldLeft(sig)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    val matches = (0 until NumPerms)
      .map(i => when(col(s"a_mh$i") === col(s"b_mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    val pairs = a.crossJoin(b).filter(col("a_doc_id") < col("b_doc_id"))
      .select(col("a_doc_id").as("ida"), col("b_doc_id").as("idb"),
        (matches.cast(DoubleType) / NumPerms).as("est_jaccard"))
    // top-k via TakeOrderedAndProject — the pair stream never funnels
    // through a single-partition window
    graft.operators.RankOps.topK(pairs,
      Seq(col("est_jaccard").desc, col("ida"), col("idb")), k, "rk")
  }

  /** DEFAULT top-k near-dup pair mining — the entry point a pipeline
    * should call at any corpus size: estimate Jaccard only on LSH
    * band-collision candidates (equality joins throughout, no all-pairs
    * anywhere in the plan), then take the global top-k. Pairs colliding
    * in no band are pruned by construction; for near-dup mining that is
    * the point of banding (such pairs have est_jaccard below the band
    * threshold w.h.p.). [[minhashTopPairs]] remains the small-data
    * oracle baseline that scores even non-candidate pairs. */
  def minhashTopPairsBanded(docs: DataFrame, textCol: String, n: Int,
                            k: Int): DataFrame = {
    // signatures feed both the banding explode and the two pair-scoring
    // joins: materialize once (the frame is NumPerms longs per doc)
    val sig = minhashSignatures(docs, textCol, n).localCheckpoint(true)
    val cand = lshCandidatesFromSig(sig)
    val a = sig.columns.foldLeft(sig)((d, c) => d.withColumnRenamed(c, s"a_$c"))
    val b = sig.columns.foldLeft(sig)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    val matches = (0 until NumPerms)
      .map(i => when(col(s"a_mh$i") === col(s"b_mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    val pairs = cand
      .join(a, cand("ida") === a("a_doc_id"))
      .join(b, cand("idb") === b("b_doc_id"))
      .select(col("ida"), col("idb"),
        (matches.cast(DoubleType) / NumPerms).as("est_jaccard"))
    graft.operators.RankOps.topK(pairs,
      Seq(col("est_jaccard").desc, col("ida"), col("idb")), k, "rk")
  }

  /** Exact n-gram Jaccard for pairs sharing ≥ minIntersect shingles:
    * the verification stage after LSH candidates. Joins on the shingle
    * HASH, not the shingle text.
    *
    * A shingle present in d documents contributes d² rows to the
    * self-join, so one corpus-scale stop-phrase n-gram (d ~ 10⁶) would
    * dominate the whole stage. `maxDf` drops such shingles from PAIR
    * GENERATION before the join (Lee et al. 2021 §3 — every production
    * dedup pipeline caps shingle document frequency); the per-doc
    * shingle sizes stay uncapped so the Jaccard denominator is exact.
    * The df pre-agg has a map-side partial combine (a hot shingle is 1
    * row per input partition, never collected), and it shuffles on the
    * same key `h` as the self-join, so the exchange is reused. The
    * default 128 sits 5× above the largest genuine near-dup cluster
    * observed at sf0.001/0.01/0.1 (max df 9/7/25) — it never binds on
    * real duplicate content, only on boilerplate. */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, n: Int,
                        minIntersect: Long, maxDf: Long = 128L): DataFrame = {
    // three consumers (sizes + both self-join sides) would otherwise
    // re-run the explode+md5 scan three times — lazy persist doesn't
    // help because AQE materializes their query stages CONCURRENTLY and
    // each races to compute the uncached subtree. Eager localCheckpoint
    // runs the scan exactly once up front (hashes are ~1/20th of the
    // text); consumers then read materialized blocks.
    val sh = shingles(docs, textCol, n)
      .select(col("doc_id"), hexHash60(col("shingle")).as("h"))
      .localCheckpoint(true)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val rare = sh.groupBy(col("h")).agg(count(lit(1)).as("df_h"))
      .filter(col("df_h") <= maxDf).select(col("h"))
    val shc = sh.join(rare, "h")
    val inter = shc.select(col("doc_id").as("ida"), col("h"))
      .join(shc.select(col("doc_id").as("idb"), col("h")), "h")
      .filter(col("ida") < col("idb"))
      .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("inter"))
      .filter(col("inter") >= minIntersect)
    inter
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "ida", "nsh" -> "na")), "ida")
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "idb", "nsh" -> "nb")), "idb")
      .select(col("ida"), col("idb"), col("inter"),
        (col("inter").cast(DoubleType) /
          (col("na") + col("nb") - col("inter"))).as("jaccard"))
  }

  val SimhashBits = 32

  /** 32-bit SimHash over distinct words (Charikar 2002): per bit, sum
    * ±1 votes of each word-hash's bit, take the sign. One groupBy with
    * 32 conditional sums — fully codegen'd, no UDF. */
  def simhash(docs: DataFrame, textCol: String): DataFrame = {
    val words = spread(docs).select(col("doc_id"),
      explode(array_distinct(split(col(textCol), " "))).as("w"))
      .select(col("doc_id"), hexHash60(col("w")).as("h60"))
    val h = col("h60")
    val votes = (0 until SimhashBits).map(j =>
      sum(when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j"))
    val agg = words.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val sig = (0 until SimhashBits)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Split a `bits`-wide fingerprint into `blocks` contiguous bit-blocks
    * of near-equal width (Manku et al., WWW'07 multi-block indexing). */
  def simhashBlocks(sig: Column, bits: Int, blocks: Int): Seq[Column] =
    (0 until blocks).map { j =>
      val lo = j * bits / blocks
      val hi = (j + 1) * bits / blocks
      shiftright(sig, lo).bitwiseAND(lit((1L << (hi - lo)) - 1))
    }

  /** EXACT near-dup pairs (hamming ≤ k) without an all-pairs join: band
    * the fingerprint into k+1 blocks — by pigeonhole, any pair within
    * hamming k agrees on at least one whole block — equality-join on
    * (block index, block value), then verify true hamming on candidates
    * only. Candidate volume per block is N²/2^(bits/(k+1)) per bucket
    * family: selectivity scales with fingerprint width, so at corpus
    * scale pair a wider simhash with a smaller radius (the classic
    * Manku config is 64-bit prints, k=3 → 16-bit blocks).
    *
    * `sig` must have (doc_id, simhash). `leftPred` restricts the query
    * side (e.g. a sampled subset) while still searching the full corpus.
    */
  def simhashNearDupBanded(sig: DataFrame, bits: Int, k: Int,
                           leftPred: Column = lit(true)): DataFrame = {
    val blocks = k + 1
    val blkArr = array(simhashBlocks(col("simhash"), bits, blocks).zipWithIndex.map {
      case (c, i) => struct(lit(i).as("bi"), c.as("bv"))
    }: _*)
    val e = sig.select(col("doc_id"), col("simhash"), explode(blkArr).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.bi").as("bi"), col("b.bv").as("bv"))
    val l = e.filter(leftPred)
      .select(col("doc_id").as("ida"), col("simhash").as("ha"), col("bi"), col("bv"))
    val r = e.select(col("doc_id").as("idb"), col("simhash").as("hb"), col("bi"), col("bv"))
    l.join(r, Seq("bi", "bv")).filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        hamming(col("ha"), col("hb")).cast(IntegerType).as("hdist"))
      .filter(col("hdist") <= k)
      .distinct()
  }

  /** Benchmark decontamination (the eval-overlap filter every training
    * pipeline runs before a model sees the corpus): for each corpus
    * document, the fraction of its distinct word `n`-grams that appear
    * in ANY benchmark document. `isBench` partitions the input into the
    * (small) benchmark side and the corpus side.
    *
    * 100 TB shape: the benchmark n-gram index is tiny relative to the
    * corpus, so it is BROADCAST and the overlap check is a broadcast
    * semi-join per corpus shingle — one shuffle (doc_id aggregation),
    * no corpus self-join. n is a parameter: production pipelines use
    * 8-13; tests use 3 to match the short synthetic documents.
    * Returns (doc_id, n_grams, n_hits, ratio).
    */
  def decontaminate(docs: DataFrame, textCol: String, n: Int,
                    isBench: Column): DataFrame = {
    val sh = shingles(docs, textCol, n)
    val flags = docs.select(col("doc_id"), isBench.as("__b"))
    val tagged = sh.join(flags, "doc_id")
    val bench = broadcast(tagged.filter(col("__b"))
      .select(col("shingle")).distinct().withColumn("__hit", lit(1)))
    // single pass over the corpus shingles: the broadcast LEFT join
    // marks contaminated shingles, one aggregation counts both totals
    // (two separate branches would re-explode the corpus twice)
    tagged.filter(!col("__b"))
      .join(bench, Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), // shingles() already distinct
        count(col("__hit")).as("n_hits"))
      .select(col("doc_id"), col("n_grams"), col("n_hits"),
        round(col("n_hits") / col("n_grams"), 6).as("ratio"))
  }

  /** Within-document repetition quality signals (the Gopher/Rae-style
    * repetition filters): duplicate-bigram fraction
    * (1 − distinct/total) and top-word fraction (most frequent word's
    * share). Exact integer counts; only the two final divisions round.
    * Per-doc array ops + one word hash-agg — no cross-document state,
    * embarrassingly parallel at any scale.
    * Returns (doc_id, n_words, rep2, top_frac).
    */
  def repetitionScore(docs: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val words = split(col(textCol), " ")
    val base = docs.select(col("doc_id"), words.as("w"))
      .filter(size(col("w")) >= 2)
    val grams = transform(sequence(lit(0), size(col("w")) - 2), i =>
      concat_ws(" ", element_at(col("w"), i + 1), element_at(col("w"), i + 2)))
    val g = base.select(col("doc_id"),
      size(col("w")).cast(LongType).as("n_words"),
      (size(col("w")) - 1).cast(LongType).as("n_bigrams"),
      size(array_distinct(grams)).cast(LongType).as("n_distinct"))
    val top = base.select(col("doc_id"), explode(col("w")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"))
    g.join(top, "doc_id")
      .select(col("doc_id"), col("n_words"),
        round(lit(1.0) - col("n_distinct") / col("n_bigrams"), 6).as("rep2"),
        round(col("top_c") / col("n_words"), 6).as("top_frac"))
  }
}
