package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third text-ops pack: duplicate-span marking (the shingle-window
  * form of exact-substring dedup from Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better") and int8 embedding
  * quantization with recall measurement against the full-precision
  * ranking — both staples of a 100 TB training-data pipeline.
  *
  * Everything here is declarative DataFrame algebra: the shingle pass
  * shuffles once on the shingle string (same scale shape as MinHash
  * banding — equality joins, no cross product), and the quantization
  * pass is per-row expression work followed by a broadcastable
  * small-side join for the query set.
  */
object TextOps3 {

  /** Duplicate-span marking: every `w`-word window (stride 1) whose
    * exact text occurs more than once in the corpus is a duplicated
    * span. Returns per-doc window counts, duplicated-window counts and
    * the number of word positions covered by at least one duplicated
    * window — the quantity a span-removal pass would delete.
    *
    * At scale: one shuffle keyed by the 60-bit md5 hash of the window
    * text — NOT the raw ~20-word string, which would carry ~20× the
    * corpus bytes through the exchange ("move hashes, not documents").
    * Skew-safe (a window repeated k times contributes k rows to one
    * group) and engine-portable (the oracle replays the same md5
    * fold); a 60-bit collision needs ~2³⁰ distinct windows per false
    * positive pair — negligible against > 1 true duplication. Then a
    * semi-join back. No driver state; suffix-array construction is
    * deliberately NOT used (it needs global order; the windowed form is
    * the standard distributed approximation).
    */
  def duplicateSpans(docs: DataFrame, w: Int = 20): DataFrame = {
    val words = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n", size(col("ws")))
    // one row per window position; short docs (< w words) emit none
    val wins = words
      .filter(col("n") >= w)
      .select(col("doc_id"), col("n"),
        posexplode(expr(s"transform(sequence(0, n - $w), i -> " +
          s"array_join(slice(ws, i + 1, $w), ' '))")))
      .select(col("doc_id"), col("pos"),
        TextOps.hexHash60(col("col")).as("sh"))
    val dup = wins.groupBy(col("sh"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") > 1)
      .select(col("sh"))
    val marked = wins.join(dup, "sh").select(col("doc_id"), col("pos"))
    val covered = marked
      .select(col("doc_id"),
        explode(expr(s"sequence(pos, pos + ${w - 1})")).as("i"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("i")).as("n_covered"))
    val nWin = wins.groupBy(col("doc_id")).agg(count(lit(1)).as("n_windows"))
    val nDup = marked.groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    nWin
      .join(nDup, Seq("doc_id"), "left")
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"))
  }

  /** Bloom-filter decontamination: 13-gram shingles of the benchmark
    * docs (doc_id < `benchDocs`) populate an `m`-bit Bloom filter with
    * `k` md5-derived hash rows; every candidate doc's distinct shingles
    * are tested against it. Returns per-doc distinct-gram counts,
    * Bloom-positive counts and exact-match counts — the one-sided
    * containment (flagged ⊇ true) is the sketch's contract, and the
    * oracle REPLAYS the exact bit addressing, so this is hash-gated
    * like the CMS row, not rows-only.
    *
    * At 100 TB the `bits` side is a few KB–MB of distinct positions —
    * broadcast to every executor (the join below is broadcastable);
    * the candidate side streams through without shuffling.
    */
  def bloomDecontam(docs: DataFrame, w: Int = 13, m: Int = 16384,
                    k: Int = 3, benchDocs: Int = 20): DataFrame = {
    val words = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n", size(col("ws")))
    val grams = words.filter(col("n") >= w)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(0, n - $w), i -> " +
          s"array_join(slice(ws, i + 1, $w), ' '))")).as("gram"))
      .distinct()
    val bench = grams.filter(col("doc_id") < benchDocs)
      .select(col("gram")).distinct()
    def bit(i: Int, g: Column): Column =
      pmod(TextOps.hexHash60(concat(lit(i.toString), g)), lit(m.toLong))
    val bits = bench
      .select(explode(array((0 until k).map(i => bit(i, col("gram"))): _*))
        .as("b")).distinct()
    val cand = grams.filter(col("doc_id") >= benchDocs)
    val pos = cand.select(col("doc_id"), col("gram"),
      explode(array((0 until k).map(i => bit(i, col("gram"))): _*)).as("b"))
    val flagged = pos.join(broadcast(bits), "b")
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("nbits"))
      .filter(col("nbits") === k)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_flagged"))
    val exact = cand.join(bench, "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_true"))
    cand.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      .join(flagged, Seq("doc_id"), "left")
      .join(exact, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        coalesce(col("n_true"), lit(0L)).as("n_true"))
  }

  /** Embeddings with the exact-integer scaling of [[BruteForceKnn]]
    * (round(x*1000) — float→double noise removed before any math). */
  private def scaled(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"),
      transform(col("embedding"), x => round(x.cast(DoubleType) * 1000)).as("v"))

  /** Per-vector symmetric int8 quantization: q_i = round(v_i * 127 /
    * max|v|). Cosine is invariant under per-vector positive scaling, so
    * the quantized ranking needs no dequantization — integer dot and
    * norms only (each exact in a double: |q|≤127, 64 dims).
    */
  def quantizeInt8(embs: DataFrame): DataFrame =
    scaled(embs)
      .withColumn("maxabs",
        greatest(array_max(transform(col("v"), x => abs(x))), lit(1.0)))
      .withColumn("q",
        transform(col("v"), x => round(x * lit(127.0) / col("maxabs"))))

  private def dot(a: Column, b: Column): Column =
    graft.plans.DotProduct.dot(a, b)

  private def topk(pairs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Top-k recall of the int8-quantized ranking against the
    * full-precision ranking, per query (vec_id < nQueries): both
    * rankings brute-force, ties broken by nid, cosines rounded to 1e-9
    * before ranking so the order is engine-independent. Output one row
    * per query: recall@k plus both top-1 ids — the quantization-error
    * telemetry a vector-store migration job reports.
    */
  def int8Recall(embs: DataFrame, nQueries: Int = 50, k: Int = 5): DataFrame = {
    val e = quantizeInt8(embs)
    val qs = broadcast(e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("q").as("qq")))
    val pairs = qs.join(e.withColumnRenamed("vec_id", "nid"),
        col("qid") =!= col("nid"))
      .withColumn("cos_full", round(
        dot(col("qv"), col("v")) /
          (sqrt(dot(col("qv"), col("qv"))) * sqrt(dot(col("v"), col("v")))), 9))
      .withColumn("cos_q", round(
        dot(col("qq"), col("q")) /
          (sqrt(dot(col("qq"), col("qq"))) * sqrt(dot(col("q"), col("q")))), 9))
      .select(col("qid"), col("nid"), col("cos_full"), col("cos_q"))
    val full = topk(pairs.withColumn("cos", col("cos_full")), k)
      .groupBy(col("qid"))
      .agg(collect_list(struct(col("rk"), col("nid"))).as("l"))
      .select(col("qid"),
        expr("transform(array_sort(l), s -> s.nid)").as("full_ids"))
    val quant = topk(pairs.withColumn("cos", col("cos_q")), k)
      .groupBy(col("qid"))
      .agg(collect_list(struct(col("rk"), col("nid"))).as("l"))
      .select(col("qid"),
        expr("transform(array_sort(l), s -> s.nid)").as("q_ids"))
    full.join(quant, "qid")
      .select(col("qid"),
        (size(array_intersect(col("full_ids"), col("q_ids"))).cast(DoubleType)
          / k).as("recall"),
        col("full_ids").getItem(0).as("top1_full"),
        col("q_ids").getItem(0).as("top1_q"))
  }

  /** Linear quality-classifier INFERENCE at corpus scale (the
    * fastText-style stage every pretraining pipeline runs): hashed
    * bag-of-words features × a broadcast weight vector, one codegen'd
    * pass, zero shuffles beyond the input spread. Weights here are the
    * closed-form dyadic family w(b) = ((31b+7) mod 97 − 48)/512 — a
    * stand-in with the same plan shape as a learned vector (a real
    * model would broadcast its array instead), chosen dyadic so every
    * per-document score is an EXACT sum in any summation order and the
    * DuckDB oracle reproduces it bit-for-bit. Tokens: lowercase
    * alphabetic runs; feature id = portable-md5₆₀(token) mod dim.
    * Returns (doc_id, source, n_toks, score, keep = score > 0). */
  def linearQualityScore(docs: DataFrame, dim: Int = 256): DataFrame = {
    // coalesce: a NULL text must score 0/keep=false like the oracle's
    // left-join path, not propagate null through size()/aggregate()
    val toks = filter(split(lower(coalesce(col("text"), lit(""))), "[^a-z]+"),
      t => length(t) > 0)
    def weight(t: Column): Column =
      (pmod(pmod(TextOps.hexHash60(t), lit(dim.toLong)) * 31 + 7, lit(97L)) - 48)
        .cast(DoubleType) / 512.0
    TextOps.spread(docs).select(col("doc_id"), col("source"),
        size(toks).as("n_toks"),
        aggregate(toks, lit(0.0), (acc, t) => acc + weight(t)).as("score"))
      .withColumn("keep", col("score") > 0.0)
  }

  /** Fuzzy benchmark decontamination: corpus documents whose n-gram
    * Jaccard similarity against ANY benchmark document reaches
    * τ = tauNum/tauDen — the document-level overlap filter (the
    * "remove training docs that look like eval" stage) complementing
    * [[TextOps.decontaminate]]'s per-shingle membership ratio. The
    * threshold test cross-multiplies (`tauDen·inter ≥ tauNum·union`) so
    * the keep/flag decision is exact integer arithmetic.
    *
    * Scale shape: the benchmark side (eval suites) is tiny relative to
    * the corpus — its shingle-hash set and its sizes BROADCAST, so the
    * corpus side is one explode+hash scan, a broadcast hash join, a
    * (corpus_doc, bench_doc) aggregation, and a shuffle join against
    * the corpus-side sizes (which are corpus-cardinality and must
    * never broadcast). No corpus self-join, no LSH needed: candidate
    * volume is bounded by the benchmark's shingle multiplicity, not
    * the corpus'.
    *
    * Returns flagged pairs (ida = corpus doc, idb = benchmark doc,
    * inter, jaccard round 6).
    */
  def fuzzyDecontam(docs: DataFrame, textCol: String, n: Int,
                    isBench: Column, tauNum: Long, tauDen: Long): DataFrame = {
    val flagged = docs.select(col("doc_id"), isBench.as("__b"))
    val sh = TextOps.shingles(docs, textCol, n)
      .select(col("doc_id"), TextOps.hexHash60(col("shingle")).as("h"))
      .join(flagged, "doc_id")
      .localCheckpoint(true) // sizes + both join sides read it
    val bench = sh.filter(col("__b"))
      .select(col("doc_id").as("idb"), col("h"))
    val inter = sh.filter(!col("__b"))
      .select(col("doc_id").as("ida"), col("h"))
      .join(broadcast(bench), "h")
      .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("inter"))
    // only the BENCHMARK-side sizes broadcast (benchmark-cardinality);
    // the corpus-side sizes join stays a shuffle join on ida — inter
    // is bounded by the benchmark's shingle multiplicity, but the
    // corpus sizes frame is corpus-cardinality and must never ship to
    // the driver
    val benchSizes = sh.filter(col("__b")).groupBy(col("doc_id").as("idb"))
      .agg(count(lit(1)).as("nb"))
    val corpusSizes = sh.filter(!col("__b")).groupBy(col("doc_id").as("ida"))
      .agg(count(lit(1)).as("na"))
    inter
      .join(corpusSizes, "ida")
      .join(broadcast(benchSizes), "idb")
      .filter(lit(tauDen) * col("inter") >=
        lit(tauNum) * (col("na") + col("nb") - col("inter")))
      .select(col("ida"), col("idb"), col("inter"),
        round(col("inter").cast(DoubleType) /
          (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
  }

  /** DSIR data selection (Xie et al. 2023, arXiv:2302.03169): rank raw
    * documents by their importance weight under hashed-n-gram bag
    * models of a target distribution vs the raw corpus, and keep the
    * top `k` — the standard "select pretraining data that looks like
    * the target domain" stage. Features are hashed unigram buckets
    * (`pmod(md5Hash60(word), buckets)` — the repo-wide portable hash,
    * so the DuckDB oracle replays addressing exactly); both bag models
    * are add-1-smoothed bucket unigram LMs, and the per-doc log
    * importance weight is Σ_b c_b·(ln p_tgt(b) − ln p_raw(b)).
    *
    * Determinism discipline (same as [[TextOps2.unigramLogLoss]]):
    * every ln is taken of an INTEGER (count+1 / total+B via ln-ratio
    * expansion) and quantized in-engine to the 2⁻²⁰ dyadic grid, so
    * the per-doc sum is a sum of exact dyadics times integer counts —
    * aggregation-order-independent and bit-reproducible across
    * engines (ln-argument boundary gap verified ≥ 2.4e-7·2⁻²⁰ for all
    * integer arguments ≤ 2e6, ~50× the cross-engine ulp noise).
    *
    * Scale shape: one explode+hash scan, per-doc bucket counts with
    * map-side combine, two `buckets`-row model aggregates broadcast
    * back, and a TakeOrdered top-k — no sort shuffle, no join wider
    * than the B-row log-ratio table. The target predicate is a column
    * over the same table (domain flag); a separate target corpus would
    * swap in a second scan, same shape.
    */
  def dsirSelect(docs: DataFrame, target: Column, buckets: Int,
                 k: Int): DataFrame = {
    val q = 1048576.0
    def lnq(c: Column) = floor(log(c.cast(DoubleType)) * q + lit(0.5)) / q
    val words = TextOps.spread(docs)
      .select(col("doc_id"), target.as("tgt"),
        explode(split(col("text"), " ")).as("word"))
      .select(col("doc_id"), col("tgt"),
        pmod(TextOps.hexHash60(col("word")), lit(buckets.toLong)).as("b"))
    // ONE corpus explode+hash scan: the per-doc aggregate is pinned
    // with localCheckpoint and both bag models derive from it (docs×B
    // rows, corpus-independent) — without the pin, the model branches
    // would re-run the scan and the md5 fold two more times
    val perDoc = words.groupBy(col("doc_id"), col("tgt"), col("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val model = perDoc.groupBy(col("b"))
      .agg(sum(col("c")).as("nr"),
        sum(when(col("tgt"), col("c")).otherwise(0L)).as("nt"))
    val tot = model.agg(sum(col("nr")).as("totr"), sum(col("nt")).as("tott"))
    val lr = model.crossJoin(broadcast(tot))
      .select(col("b"),
        (lnq(col("nt") + lit(1L)) - lnq(col("tott") + lit(buckets.toLong))
          - lnq(col("nr") + lit(1L))
          + lnq(col("totr") + lit(buckets.toLong))).as("lr"))
    perDoc.join(broadcast(lr), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("len"),
        round(sum(col("c") * col("lr")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Per-label embedding centroid/diversity report (the corpus-health
    * telemetry an embedding-dedup or mixture job emits): for each
    * label, n, the centroid norm² and the mean pairwise dot product
    * via the closed form (‖Σv‖² − Σ‖v‖²)/(n(n−1)) — NO pairwise join,
    * two aggregations total (one on (label, dim) for the vector sum,
    * one on label), both shuffling tiny aggregates. On [[scaled]]
    * exact-integer embeddings every sum is exact, so the report is
    * engine-reproducible without rounding. */
  def embeddingDiversity(embs: DataFrame): DataFrame = {
    val e = scaled(embs).join(embs.select(col("vec_id"), col("label")), "vec_id")
    val sumsq = e.groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(dot(col("v"), col("v"))).as("sum_sq"))
    val centroid = e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos")).agg(sum(col("x")).as("sx"))
      .groupBy(col("label")).agg(sum(col("sx") * col("sx")).as("centroid_sq"))
    sumsq.join(centroid, "label")
      .select(col("label"), col("n"), col("centroid_sq"), col("sum_sq"),
        // n == 1 has no pairs — explicit null (Spark would divide to
        // null, DuckDB to ±inf; pin the same answer on both sides)
        when(col("n") > 1, (col("centroid_sq") - col("sum_sq")) /
          (col("n") * (col("n") - 1)).cast(DoubleType)).as("mean_pair_dot"))
  }

  /** The at-rest near-dup index of an existing corpus: the MinHash-LSH
    * band keys plus the hashed distinct-shingle sets — exactly what a
    * deployment PERSISTS alongside the corpus so ingest batches never
    * rescan it ([[incrementalNearDup]] consumes it). */
  final case class NearDupIndex(bands: DataFrame, shingles: DataFrame)

  /** Build the [[NearDupIndex]] of an existing corpus (once, at corpus
    * build time; incremental maintenance = append the new batch's own
    * rows after dedup). */
  def buildNearDupIndex(existing: DataFrame, textCol: String,
      n: Int): NearDupIndex = {
    import TextOps.{bandKeys, hexHash60, minhashSignatures, shingles}
    NearDupIndex(
      bands = bandKeys(minhashSignatures(existing, textCol, n)),
      shingles = shingles(existing, textCol, n)
        .select(col("doc_id"), hexHash60(col("shingle")).as("h60")))
  }

  /** Incremental near-dup: check a NEW batch against the EXISTING
    * corpus's PRECOMPUTED index — the pipeline's steady state, where
    * only the batch is shingled/hashed and the corpus side is read
    * from the at-rest index, so the incremental cost is ∝ batch x
    * selectivity, never corpus² (the batch-vs-index framing of
    * MinHashLSH dedup — Broder '97 resemblance sketches; Lee et al.
    * 2022 §4.1 NearDup — applied asymmetrically). Candidates =
    * band-key equality join of the batch's band keys against the
    * index; verification = EXACT n-gram Jaccard on candidate docs only
    * (both shingle sets semi-joined down to candidates first, so the
    * hot-shingle self-join hazard never arises), thresholded by the
    * exact cross-multiplied test tauDen·inter >= tauNum·union.
    *
    * Returns (ida = new doc, idb = existing doc, inter, jaccard) for
    * verified collisions — the batch rows to drop or link.
    */
  def incrementalNearDup(batch: DataFrame, index: NearDupIndex,
      textCol: String, n: Int, tauNum: Long, tauDen: Long): DataFrame = {
    import TextOps.{bandKeys, hexHash60, minhashSignatures, shingles}
    val newK = bandKeys(minhashSignatures(batch, textCol, n))
      .select(col("doc_id").as("ida"), col("bi"), col("bk"))
    val oldK = index.bands
      .select(col("doc_id").as("idb"), col("bi"), col("bk"))
    // `cand` is referenced 3x below (two semi-joins + the inter gate)
    // and `shA`/`shB` twice each (inter + size aggregates); without a
    // lineage cut every reference re-expands the FULL two-sided
    // minhash/shingling subtree — the t44 plan scanned documents 28
    // times in a 915-line physical plan whose one-time planning +
    // codegen cost dominated fresh-JVM runs (53.9 s first run vs
    // 4.3 s repeat, r13). Lazy persists truncate each re-reference at
    // an InMemoryRelation (eager localCheckpoints were tried and
    // regressed the steady-state twin 3.5→9.8 s: three serialized
    // materialization jobs cost more than they saved). All three
    // frames are candidate-bounded — `cand` is the pair list, shA/shB
    // hold only candidate docs' shingle sets (∝ selectivity, never
    // corpus-sized) — so the cache is small at any SF.
    val cand = newK.join(oldK, Seq("bi", "bk"))
      .select(col("ida"), col("idb")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact verify on the candidate docs only
    val hashedNew = shingles(batch, textCol, n)
      .select(col("doc_id"), hexHash60(col("shingle")).as("h60"))
    val shA = hashedNew.join(
      cand.select(col("ida").as("doc_id")), Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shB = index.shingles.join(
      cand.select(col("idb").as("doc_id")), Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val inter = shA.select(col("doc_id").as("ida"), col("h60"))
      .join(shB.select(col("doc_id").as("idb"), col("h60")), Seq("h60"))
      .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("inter"))
      .join(cand, Seq("ida", "idb"), "left_semi")
    // sizes from the already candidate-restricted shingle frames (shA/
    // shB carry each candidate doc's FULL distinct-shingle set) — a
    // full-corpus size aggregate would defeat the candidate pruning
    val szA = shA.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val szB = shB.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    inter
      .join(szA.select(col("doc_id").as("ida"), col("nsh").as("sa")), "ida")
      .join(szB.select(col("doc_id").as("idb"), col("nsh").as("sb")), "idb")
      .filter(lit(tauDen) * col("inter") >=
        lit(tauNum) * (col("sa") + col("sb") - col("inter")))
      .select(col("ida"), col("idb"), col("inter"),
        round(col("inter").cast(DoubleType) /
          (col("sa") + col("sb") - col("inter")), 6).as("jaccard"))
  }
}
