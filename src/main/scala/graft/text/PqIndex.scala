package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (PQ) for embedding ANN — the codes-not-vectors
  * scale path alongside [[EmbeddingLSH]] (hyperplane buckets) and
  * [[IvfIndex]] (coarse cells): split each D-dim vector into M
  * subvectors, k-means a K-codeword codebook PER subspace, store each
  * vector as its M nearest-codeword ids (M·log2 K bits instead of
  * D·64 — here 8 codes of 4 bits vs 64 doubles, a 128x footprint
  * drop), and answer queries with asymmetric distance computation
  * (ADC): one tiny (M·K)-entry distance table per query, candidate
  * score = Σ_s table[s, code_s] — M table adds instead of D multiply-
  * adds per candidate (Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", IEEE TPAMI 2011).
  *
  * At 100 TB the codebooks are M·K tiny rows (broadcast), encoding is
  * a narrow per-vector pass, and query scoring joins the code table
  * against a broadcast per-query distance table — the corpus-side
  * shuffle carries CODES, never raw vectors.
  *
  * DETERMINISM (the IvfIndex contract): subvectors are scaled ints,
  * codewords quantize to the dyadic 1/1024 grid after every mean step,
  * so every distance is an exact dyadic rational and the ADC sums are
  * order-independent — training, codes and rankings replay bit-for-bit
  * in the DuckDB oracle.
  */
object PqIndex {

  val M = 8
  val SubDim: Int = EmbeddingLSH.Dims / M // 8
  val K = 16
  val Iters = 2
  val Quant = 1024.0

  private def dot(a: Column, b: Column): Column =
    graft.plans.DotProduct.dot(a, b)

  /** (vec_id, sid, sv): the M scaled-int subvectors of every vector. */
  def subvecs(embs: DataFrame): DataFrame =
    IvfIndex.vecs(embs)
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(M - 1))).as("sid"), col("v"))
      .select(col("vec_id"), col("sid"),
        slice(col("v"), col("sid") * lit(SubDim) + lit(1), lit(SubDim)).as("sv"))

  /** Nearest codeword per (vector, subspace). A hash-aggregation
    * `min(struct(dist, cid))` instead of a row_number window: the
    * window route sorts the K-expanded join output inside each
    * partition, the agg route partial-aggregates it map-side back to
    * one row per (vec_id, sid) before any exchange — and struct
    * ordering is lexicographic, so the cid-ascending tie-break is
    * preserved exactly (distances are exact dyadic rationals). */
  private def assign(sv: DataFrame, books: DataFrame): DataFrame = {
    val dist = lit(-2.0) * dot(col("sv"), col("c")) + dot(col("c"), col("c"))
    sv.join(broadcast(books), "sid")
      .groupBy(col("vec_id"), col("sid"))
      .agg(first(col("sv")).as("sv"),
        min(struct(dist.as("d"), col("cid").as("cid"))).as("__best"))
      .select(col("vec_id"), col("sid"), col("sv"),
        col("__best.cid").as("cid"))
  }

  /** Dyadic-quantized mean step per (subspace, codeword). */
  private def means(assigned: DataFrame): DataFrame =
    assigned.select(col("sid"), col("cid"),
        posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy(col("sid"), col("cid"), col("pos"))
      .agg((floor(avg(col("x")) * Quant + 0.5) / Quant).as("m"))
      .groupBy(col("sid"), col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("c"))

  /** Per-subspace Lloyd's; init = the K smallest vec_ids' subvectors. */
  def codebooks(sv: DataFrame): DataFrame = {
    var books = sv.filter(col("vec_id") < K)
      .select(col("sid"), col("vec_id").cast(IntegerType).as("cid"),
        col("sv").as("c"))
    for (_ <- 1 to Iters)
      books = means(assign(sv, books)).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    books
  }

  /** PQ codes: (vec_id, sid, cid). */
  def encode(sv: DataFrame, books: DataFrame): DataFrame =
    assign(sv, books).select(col("vec_id"), col("sid"), col("cid"))

  /** ADC top-k: per-query (M·K)-entry distance table, candidate score
    * = Σ over subspaces of table[sid, code] — the corpus side touches
    * only its codes. Returns (qid, cand_id, rk, score). */
  def adcTopK(embs: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val sv = subvecs(embs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val books = codebooks(sv)
    val codes = encode(sv, books)
    val q = sv.filter(queryPred)
      .select(col("vec_id").as("qid"), col("sid"), col("sv").as("qsv"))
    // exact L2² of the query subvector against every codeword
    val d = dot(col("qsv"), col("qsv")) -
      lit(2.0) * dot(col("qsv"), col("c")) + dot(col("c"), col("c"))
    val dtable = q.join(broadcast(books), "sid")
      .select(col("qid"), col("sid"), col("cid"), d.as("d"))
    val scores = codes.join(broadcast(dtable), Seq("sid", "cid"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("d")).as("score"))
    scores.withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("score").asc, col("vec_id").asc)))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vec_id").as("cand_id"),
        col("rk").cast(IntegerType).as("rk"), col("score"))
  }

  /** ADC-shortlist → exact re-rank (the IVFADC refinement of the same
    * paper, §VII): the lossy ADC ranking prunes the corpus to a
    * `shortlist` per query, full vectors re-rank only those — the
    * production PQ serving shape (codes prune at corpus scale, exact
    * distances touch `shortlist` rows per query). */
  def refinedTopK(embs: DataFrame, queryPred: Column, shortlist: Int,
                  k: Int): DataFrame = {
    val vs = IvfIndex.vecs(embs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = adcTopK(embs, queryPred, shortlist)
      .select(col("qid"), col("cand_id"))
    val q = vs.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val refined = cand
      .join(vs.select(col("vec_id").as("cand_id"), col("v").as("cv")), "cand_id")
      .join(q, "qid")
    val cdist = dot(col("qv"), col("qv")) -
      lit(2.0) * dot(col("qv"), col("cv")) + dot(col("cv"), col("cv"))
    refined
      .withColumn("dist", cdist)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("cand_id").asc)))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cand_id"),
        col("rk").cast(IntegerType).as("rk"), col("dist"))
  }

  /** recall@k of the refined pipeline (ADC shortlist → exact re-rank)
    * vs the exact L2 top-k — the PQ-quality report of the i02 pattern;
    * both sides deterministic. Pure-ADC recall on these SYNTHETIC
    * near-uniform vectors is ~0.2 (quantization error dominates when
    * nothing clusters — the adversarial case for PQ); the shortlist
    * refinement is what the serving path uses. */
  def recallVsExact(embs: DataFrame, queryPred: Column, shortlist: Int,
                    k: Int): DataFrame = {
    val vs = IvfIndex.vecs(embs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = vs.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val cdist = dot(col("qv"), col("qv")) -
      lit(2.0) * dot(col("qv"), col("cv")) + dot(col("cv"), col("cv"))
    val exact = q.crossJoin(vs.select(col("vec_id"), col("v").as("cv")))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(cdist.asc, col("vec_id").asc)))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vec_id").as("cand_id"))
    val approx = refinedTopK(embs, queryPred, shortlist, k)
      .select(col("qid"), col("cand_id"))
    val m = exact.join(approx, Seq("qid", "cand_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_match"))
    q.select(col("qid")).distinct().join(m, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_match"), lit(0L)).as("n_match"),
        round(coalesce(col("n_match"), lit(0L)) / lit(k.toDouble), 6)
          .as("recall"))
  }
}
