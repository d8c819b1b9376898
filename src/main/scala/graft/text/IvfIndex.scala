package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF (inverted-file) approximate nearest neighbors — the k-means
  * alternative to [[EmbeddingLSH]]'s hyperplane buckets: Lloyd's
  * iterations train centroid cells, vectors assign to their nearest
  * cell, queries probe the `probes` nearest cells and exact-rank only
  * those cells' members. At corpus scale the train/assign stages are
  * plain broadcast joins + shuffles on (cid, pos); the probe stage
  * touches N·probes/K of the corpus instead of all of it.
  *
  * DETERMINISM: centroids quantize to the dyadic 1/1024 grid after
  * every mean step, so every dot product and distance thereafter is
  * exactly representable — training is reproducible under any
  * partitioning/AQE plan (no floating-point drift between executors),
  * and the whole index is oracle-verifiable bit-for-bit. Init is the
  * K smallest vec_ids (deterministic, like the reference's seeded
  * samplers). Empty cells drop out of the mean step identically in
  * both engines.
  */
object IvfIndex {

  val K = 8
  val Iters = 2
  val Dims: Int = EmbeddingLSH.Dims
  val Quant = 1024.0

  private def dot(a: Column, b: Column): Column =
    graft.plans.DotProduct.dot(a, b)

  def vecs(embs: DataFrame): DataFrame =
    TextOps.spreadBy(embs, "vec_id")
      .select(col("vec_id"), EmbeddingLSH.scaled(col("embedding")).as("v"))

  /** Nearest-centroid assignment; ties break on cid (total order).
    * `min(struct(dist, cid))` hash-aggregation rather than a ranking
    * window: partial aggregation collapses the K-expanded crossJoin
    * back to one row per vector map-side, before any exchange — and
    * lexicographic struct ordering preserves the cid tie-break exactly
    * (distances are exact dyadic rationals). */
  def assign(vs: DataFrame, cents: DataFrame): DataFrame = {
    val dist = lit(-2.0) * dot(col("v"), col("c")) + dot(col("c"), col("c"))
    vs.crossJoin(broadcast(cents))
      .groupBy(col("vec_id"))
      .agg(first(col("v")).as("v"),
        min(struct(dist.as("d"), col("cid").as("cid"))).as("__best"))
      .select(col("vec_id"), col("v"), col("__best.cid").as("cid"))
  }

  /** Mean step with dyadic quantization: per-dimension averages via
    * posexplode → (cid, pos) shuffle → re-assembled in pos order. */
  def means(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg((floor(avg(col("x")) * Quant + 0.5) / Quant).as("m"))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("c"))

  def centroids(embs: DataFrame): DataFrame =
    centroidsFrom(vecs(embs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Lloyd's over an ALREADY-materialized vector frame: each iteration's
    * centroids chain the full training lineage, and the final centroids
    * are consumed by both the assign and probe stages — eager
    * checkpoints (K-row frames) keep any of that from re-running. */
  private def centroidsFrom(vs: DataFrame, k: Int = K): DataFrame = {
    var cents = vs.filter(col("vec_id") < k)
      .select(col("vec_id").cast(IntegerType).as("cid"), col("v").as("c"))
    for (_ <- 1 to Iters) cents = means(assign(vs, cents)).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cents
  }

  /** Probe-and-rank: `probes` nearest cells per query, exact L2²
    * ranking of those cells' members only. Ranking windows partition
    * by query id — bounded by cell population, never global. */
  def topK(embs: DataFrame, queryPred: Column, probes: Int, k: Int): DataFrame = {
    val vs = vecs(embs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = centroidsFrom(vs)
    val assigned = assign(vs, cents).select(col("vec_id"), col("cid"))
    val queries = vs.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val pdist = lit(-2.0) * dot(col("qv"), col("c")) + dot(col("c"), col("c"))
    val probed = queries.crossJoin(broadcast(cents))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(pdist.asc, col("cid").asc)))
      .filter(col("__rn") <= probes)
      .select(col("qid"), col("qv"), col("cid"))
    val cand = probed.join(assigned, "cid")
      .filter(col("vec_id") =!= col("qid"))
      .join(vs.select(col("vec_id"), col("v").as("cv")), "vec_id")
    val cdist = dot(col("qv"), col("qv")) - lit(2.0) * dot(col("qv"), col("cv")) +
      dot(col("cv"), col("cv"))
    cand.withColumn("dist", cdist)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("vec_id").asc))
        .cast(IntegerType))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vec_id").as("cand_id"), col("rk"), col("dist"))
  }

  /** Recall@k report: how much of the exact L2 top-k the probe path
    * recovers, per query. The exact side is a query-bounded brute
    * force (|Q|·N dot products — the measurement tool, not the serving
    * path); distances share [[topK]]'s qq − 2qc + cc tree on exact
    * scaled ints, so both rankings and the report are deterministic.
    * Returns (qid, n_match, recall). */
  def recallVsExact(embs: DataFrame, queryPred: Column, probes: Int,
                    k: Int): DataFrame = {
    val vs = vecs(embs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
    val approx = topK(embs, queryPred, probes, k)
      .select(col("qid"), col("cand_id"))
    val m = exact.join(approx, Seq("qid", "cand_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_match"))
    q.select(col("qid")).join(m, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_match"), lit(0L)).as("n_match"),
        round(coalesce(col("n_match"), lit(0L)) / lit(k.toDouble), 6)
          .as("recall"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-level
    * near-duplicate pruning scoped to k-means cells. Members of each
    * IVF cell are ordered by distance-to-own-centroid DESC (the paper
    * keeps each duplicate group's farthest-from-centroid "edge"
    * example and drops the prototypical ones; vec_id breaks ties),
    * and a member is dropped when a higher-priority cellmate sits
    * above the cosine threshold τ. τ is passed as the exact rational
    * τ² = tauSqNum/tauSqDen and the predicate cross-multiplies —
    * `tauSqDen·dot² > tauSqNum·‖x‖²‖y‖²` on int64s over the scaled
    * integer vectors — so the whole drop decision is exact integer
    * arithmetic (no float-threshold drift between engines; with
    * ‖v‖² ≤ ~1e6 on the 1000-scaled vectors the products stay ≤ ~1e15,
    * well inside int64).
    *
    * Scale shape: the |cell|² pair join is the paper's own — at corpus
    * scale K grows with N so cells stay ~constant-sized, the join
    * shuffles on cid only, and the greedy per-pair rule needs no
    * transitive closure. `k` IS that knob: the default matches the
    * oracle-pinned t39 configuration; a 100×-corpus probe with the
    * default k=8 left 25k-member cells whose pair join blew past the
    * shard budget, while k=800 (N/250) restored near-linear wall —
    * measured in SCALE.md, which is why the paper's K ∝ N prescription
    * is exposed as a parameter rather than prose. Returns the DROPPED
    * (vec_id, cid) rows.
    */
  def semDeDup(embs: DataFrame, tauSqNum: Long, tauSqDen: Long,
               k: Int = K): DataFrame = {
    val vs = vecs(embs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = centroidsFrom(vs, k)
    val m = assign(vs, cents).join(broadcast(cents), "cid")
      .select(col("vec_id"), col("cid"), col("v"),
        dot(col("v"), col("v")).cast(LongType).as("vv"),
        (dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), col("c"))
          + dot(col("c"), col("c"))).as("cdist"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // both sides of the pair join read it
    val x = m.alias("x")
    val y = m.select(col("cid").as("ycid"), col("vec_id").as("yid"),
      col("v").as("yv"), col("vv").as("yvv"), col("cdist").as("ycdist"))
    val pd = dot(col("v"), col("yv")).cast(LongType)
    x.join(y,
        col("cid") === col("ycid") &&
          (col("ycdist") > col("cdist") ||
            (col("ycdist") === col("cdist") && col("yid") < col("vec_id"))) &&
          pd > lit(0L) &&
          lit(tauSqDen) * pd * pd > lit(tauSqNum) * col("vv") * col("yvv"),
        "leftsemi")
      .select(col("vec_id"), col("cid"))
  }
}
