package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LSH-bucketed approximate nearest neighbors over an embedding column —
  * the SCALE path for similarity search (brute-force cosine is the
  * oracle baseline, TextQueries t06): random-hyperplane signatures
  * (Charikar 2002 SimHash for cosine), bucket join, exact re-rank of
  * candidates only.
  *
  * Hyperplanes are deterministic ±1 matrices derived from an affine
  * hash (engine-portable, so DuckDB can replicate bit-for-bit). At
  * 100 TB the pairwise stage touches only bucket-colliding pairs —
  * the blowup of all-pairs cosine never happens.
  */
object EmbeddingLSH {

  val Bits = 12
  val Dims = 64

  /** Deterministic ±1 hyperplane weights. */
  def weight(bit: Int, dim: Int): Int = {
    val h = (2654435761L * (bit * Dims + dim + 1) + 40503L) % 2147483647L
    if (h % 2 == 0) 1 else -1
  }

  /** Signature bucket id: bit j = sign of v · hyperplane_j. Input is
    * the scaled-integer embedding array (see TextQueries). Delegates to
    * [[bucketColAt]], whose native dot keeps the plan small (the
    * unrolled Bits·Dims scalar expression's codegen cost grows
    * superlinearly with plane count). */
  def bucketCol(v: Column): Column = bucketColAt(v, 0, Bits)

  /** Scaled exact-integer embedding (bit-reproducible sums). */
  def scaled(embedding: Column): Column =
    transform(embedding, x => round(x.cast(DoubleType) * 1000))

  /** Per-vector LSH bucket assignment. The signature is CPU-heavy per
    * row (Bits·Dims multiply-adds), so spread the (possibly single-
    * split) input across cores first. */
  def buckets(embs: DataFrame): DataFrame =
    TextOps.spreadBy(embs, "vec_id")
      .select(col("vec_id"), scaled(col("embedding")).as("v"))
      .withColumn("bucket", bucketCol(col("v")))

  /** ANN candidate pairs: same bucket → exact cosine re-rank. The join
    * key is a 12-bit integer — tiny shuffle, no all-pairs stage. */
  def annPairs(embs: DataFrame, minCos: Double): DataFrame = {
    // both self-join sides consume the signature frame; eager
    // checkpoint computes the Bits·Dims signature arithmetic once
    // (AQE runs the consumer stages concurrently — lazy caching races)
    val b = buckets(embs)
      .withColumn("nrm",
        sqrt(graft.plans.DotProduct.dot(col("v"), col("v"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = b.select(col("vec_id").as("ida"), col("bucket"),
      col("v").as("va"), col("nrm").as("na"))
    val r = b.select(col("vec_id").as("idb"), col("bucket"),
      col("v").as("vb"), col("nrm").as("nb"))
    val dot = graft.plans.DotProduct.dot(col("va"), col("vb"))
    l.join(r, Seq("bucket")).filter(col("ida") < col("idb"))
      .withColumn("cos", dot / (col("na") * col("nb")))
      .filter(col("cos") > minCos)
      .select(col("ida"), col("idb"), col("cos"))
  }

  // ---------------------------------------------------------------------
  // Scale-parameterized multi-band variant (OR-amplification)
  // ---------------------------------------------------------------------

  /** Signature over `bits` hyperplanes starting at global plane index
    * `planeOffset` — bands draw disjoint plane ranges so their
    * signatures are independent. Each plane's dot product runs the
    * native codegen'd [[graft.plans.DotProduct]] against a weight-array
    * literal rather than unrolling Dims·bits scalar terms — the
    * unrolled form's codegen cost grows superlinearly with plane count
    * (measured 18s vs 3s at 32 planes when this was an aggregate/
    * zip_with fold; the native loop keeps the same small plan shape and
    * the same left-to-right summation, so values are unchanged). */
  def bucketColAt(v: Column, planeOffset: Int, bits: Int): Column =
    (0 until bits).map { j =>
      val w = array((0 until Dims).map(d =>
        lit(weight(planeOffset + j, d).toDouble)): _*)
      val dot = graft.plans.DotProduct.dot(v, w)
      when(dot > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)

  /** One row per (vector, band): the vector's bucket in each of `bands`
    * independent `bits`-bit signatures. */
  def multiBuckets(embs: DataFrame, bands: Int, bits: Int): DataFrame = {
    val bb = array((0 until bands).map(b =>
      struct(lit(b).as("band"), bucketColAt(col("v"), b * bits, bits).as("bucket"))): _*)
    TextOps.spreadBy(embs, "vec_id")
      .select(col("vec_id"), scaled(col("embedding")).as("v"))
      .select(col("vec_id"), explode(bb).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Multi-band ANN: candidates collide in ANY band (OR-amplification —
    * recall ≈ 1−(1−p^bits)^bands per Charikar/LSH theory), deduped on
    * (ida, idb), then gathered against the vector table for the exact
    * cosine verify. Expected candidate volume for near-orthogonal noise
    * is bands·N²/2^(bits+1): size `bits ≈ 2·log₂N` to keep the verify
    * stage ~O(bands·N), and raise `bands` for recall. The three joins
    * are all equality-key shuffles — nothing quadratic at any N.
    */
  def annPairsMulti(embs: DataFrame, minCos: Double,
                    bands: Int, bits: Int): DataFrame = {
    // self-joined twice — materialize the bands·bits signature work once
    val k = multiBuckets(embs, bands, bits).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = k.select(col("vec_id").as("ida"), col("band"), col("bucket"))
      .join(k.select(col("vec_id").as("idb"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb")).distinct()
    val vecs = embs.select(col("vec_id"), scaled(col("embedding")).as("v"))
      .withColumn("nrm",
        sqrt(graft.plans.DotProduct.dot(col("v"), col("v"))))
    val dot = graft.plans.DotProduct.dot(col("va"), col("vb"))
    cand
      .join(vecs.select(col("vec_id").as("ida"), col("v").as("va"), col("nrm").as("na")), "ida")
      .join(vecs.select(col("vec_id").as("idb"), col("v").as("vb"), col("nrm").as("nb")), "idb")
      .withColumn("cos", dot / (col("na") * col("nb")))
      .filter(col("cos") > minCos)
      .select(col("ida"), col("idb"), col("cos"))
  }
}
