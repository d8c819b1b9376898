package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.EmbeddingLSH
import graft.text.EmbeddingLSH.{Bits, Dims, weight}

/** LSH-bucketed ANN queries — scale path of similarity search, fully
  * oracle-verified via portable deterministic hyperplanes. */
object AnnQueries {

  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a01_lsh_buckets" -> ((s, dir) =>
      EmbeddingLSH.buckets(embs(s, dir)).select(col("vec_id"), col("bucket"))),

    "a02_lsh_ann_pairs" -> ((s, dir) =>
      EmbeddingLSH.annPairs(embs(s, dir), 0.0)
        .select(col("ida"), col("idb"), round(col("cos"), 9).as("cos_sim"))),

    // multi-band OR-amplification (4 independent 8-bit signatures):
    // candidate → dedup → gather → exact-cosine verify; bits scale with
    // corpus (≈2·log₂N), bands buy recall
    "a03_lsh_multiband" -> ((s, dir) =>
      EmbeddingLSH.annPairsMulti(embs(s, dir), 0.0, MbBands, MbBits)
        .select(col("ida"), col("idb"), round(col("cos"), 9).as("cos_sim")))
  )

  val MbBands = 4
  val MbBits = 8

  /** 12 hyperplanes as DuckDB double-list literals. */
  private def planeList(j: Int): String =
    (0 until Dims).map(d => s"${weight(j, d)}.0").mkString("[", ", ", "]")

  private val bucketExpr: String = (0 until Bits).map { j =>
    s"(CASE WHEN list_dot_product(v, ${planeList(j)}) > 0 THEN ${1L << j} ELSE 0 END)"
  }.mkString(" + ")

  /** Band `b`'s bucket over planes [b·MbBits, (b+1)·MbBits). */
  private def bandBucketExpr(b: Int): String = (0 until MbBits).map { j =>
    s"(CASE WHEN list_dot_product(v, ${planeList(b * MbBits + j)}) > 0 THEN ${1L << j} ELSE 0 END)"
  }.mkString(" + ")

  val oracleSql: Map[String, String] = Map(
    "a01_lsh_buckets" ->
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
         |  FROM embeddings)
         |SELECT vec_id, CAST($bucketExpr AS BIGINT) AS bucket FROM e""".stripMargin,

    "a02_lsh_ann_pairs" ->
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
         |  FROM embeddings),
         |b AS (SELECT vec_id, v,
         |    CAST($bucketExpr AS BIGINT) AS bucket,
         |    sqrt(list_dot_product(v, v)) AS nrm FROM e)
         |SELECT a.vec_id AS ida, b2.vec_id AS idb,
         |  round(list_dot_product(a.v, b2.v) / (a.nrm * b2.nrm), 9) AS cos_sim
         |FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
         |WHERE list_dot_product(a.v, b2.v) / (a.nrm * b2.nrm) > 0.0""".stripMargin,

    "a03_lsh_multiband" -> {
      val bandCols = (0 until MbBands)
        .map(b => s"CAST(${bandBucketExpr(b)} AS BIGINT) AS bucket$b").mkString(", ")
      val unions = (0 until MbBands)
        .map(b => s"SELECT vec_id, $b AS band, bucket$b AS bucket FROM b")
        .mkString(" UNION ALL ")
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
         |  FROM embeddings),
         |b AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, $bandCols FROM e),
         |k AS ($unions),
         |c AS (SELECT DISTINCT a.vec_id AS ida, b2.vec_id AS idb
         |      FROM k a JOIN k b2 ON a.band = b2.band AND a.bucket = b2.bucket
         |        AND a.vec_id < b2.vec_id)
         |SELECT c.ida, c.idb,
         |  round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 9) AS cos_sim
         |FROM c JOIN b x ON c.ida = x.vec_id JOIN b y ON c.idb = y.vec_id
         |WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) > 0.0""".stripMargin
    }
  )
}
