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
        .select(col("ida"), col("idb"), round(col("cos"), 9).as("cos_sim")))
  )

  /** 12 hyperplanes as DuckDB double-list literals. */
  private def planeList(j: Int): String =
    (0 until Dims).map(d => s"${weight(j, d)}.0").mkString("[", ", ", "]")

  private val bucketExpr: String = (0 until Bits).map { j =>
    s"(CASE WHEN list_dot_product(v, ${planeList(j)}) > 0 THEN ${1L << j} ELSE 0 END)"
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
         |WHERE list_dot_product(a.v, b2.v) / (a.nrm * b2.nrm) > 0.0""".stripMargin
  )
}
