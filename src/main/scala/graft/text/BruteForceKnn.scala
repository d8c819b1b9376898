package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense brute-force cosine kernels over embedding columns.
  *
  * This is the deliberate `mapPartitions` case (SURVEY §4.2 preference
  * (d)): a dense numeric inner loop over primitive arrays. The
  * expression forms lose badly here — array higher-order functions
  * leave whole-stage codegen, and a 64-term expanded expression blows
  * past JIT inlining limits (measured 3× slower than the HOF form).
  * The query side (small, sampled) is broadcast as primitive arrays;
  * each partition of the big side streams through a tight dot-product
  * loop. Results are exact scaled-integer sums — bit-identical to the
  * declarative forms and the DuckDB oracle at any loop order.
  */
object BruteForceKnn {

  private def scaledRows(embs: DataFrame, idCol: String): DataFrame =
    embs.select(col(idCol).as("id"),
      transform(col("embedding"), x => round(x.cast(DoubleType) * 1000)).as("v"))

  private def toArr(r: Row): (Long, Array[Double], Double) = {
    val v = r.getSeq[Double](1).toArray
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    (r.getLong(0), v, math.sqrt(n))
  }

  /** All (query, candidate, cosine) pairs of querySide × embs with
    * cos > minCos; querySide must be small (collected + broadcast). */
  def cosinePairs(embs: DataFrame, queryFilter: org.apache.spark.sql.Column,
                  minCos: Double, excludeSelf: Boolean = true): DataFrame = {
    val spark = embs.sparkSession
    val qs = scaledRows(embs, "vec_id").filter(queryFilter).collect().map(toArr)
    val bq = spark.sparkContext.broadcast(qs)
    val outSchema = StructType(Seq(
      StructField("qid", LongType, nullable = false),
      StructField("nid", LongType, nullable = false),
      StructField("cos", DoubleType, nullable = false)))
    val rows = scaledRows(embs, "vec_id").rdd.mapPartitions { it =>
      val queries = bq.value
      it.flatMap { r =>
        val (nid, v, nn) = toArr(r)
        queries.iterator.flatMap { case (qid, q, qn) =>
          if (excludeSelf && qid == nid) None
          else {
            var dot = 0.0
            var i = 0
            while (i < v.length) { dot += q(i) * v(i); i += 1 }
            val cos = dot / (qn * nn)
            if (cos > minCos) Some(Row(qid, nid, cos)) else None
          }
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
