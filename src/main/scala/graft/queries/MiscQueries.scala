package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Gts
import graft.multimodal.MultimodalOps
import graft.operators.MetaOps

/** FIND / DELETE metadata surface + multimodal feature extraction. */
object MiscQueries {
  import GtsQueries.{EV, T0, T7}

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // FIND — selector search over the series-metadata table
    // (EgressFindHandler; fn/FIND.java)
    "m01_find" -> ((s, dir) => {
      val meta = Gts.metaTable(Gts.fromEvents(s, dir))
      MetaOps.find(meta, "~events\\.(click|error){user~1.*}")
        .select(col("class"), col("labels").getItem("user").as("userid"),
          col("lastactivity"), col("npoints"))
    }),

    // DELETE — remove a selector+range slice, report what remains
    // (StandaloneDeleteHandler; fn/DELETE.java)
    "m02_delete_retained" -> ((s, dir) => {
      val pts = Gts.fromEvents(s, dir)
      val meta = Gts.metaTable(pts)
      MetaOps.deleteBySelector(pts, meta, "events.click{}", T0, T7 - 1)
        .groupBy(col("class"), col("labels").getItem("user").as("userid"))
        .agg(count(lit(1)).as("npoints"))
    }),

    // multimodal: binary media column → partition-batched (stub) decode
    "m03_multimodal_features" -> ((s, dir) => {
      val media = MultimodalOps.mediaFromDocuments(
        s.read.parquet(s"$dir/documents.parquet"))
      MultimodalOps.extractFeatures(media)
    }),

    // multimodal REAL codec roundtrip: synthesize genuine PNG payloads
    // (geometry a function of doc_id), decode via javax.imageio; the
    // oracle predicts the geometry from doc_id arithmetic, so a match
    // proves real bytes went through a real decoder
    "m04_image_decode" -> ((s, dir) => {
      val media = MultimodalOps.pngMediaFromDocuments(
        s.read.parquet(s"$dir/documents.parquet"))
      MultimodalOps.extractImageFeatures(media)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "m01_find" ->
      s"""WITH g AS ($EV)
         |SELECT class, userid, max(ts) AS lastactivity, count(*) AS npoints
         |FROM g
         |WHERE regexp_full_match(class, 'events\\.(click|error)')
         |  AND regexp_full_match(userid, '1.*')
         |GROUP BY 1, 2""".stripMargin,

    "m02_delete_retained" ->
      s"""WITH g AS ($EV)
         |SELECT class, userid, count(*) AS npoints FROM g
         |WHERE NOT (class = 'events.click' AND ts >= $T0 AND ts <= ${T7 - 1})
         |GROUP BY 1, 2""".stripMargin,

    "m03_multimodal_features" ->
      """WITH h AS (SELECT doc_id AS media_id,
        |    ('0x' || substring(md5(text),1,15))::BIGINT AS h60,
        |    length(text) AS n FROM documents)
        |SELECT media_id, CAST(h60 % 640 AS INT) AS width,
        |  CAST((h60 // 640) % 480 AS INT) AS height,
        |  CAST(1 + (h60 % 3) AS INT) AS channels,
        |  CAST(n AS BIGINT) AS n_bytes
        |FROM h""".stripMargin,

    "m04_image_decode" ->
      """SELECT doc_id AS media_id,
        |  CAST(16 + doc_id % 32 AS INT) AS width,
        |  CAST(16 + (7 * doc_id) % 32 AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  true AS decoded
        |FROM documents""".stripMargin
  )
}
