package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Gts
import graft.operators.SkewOps

/** Tenth pack: skew-salted aggregation equivalence, string encodings
  * (TOB64/TOHEX/STRINGFORMAT), ISO8601 rendering. */
object GtsQueries10 {
  import GtsQueries.EV

  private val userid = col("labels").getItem("user").as("userid")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // salted two-stage aggregation (SkewOps — the 100 TB hot-key path)
    // must be VALUE-IDENTICAL to the plain one-stage aggregate: the
    // oracle is the plain GROUP BY, so a hash match proves salting is
    // semantically free (exact cents make partials order-independent)
    "g100_salted_agg" -> ((s, dir) =>
      SkewOps.saltedSumCount(
        Gts.fromEventsCents(s, dir)
          .select(col("class"), userid, col("ts"), col("vdouble")),
        Seq("class", "userid"), "vdouble", 16)),

    // string-encoding words (fn/TOB64.java, TOHEX.java,
    // STRINGFORMAT.java): base64/hex/printf round-trips as column
    // expressions — C-style %07.2f agrees across engines because cents
    // values carry exactly 2 decimals (no rounding at the boundary)
    "g101_encodings" -> ((s, dir) => {
      val f = Gts.fromEvents(s, dir)
      val tag = concat(col("class"), lit(":"), col("labels").getItem("user"))
      val cents = round(col("vdouble") * 100) // the EV cents expression
      f.select(col("class"), userid, col("ts"),
        base64(tag.cast(BinaryType)).as("b64"),
        hex(cents.cast(LongType)).as("hexv"),
        format_string("%s=%09.2f", col("class"), col("vdouble")).as("fmt"))
    }),

    // ISO8601 (fn/ISO8601.java): µs-precision UTC rendering + epoch day
    "g102_iso8601" -> ((s, dir) => {
      val f = Gts.fromEvents(s, dir)
      f.select(col("class"), userid, col("ts"),
        date_format(timestamp_micros(col("ts")),
          "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("iso"),
        floor(col("ts") / 86400000000L).cast(LongType).as("epoch_day"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "g100_salted_agg" ->
      s"""WITH g AS ($EV)
         |SELECT class, userid, sum(cents) AS sum_v,
         |  count(cents) AS count_v
         |FROM g GROUP BY 1, 2""".stripMargin,

    "g101_encodings" ->
      s"""WITH g AS ($EV)
         |SELECT class, userid, ts,
         |  base64(encode(class || ':' || userid)) AS b64,
         |  to_hex(CAST(cents AS BIGINT)) AS hexv,
         |  printf('%s=%09.2f', class, vdouble) AS fmt
         |FROM g""".stripMargin,

    "g102_iso8601" ->
      s"""WITH g AS ($EV)
         |SELECT class, userid, ts,
         |  strftime(make_timestamp(ts), '%Y-%m-%dT%H:%M:%S.%fZ') AS iso,
         |  ts // 86400000000 AS epoch_day
         |FROM g""".stripMargin
  )
}
