package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Typed facade over the canonical long table (SURVEY §1.3: DataFrame
  * is the physical model because the 5-way value union is dynamic; the
  * case class gives the Scala API compile-time field checks where that
  * helps). */
final case class GtsPoint(
    cls: String, // 'class' is not a valid Java identifier for encoders
    labels: Map[String, String],
    gtsid: Long,
    ts: Long,
    lat: Option[Double],
    lon: Option[Double],
    elev: Option[Long],
    vtype: Byte,
    vlong: Option[Long],
    vdouble: Option[Double],
    vbool: Option[Boolean],
    vstring: Option[String],
    vbinary: Option[Array[Byte]])

object GtsPoint {
  implicit val encoder: Encoder[GtsPoint] = Encoders.product[GtsPoint]

  def typed(points: DataFrame): Dataset[GtsPoint] =
    points.withColumnRenamed("class", "cls").as[GtsPoint]

  def untyped(ds: Dataset[GtsPoint]): DataFrame =
    ds.toDF().withColumnRenamed("cls", "class")
}
