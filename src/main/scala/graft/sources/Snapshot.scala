package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SNAPSHOT (reference fn/SNAPSHOT.java:236-330 addElement): render
  * values as WarpScript literals that re-evaluate to the value —
  * the reference's universal debug/serialize surface.
  *
  * Scalars render inline (`NULL`, numbers verbatim, URL-encoded quoted
  * strings, `true`/`false`), collections recurse (`[ ... ]`,
  * `{ k v ... }`), and a GTS renders as `'<wrapped blob>' UNWRAP`
  * (SNAPSHOT.java:287-308 wraps the series and emits an UNWRAP call) —
  * here the blob is [[GtsCodec]]'s base64 wrapper, so the string
  * round-trips through our own UNWRAP.
  */
object Snapshot {

  /** URL-encode a string the way the reference's WarpURLEncoder does:
    * standard form encoding with space as %20. */
  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  /** Driver-side literal rendering of a scalar/collection value. */
  def render(o: Any): String = o match {
    case null => "NULL "
    case None => "NULL "
    case Some(x) => render(x)
    case s: String => s"'${enc(s)}' "
    case b: Boolean => if (b) "true " else "false "
    // non-finite doubles: `NaN` is a registered WarpScript word
    // (WarpScriptLib.java:1226) so it re-evaluates; `Infinity` is NOT a
    // word — Scala's toString would emit a non-parsing token, so reject
    // it like any other unsupported value
    case d: Double if d.isNaN => "NaN "
    case d: Double if d.isInfinite => throw new IllegalArgumentException(
      "SNAPSHOT: Infinity has no WarpScript literal form")
    case d: Double => s"$d "
    case f: Float => render(f.toDouble)
    // BigDecimal re-evaluates through TOBD (a bare decimal literal
    // would come back as a Double); bytes through base64 + B64TO
    case bd: java.math.BigDecimal => s"'${bd.toPlainString}' TOBD "
    case bytes: Array[Byte] =>
      s"'${java.util.Base64.getEncoder.encodeToString(bytes)}' B64TO "
    case n: Number => s"$n "
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, v) => render(k) + render(v) }.mkString("{ ", "", "} ")
    case seq: Iterable[_] => seq.map(render).mkString("[ ", "", "] ")
    case arr: Array[_] => arr.map(render).mkString("[ ", "", "] ")
    case other => throw new IllegalArgumentException(
      s"SNAPSHOT: unsupported type ${other.getClass}")
  }

  /** GTS snapshot: one `'<b64 wrap blob>' UNWRAP ` statement per series
    * — distributed (wrap is a groupBy, the rendering a projection). */
  def gtsSnapshots(points: DataFrame): DataFrame =
    GtsCodec.wrap(points).select(col("class"), col("labels"),
      concat(lit("'"), base64(col("blob")), lit("' UNWRAP ")).as("snapshot"))
}
