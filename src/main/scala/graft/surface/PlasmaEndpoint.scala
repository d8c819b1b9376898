package graft.surface

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.GtsType
import graft.sources.{Selector, WrapperCodec}

import scala.collection.mutable

/** The Plasma subscription endpoint over [[WsServer]] (reference:
  * standalone/StandalonePlasmaHandler.java — WebSocket sessions send
  * whitespace-separated commands, the handler resolves selectors
  * against the directory at SUBSCRIBE time into a per-session set of
  * GTS ids, and every stored batch is dispatched to the sessions
  * subscribed to its series).
  *
  * Wire protocol (StandalonePlasmaHandler.java:173-330):
  *  - `SUBSCRIBE <token> <selector>` / `UNSUBSCRIBE <token> <selector>`
  *  - `SUBSCRIPTIONS` → one `SUB class{labels}` message per id (:541-553)
  *  - `CLEAR`, `NOOP` (keep-alive), `SAMPLE <rate>` (0<rate≤1, else reset)
  *  - `TEXT` / `FULLTEXT` / `JSON` / `WRAPPER` output formats; errors
  *    are pushed as `KO <message>` strings.
  *  - `RAW` (dispatch:645-667): `<base>// OPB64(AES-keywrap(thrift
  *    Metadata)):OPB64(GTSEncoder bytes)` — available when the facade
  *    is constructed with a `metadataKey` (the reference reads its key
  *    from the keystore registry); unconfigured it answers `KO` rather
  *    than emit unencrypted lookalikes.
  *
  * Push formats (dispatch:626-813, one message per GTS per batch,
  * newline-terminated lines):
  *  - TEXT: `ts/lat:lon/elev class{labels} value`, then
  *    `=ts/lat:lon/elev value` continuations (the fetch text format —
  *    round-trips through [[graft.sources.LineProtocol]]).
  *  - FULLTEXT: every line carries the metadata.
  *  - JSON: `[{"c","l","t","v"[,"lat","lon","elev"]},…]`.
  *  - WRAPPER: OPB64 of the byte-compatible [[WrapperCodec]] envelope
  *    (compressed, as GTSWrapperHelper.fromGTSEncoderToGTSWrapper).
  *
  * Subscription is ID-based exactly like the reference: the selector
  * is resolved ONCE against the directory at SUBSCRIBE time; series
  * created later do not join existing subscriptions. At scale the
  * dispatch filter is a broadcast-able `gtsid` semi-join per batch and
  * the per-session collect is the protocol delivery surface (the
  * reference funnels the same rows through its frontend session).
  */
final class PlasmaEndpoint(directory: () => DataFrame,
                           maxRowsPerBatch: Int = 100000,
                           metadataKey: Option[Array[Byte]] = None)
    extends WsHandler {

  private object Format extends Enumeration {
    val Text, FullText, Json, Wrapper, Raw = Value
  }

  private final class PlasmaSession {
    // id → (class, labels); insertion order keeps SUBSCRIPTIONS stable
    val subs = mutable.LinkedHashMap.empty[Long, (String, Map[String, String])]
    // format/sampleRate are written on the WS reader thread and read on
    // the streaming dispatch thread — volatile so a switch is visible
    // to an in-flight dispatch
    @volatile var format: Format.Value = Format.Text // default (:858-862)
    @volatile var sampleRate: Double = 1.0
    // the reference samples from an unseeded Random (:704); fixed seed
    // keeps driver rows replayable, same convention as the engine PRNG
    val rng = new java.util.Random(42L)
  }

  private def session(c: WsConnection): PlasmaSession =
    c.attachment.asInstanceOf[PlasmaSession]

  override def onOpen(c: WsConnection, path: String): Unit =
    c.attachment = new PlasmaSession

  override def onText(c: WsConnection, message: String): Unit = {
    val s = session(c)
    val tokens = message.trim.split("\\s+")
    tokens(0) match {
      case "SUBSCRIBE" | "UNSUBSCRIBE" =>
        if (tokens.length < 3) { c.sendText("KO Invalid subscription selector."); return }
        if (tokens(1).isEmpty) { c.sendText("KO Invalid token."); return }
        val sel =
          try Selector.parse(tokens(2))
          catch { case _: Exception =>
            c.sendText("KO Invalid subscription selector."); return }
        val matched = directory().filter(sel.predicate)
          .select(col("gtsid"), col("class"), col("labels")).collect()
        s.synchronized {
          if (tokens(0).charAt(0) == 'S')
            matched.foreach { r =>
              s.subs(r.getLong(0)) =
                (r.getString(1), r.getAs[Map[String, String]](2))
            }
          else matched.foreach(r => s.subs.remove(r.getLong(0)))
        }
      case "SUBSCRIPTIONS" =>
        s.synchronized {
          s.subs.values.foreach { case (cls, labels) =>
            c.sendText(s"SUB ${cls}${Wire.labels(labels)}")
          }
        }
      case "CLEAR" => s.synchronized(s.subs.clear())
      case "TEXT" => s.format = Format.Text
      case "FULLTEXT" => s.format = Format.FullText
      case "JSON" => s.format = Format.Json
      case "WRAPPER" => s.format = Format.Wrapper
      case "RAW" =>
        if (metadataKey.isDefined) s.format = Format.Raw
        else c.sendText("KO RAW needs the metadata encryption key registry.")
      case "SAMPLE" =>
        val rate = try tokens(1).toDouble catch { case _: Exception => -1.0 }
        s.sampleRate = if (rate > 0.0 && rate <= 1.0) rate else 1.0
      // GEO is an accepted no-op stub in the reference too (:310-313)
      case "GEO" | "NOOP" | "" => ()
      case other =>
        // the reference fails the upgrade/session on an invalid verb
        // (StandalonePlasmaHandler:331 throws): notify, then close with
        // the protocol-error code rather than keep a broken session
        c.sendText(s"KO Invalid verb '$other'.")
        c.close(1002)
    }
  }

  /** Number of ids the sessions hold (driver-row synchronization aid —
    * the reference exposes the same via getSubscriptions():834). */
  def subscriptionCount: Int =
    server.map(_.openConnections.map(c =>
      Option(c.attachment).map(_ => session(c).subs.size).getOrElse(0)).sum)
      .getOrElse(0)

  /** The server this endpoint is mounted on (set by [[mount]]). */
  private var server: Option[WsServer] = None

  def mount(): WsServer = {
    val ws = new WsServer(this)
    server = Some(ws)
    ws
  }

  /** Dispatch one stored batch of canonical points to every session
    * subscribed to their series (StandalonePlasmaHandler.dispatch). */
  def dispatch(batch: DataFrame): Unit = {
    val sessions = server.toSeq.flatMap(_.openConnections)
      .filter(c => Option(c.attachment).exists(_ => session(c).subs.nonEmpty))
    if (sessions.isEmpty) return
    val allIds = sessions.flatMap(c => session(c).subs.keys).distinct
    // small id sets inline into the scan filter; a huge subscription
    // set would become a broadcast semi-join on gtsid instead
    val rows = batch.filter(col("gtsid").isin(allIds: _*))
      .select(col("gtsid"), col("ts"), col("lat"), col("lon"), col("elev"),
        col("vtype"), col("vlong"), col("vdouble"), col("vbool"),
        col("vstring"), col("vbinary"))
      .orderBy(col("gtsid"), col("ts"))
      .limit(maxRowsPerBatch + 1).collect() // +1: detect a real overflow
    if (rows.length > maxRowsPerBatch)
      // dropped delivery must be observable, not silent: every session
      // gets a KO notice that this batch was truncated at the cap
      sessions.foreach(_.sendText(
        s"KO Batch truncated at $maxRowsPerBatch rows; points beyond the cap were not delivered."))
    val byId = rows.take(maxRowsPerBatch).groupBy(_.getLong(0))
    for (c <- sessions; sess = session(c); (id, meta) <- sess.synchronized(sess.subs.toVector)) {
      byId.get(id).foreach { pts =>
        val sampled =
          if (sess.sampleRate == 1.0) pts.toSeq
          else pts.toSeq.filter(_ => sess.rng.nextDouble() <= sess.sampleRate)
        if (sampled.nonEmpty) c.sendText(render(sess.format, meta, sampled))
      }
    }
  }

  // ------------------------------------------------------------ rendering

  private def valueOf(r: org.apache.spark.sql.Row): Any = r.getByte(5) match {
    case GtsType.LONG => r.getLong(6)
    case GtsType.DOUBLE => r.getDouble(7)
    case GtsType.BOOLEAN => r.getBoolean(8)
    case GtsType.STRING => r.getString(9)
    case _ => r.getAs[Array[Byte]](10)
  }

  /** Input-format value literal (GTSHelper.encodeValue): long/double
    * plain, boolean T/F, string quoted — with the quote/percent/newline
    * specials percent-encoded so the line survives the LineProtocol
    * round-trip (the reference URL-encodes string values) — binary
    * b64-prefixed. */
  private def valueStr(v: Any): String = v match {
    case b: Boolean => if (b) "T" else "F"
    // '+' must escape too: the LineProtocol parser URL-decodes any
    // token containing '%', and URLDecoder turns a literal '+' into a
    // space — so '%' alongside '+' would corrupt the round-trip
    case s: String => "'" + s.replace("%", "%25").replace("+", "%2B")
      .replace("'", "%27").replace("\n", "%0A").replace("\r", "%0D") + "'"
    case b: Array[Byte] => "b64:" + java.util.Base64.getEncoder.encodeToString(b)
    case o => String.valueOf(o)
  }

  private def locElev(r: org.apache.spark.sql.Row): String = {
    val loc = if (r.isNullAt(2) || r.isNullAt(3)) ""
      else s"${r.getDouble(2)}:${r.getDouble(3)}"
    val elev = if (r.isNullAt(4)) "" else r.getLong(4).toString
    s"$loc/$elev"
  }

  private def render(format: Format.Value,
                     meta: (String, Map[String, String]),
                     pts: Seq[org.apache.spark.sql.Row]): String = {
    val (cls, labels) = meta
    format match {
      case Format.Text | Format.FullText =>
        val full = format == Format.FullText
        val sb = new StringBuilder
        var first = true
        pts.foreach { r =>
          if (!first && !full) sb.append('=')
          sb.append(r.getLong(1)).append('/').append(locElev(r)).append(' ')
          if (first || full)
            sb.append(cls).append(Wire.labels(labels)).append(' ')
          sb.append(valueStr(valueOf(r))).append('\n')
          first = false
        }
        sb.toString
      case Format.Json =>
        pts.map { r =>
          val sb = new StringBuilder("{\"c\":\"")
          sb.append(StackJson.escape(cls)).append("\",\"l\":{")
          sb.append(labels.toSeq.sortBy(_._1).map { case (k, v) =>
            "\"" + StackJson.escape(k) + "\":\"" + StackJson.escape(v) + "\""
          }.mkString(","))
          sb.append("},\"t\":").append(r.getLong(1))
          sb.append(",\"v\":").append(valueOf(r) match {
            case s: String => "\"" + StackJson.escape(s) + "\""
            case b: Array[Byte] => "\"" +
              java.util.Base64.getEncoder.encodeToString(b) + "\""
            case o => String.valueOf(o)
          })
          if (!r.isNullAt(2) && !r.isNullAt(3))
            sb.append(",\"lat\":").append(r.getDouble(2))
              .append(",\"lon\":").append(r.getDouble(3))
          if (!r.isNullAt(4)) sb.append(",\"elev\":").append(r.getLong(4))
          sb.append('}').toString
        }.mkString("[", ",", "]")
      case Format.Wrapper =>
        WrapperCodec.opb64Encode(
          WrapperCodec.wrapBytes(cls, labels, wpoints(pts), compress = true))
      case Format.Raw =>
        // StandalonePlasmaHandler.java:645-667: `<base>// ` + OPB64 of
        // the AES-keywrapped thrift Metadata + ':' + OPB64 of the raw
        // (uncompressed) GTSEncoder byte stream
        val base = pts.head.getLong(1)
        s"$base// ${rawMetaB64(cls, labels)}:" +
          WrapperCodec.opb64Encode(WrapperCodec.encodePoints(wpoints(pts), base))
    }
  }

  // The wrapped metadata is constant per series for the endpoint's
  // lifetime (the key is fixed at construction) — cache it so N
  // sessions on a hot series don't pay N AES keywraps per micro-batch
  private val rawMetaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Map[String, String]), String]
  private def rawMetaB64(cls: String, labels: Map[String, String]): String = {
    if (rawMetaCache.size > 10000) rawMetaCache.clear() // crude bound
    rawMetaCache.computeIfAbsent((cls, labels), { k =>
      val key = metadataKey.getOrElse(
        throw new IllegalStateException("RAW without a metadata key"))
      WrapperCodec.opb64Encode(
        graft.sources.AesWrap.wrap(key, WrapperCodec.writeMetadata(k._1, k._2)))
    })
  }

  private def wpoints(pts: Seq[org.apache.spark.sql.Row]): Seq[WrapperCodec.WPoint] =
    pts.map { r =>
      val loc = if (r.isNullAt(2) || r.isNullAt(3)) None
        else Some(graft.functions.GeoFunctions.toHHCode(
          r.getDouble(2), r.getDouble(3)))
      val elev = if (r.isNullAt(4)) None else Some(r.getLong(4))
      WrapperCodec.WPoint(r.getLong(1), loc, elev, valueOf(r))
    }
}
