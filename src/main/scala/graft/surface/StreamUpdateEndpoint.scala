package graft.surface

import org.apache.spark.sql.Row

import graft.sources.LineProtocol

/** The live line-protocol ingest WebSocket (reference
  * `/api/v0/streamupdate`, standalone/StandaloneStreamUpdateHandler
  * .java:142-465): a session pushes measurement messages and control
  * verbs; each measurement block is parsed and handed to the sink,
  * acknowledged `OK <seqno> UPDATE <count> <nanos>`.
  *
  * Wire protocol:
  *  - `TOKEN <t>` / `CLEARTOKEN` / `NOOP` → `OK <seqno> <VERB>` (this
  *    facade is tokenless like [[RestFacade]]; the token is held but
  *    not validated)
  *  - `ONERROR message|close` → whether a parse failure answers an
  *    `ERROR <msg>` text (:458) or closes the session (:461, the
  *    default)
  *  - `DELTAON`/`DELTAOFF`/`ATTRSKIPON`/`ATTRSKIPOFF` accepted, no ack
  *    (:182-194); attribute parsing is the /meta endpoint's job here
  *  - anything else = line-protocol measurements (`=`-continuation
  *    carries within the message); the WHOLE message fails atomically
  *    on a malformed line, like the HTTP update endpoint
  *
  * `sink` receives each parsed batch as canonical point rows — the
  * driver rows feed a session overlay; a deployment feeds the same
  * rows to a streaming writer. At 100 TB the durable path is Kafka →
  * [[graft.streaming.StreamingIngest]]; this endpoint is the
  * interactive socket the reference exposes alongside it.
  */
final class StreamUpdateEndpoint(sink: Seq[Row] => Unit,
                                 now: Long = 0L) extends WsHandler {

  private final class UpdateSession {
    var seqno: Long = 0L
    var errormsg: Boolean = false // reference default: close on error
    var token: Option[String] = None
  }

  private def session(c: WsConnection): UpdateSession =
    c.attachment.asInstanceOf[UpdateSession]

  override def onOpen(c: WsConnection, path: String): Unit =
    c.attachment = new UpdateSession

  override def onText(c: WsConnection, message: String): Unit = {
    val s = session(c)
    def ok(verb: String): Unit = {
      c.sendText(s"OK ${s.seqno} $verb")
      s.seqno += 1
    }
    try {
      // NOTE deliberately un-trimmed: the reference dispatches verbs
      // with message.startsWith(...) (:156), so ' NOOP' is a
      // measurement there too and must stay one here
      val verb = message.takeWhile(!_.isWhitespace)
      verb match {
        case "TOKEN" =>
          s.token = message.split("\\s+").lift(1)
          ok("TOKEN")
        case "CLEARTOKEN" => s.token = None; ok("CLEARTOKEN")
        case "NOOP" => ok("NOOP")
        case "ONERROR" =>
          message.split("\\s+").lift(1).map(_.toLowerCase) match {
            case Some("message") => s.errormsg = true
            case Some("close") => s.errormsg = false
            case _ => ()
          }
          ok("ONERROR")
        case "DELTAON" | "DELTAOFF" | "ATTRSKIPON" | "ATTRSKIPOFF" => ()
        case _ =>
          val t0 = System.nanoTime
          var prev: Option[(String, Map[String, String])] = None
          val rows = Vector.newBuilder[Row]
          var count = 0
          message.linesIterator.map(_.trim)
            .filter(l => l.nonEmpty && !l.startsWith("#")).foreach { line =>
              val (p, id) = LineProtocol.parseLine(prev, line, now)
              prev = Some(id)
              count += 1
              rows += Row(p.cls, p.labels, 0L, p.ts,
                p.lat.orNull, p.lon.orNull, p.elev.orNull, p.vtype,
                p.vlong.orNull, p.vdouble.orNull, p.vbool.orNull,
                p.vstring.orNull, p.vbinary.orNull)
            }
          sink(rows.result())
          c.sendText(s"OK ${s.seqno} UPDATE $count ${System.nanoTime - t0}")
          s.seqno += 1
      }
    } catch {
      case e: Exception =>
        if (s.errormsg)
          c.sendText("ERROR " + Option(e.getMessage).getOrElse(e.toString))
        else c.close(1002)
    }
  }

  def mount(): WsServer = new WsServer(this)
}
