package graft.surface

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable

/** Callbacks a WebSocket endpoint implements (one instance serves every
  * connection; per-connection state hangs off [[WsConnection]]). */
trait WsHandler {
  def onOpen(c: WsConnection, path: String): Unit = ()
  def onText(c: WsConnection, message: String): Unit
  def onClose(c: WsConnection): Unit = ()
}

/** One accepted WebSocket connection: thread-safe server→client frame
  * writes plus an attachment slot for the endpoint's session state. */
final class WsConnection(socket: Socket, out: OutputStream, val path: String) {

  private val closed = new AtomicBoolean(false)

  /** Endpoint session state (e.g. Plasma subscriptions). */
  @volatile var attachment: AnyRef = _

  def isOpen: Boolean = !closed.get

  /** Send one unmasked text frame (RFC 6455 §5.6; server frames are
    * never masked, §5.1). */
  def sendText(message: String): Unit =
    sendFrame(0x1, message.getBytes(UTF_8))

  def sendBinary(payload: Array[Byte]): Unit = sendFrame(0x2, payload)

  private[surface] def sendPong(payload: Array[Byte]): Unit =
    sendFrame(0xA, payload)

  /** Initiate (or acknowledge) the closing handshake (§5.5.1). */
  def close(code: Int = 1000): Unit = if (closed.compareAndSet(false, true)) {
    try {
      sendRaw(0x8, Array[Byte]((code >> 8).toByte, code.toByte))
      socket.close()
    } catch { case _: Exception => () }
  }

  private[surface] def abort(): Unit = if (closed.compareAndSet(false, true)) {
    try socket.close() catch { case _: Exception => () }
  }

  private def sendFrame(opcode: Int, payload: Array[Byte]): Unit =
    if (!closed.get) try sendRaw(opcode, payload)
    catch { case _: Exception => abort() }

  /** FIN + opcode, then the 7/16/64-bit payload-length ladder (§5.2). */
  private def sendRaw(opcode: Int, payload: Array[Byte]): Unit =
    out.synchronized {
      out.write(0x80 | opcode)
      val n = payload.length
      if (n <= 125) out.write(n)
      else if (n <= 0xFFFF) {
        out.write(126); out.write(n >> 8); out.write(n & 0xFF)
      } else {
        out.write(127)
        var i = 7
        while (i >= 0) { out.write(((n.toLong >> (8 * i)) & 0xFF).toInt); i -= 1 }
      }
      out.write(payload)
      out.flush()
    }
}

/** Minimal RFC 6455 WebSocket server over a loopback ServerSocket —
  * the transport the reference serves Plasma subscriptions and Mobius
  * sessions on (Jetty `@WebSocket` handlers,
  * standalone/StandalonePlasmaHandler.java:154,
  * egress/EgressMobiusHandler.java:130). Implemented from the public
  * RFC: HTTP/1.1 Upgrade handshake with the §1.3 accept-key digest,
  * §5.2 framing (7/16/64-bit lengths, client-mask enforcement, text /
  * binary / continuation reassembly), §5.5 control frames (ping→pong,
  * close echo). Interop is pinned in WsServerSpec against the JDK's
  * independent java.net.http.WebSocket client.
  *
  * This is a protocol SURFACE (like [[RestFacade]]): per-connection
  * blocking reads on daemon threads are fine for a subscriber-facing
  * frontend; the data plane stays in Spark until an endpoint's
  * bounded push callback.
  */
final class WsServer(handler: WsHandler) {

  /** RFC 6455 §1.3 handshake GUID (a spec constant, not a secret). */
  private val AcceptGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  /** Cap on a single frame AND a reassembled message (close 1002/1009
    * beyond it) — bounds untrusted-peer memory. */
  private val MaxMessageBytes = 16L << 20

  private var server: ServerSocket = _
  private val conns = mutable.Set.empty[WsConnection]
  @volatile private var running = false

  /** Start on `port` (0 = ephemeral); returns the bound port. */
  def start(port: Int = 0): Int = {
    server = new ServerSocket(port, 16, InetAddress.getLoopbackAddress)
    running = true
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val t = new Thread(() => serve(sock), "ws-conn")
          t.setDaemon(true)
          t.start()
        } catch { case _: Exception => () } // closed during stop()
      }
    }, "ws-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    server.getLocalPort
  }

  def stop(): Unit = {
    running = false
    conns.synchronized { conns.foreach(_.abort()); conns.clear() }
    if (server != null) try server.close() catch { case _: Exception => () }
  }

  def openConnections: Seq[WsConnection] =
    conns.synchronized { conns.toSeq.filter(_.isOpen) }

  // ------------------------------------------------------------ internals

  private def serve(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    handshake(in, out, sock) match {
      case None => try sock.close() catch { case _: Exception => () }
      case Some(conn) =>
        conns.synchronized { conns += conn }
        try {
          handler.onOpen(conn, conn.path)
          readLoop(in, conn)
        } catch { case _: Exception => () }
        finally {
          conn.abort()
          conns.synchronized { conns -= conn }
          try handler.onClose(conn) catch { case _: Exception => () }
        }
    }
  }

  /** Parse the HTTP Upgrade request; answer 101 with the accept key. */
  private def handshake(in: InputStream, out: OutputStream,
                        sock: Socket): Option[WsConnection] = {
    val head = readHead(in)
    if (head.isEmpty) return None
    val lines = head.split("\r\n")
    val req = lines.head.split(" ")
    if (req.length < 2 || req(0) != "GET") return None
    val headers = lines.tail.flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
    }.toMap
    val key = headers.get("sec-websocket-key")
    val upgraded = headers.get("upgrade").exists(_.equalsIgnoreCase("websocket"))
    if (!upgraded || key.isEmpty) {
      out.write("HTTP/1.1 400 Bad Request\r\n\r\n".getBytes(UTF_8))
      out.flush()
      return None
    }
    val digest = MessageDigest.getInstance("SHA-1")
      .digest((key.get + AcceptGuid).getBytes(UTF_8))
    val accept = Base64.getEncoder.encodeToString(digest)
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
    out.flush()
    Some(new WsConnection(sock, out, req(1)))
  }

  /** Read the request head up to the blank line (bounded at 16 KiB). */
  private def readHead(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream
    var state = 0 // consecutive \r\n\r\n progress
    while (state < 4 && buf.size < 16384) {
      val b = in.read()
      if (b < 0) return ""
      buf.write(b)
      state = (state, b) match {
        case (0, '\r') => 1
        case (1, '\n') => 2
        case (2, '\r') => 3
        case (3, '\n') => 4
        case (_, '\r') => 1
        case _ => 0
      }
    }
    new String(buf.toByteArray, UTF_8)
  }

  /** §5 frame loop: reassemble fragmented messages, answer control
    * frames, enforce client masking (§5.1: close 1002 on unmasked). */
  private def readLoop(in: InputStream, conn: WsConnection): Unit = {
    var continuation = new java.io.ByteArrayOutputStream
    var messageOpcode = -1
    while (conn.isOpen) {
      val b0 = in.read()
      if (b0 < 0) return
      val fin = (b0 & 0x80) != 0
      val opcode = b0 & 0x0F
      val b1 = in.read()
      if (b1 < 0) return
      val masked = (b1 & 0x80) != 0
      var len: Long = b1 & 0x7F
      if (len == 126) len = (read8(in) << 8) | read8(in)
      else if (len == 127) {
        len = 0
        var i = 0
        while (i < 8) { len = (len << 8) | read8(in); i += 1 }
      }
      if (!masked || len < 0 || len > MaxMessageBytes) { conn.close(1002); return }
      val mask = new Array[Byte](4)
      readFully(in, mask)
      val payload = new Array[Byte](len.toInt)
      readFully(in, payload)
      var i = 0
      while (i < payload.length) {
        payload(i) = (payload(i) ^ mask(i & 3)).toByte
        i += 1
      }
      // §5.5: control frames must not be fragmented and carry <=125
      // bytes — anything else fails the connection
      if (opcode >= 0x8 && (!fin || payload.length > 125)) {
        conn.close(1002); return
      }
      opcode match {
        case 0x8 => // close: echo and drop (§5.5.1)
          conn.close(if (payload.length >= 2)
            ((payload(0) & 0xFF) << 8) | (payload(1) & 0xFF) else 1000)
          return
        case 0x9 => conn.sendPong(payload)
        case 0xA => () // unsolicited pong: ignore
        case 0x0 if messageOpcode < 0 =>
          conn.close(1002); return // continuation with nothing to continue
        case 0x1 | 0x2 if messageOpcode >= 0 =>
          conn.close(1002); return // new message inside a fragment train
        case 0x1 | 0x2 | 0x0 =>
          if (opcode != 0x0) messageOpcode = opcode
          // total-message cap: per-frame checks alone would let a
          // non-FIN fragment stream grow the buffer without bound
          if (continuation.size.toLong + payload.length > MaxMessageBytes) {
            conn.close(1009); return // RFC 6455 7.4.1: message too big
          }
          continuation.write(payload)
          if (fin) {
            val whole = continuation.toByteArray
            continuation = new java.io.ByteArrayOutputStream
            if (messageOpcode == 0x1)
              handler.onText(conn, new String(whole, UTF_8))
            messageOpcode = -1
          }
        case _ => conn.close(1002); return
      }
    }
  }

  private def read8(in: InputStream): Long = {
    val b = in.read()
    if (b < 0) throw new java.io.EOFException
    b.toLong
  }

  private def readFully(in: InputStream, buf: Array[Byte]): Unit = {
    var off = 0
    while (off < buf.length) {
      val n = in.read(buf, off, buf.length - off)
      if (n < 0) throw new java.io.EOFException
      off += n
    }
  }
}
