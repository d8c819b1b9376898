package graft

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit, CompletionStage}

import org.scalatest.funsuite.AnyFunSuite

import graft.surface.{WsConnection, WsHandler, WsServer}

/** RFC 6455 interop pinned against the JDK's independent
  * java.net.http.WebSocket client: handshake accept-key (including the
  * RFC's own §1.3 example vector over a raw socket), masked-frame
  * unmasking, 7/16/64-bit length ladders both directions, fragmented
  * text reassembly, ping→pong, and the close handshake. */
class WsServerSpec extends AnyFunSuite {

  /** Echo endpoint: every text message is sent straight back. */
  private class Echo extends WsHandler {
    override def onText(c: WsConnection, m: String): Unit = c.sendText(m)
  }

  /** JDK client whose received texts land in a queue (reassembling the
    * JDK listener's partial deliveries until `last`). */
  private final class Client(port: Int) {
    val texts = new ConcurrentLinkedQueue[String]
    val pongs = new ConcurrentLinkedQueue[Array[Byte]]
    val closed = new CountDownLatch(1)
    private val partial = new StringBuilder
    val ws: WebSocket = HttpClient.newHttpClient().newWebSocketBuilder()
      .buildAsync(URI.create(s"ws://127.0.0.1:$port/ws"),
        new WebSocket.Listener {
          override def onText(w: WebSocket, data: CharSequence,
              last: Boolean): CompletionStage[_] = {
            partial.append(data)
            if (last) { texts.add(partial.toString); partial.setLength(0) }
            w.request(1); null
          }
          override def onPong(w: WebSocket, msg: ByteBuffer): CompletionStage[_] = {
            val b = new Array[Byte](msg.remaining()); msg.get(b)
            pongs.add(b); w.request(1); null
          }
          override def onClose(w: WebSocket, code: Int,
              reason: String): CompletionStage[_] = {
            closed.countDown(); null
          }
        }).get(10, TimeUnit.SECONDS)

    def awaitText(timeoutMs: Long = 10000): String = {
      val deadline = System.nanoTime + timeoutMs * 1000000
      while (texts.isEmpty && System.nanoTime < deadline) Thread.sleep(5)
      val t = texts.poll()
      assert(t != null, "no text message within timeout")
      t
    }
  }

  test("handshake: RFC 6455 §1.3 example key yields the published accept") {
    val server = new WsServer(new Echo)
    val port = server.start()
    try {
      val sock = new java.net.Socket("127.0.0.1", port)
      sock.getOutputStream.write(
        ("GET /chat HTTP/1.1\r\nHost: 127.0.0.1\r\nUpgrade: websocket\r\n" +
          "Connection: Upgrade\r\nSec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n" +
          "Sec-WebSocket-Version: 13\r\n\r\n").getBytes(UTF_8))
      sock.getOutputStream.flush()
      val buf = new Array[Byte](1024)
      val n = sock.getInputStream.read(buf)
      val resp = new String(buf, 0, n, UTF_8)
      assert(resp.startsWith("HTTP/1.1 101"))
      // the accept value published in RFC 6455 §1.3 for this key
      assert(resp.contains("Sec-WebSocket-Accept: s3pPLMBiTxaQ9kYGzzhZRbK+xOo="))
      sock.close()
    } finally server.stop()
  }

  test("echo round-trips exercise mask + 7/16/64-bit lengths") {
    val server = new WsServer(new Echo)
    val port = server.start()
    try {
      val c = new Client(port)
      c.ws.sendText("hello", true).get(5, TimeUnit.SECONDS)
      assert(c.awaitText() == "hello")
      val mid = "x" * 300 // 16-bit length path both directions
      c.ws.sendText(mid, true).get(5, TimeUnit.SECONDS)
      assert(c.awaitText() == mid)
      val big = "y" * 70000 // 64-bit length path
      c.ws.sendText(big, true).get(5, TimeUnit.SECONDS)
      assert(c.awaitText() == big)
      c.ws.sendClose(WebSocket.NORMAL_CLOSURE, "done")
    } finally server.stop()
  }

  test("fragmented client text reassembles into one message") {
    val server = new WsServer(new Echo)
    val port = server.start()
    try {
      val c = new Client(port)
      c.ws.sendText("frag-", false).get(5, TimeUnit.SECONDS)
      c.ws.sendText("mented", true).get(5, TimeUnit.SECONDS)
      assert(c.awaitText() == "frag-mented")
      c.ws.sendClose(WebSocket.NORMAL_CLOSURE, "done")
    } finally server.stop()
  }

  /** Raw-socket client for frames the JDK client won't produce. */
  private final class RawWs(port: Int) {
    val sock = new java.net.Socket("127.0.0.1", port)
    private val out = sock.getOutputStream
    private val in = sock.getInputStream
    // complete the upgrade handshake first
    out.write(("GET /ws HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n" +
      "Connection: Upgrade\r\nSec-WebSocket-Key: AQIDBAUGBwgJCgsMDQ4PEA==\r\n" +
      "Sec-WebSocket-Version: 13\r\n\r\n").getBytes(UTF_8))
    out.flush()
    locally { // drain the 101 response head
      var state = 0
      while (state < 4) {
        val b = in.read(); assert(b >= 0, "EOF during handshake")
        state = (state, b) match {
          case (0, '\r') => 1; case (1, '\n') => 2
          case (2, '\r') => 3; case (3, '\n') => 4
          case (_, '\r') => 1; case _ => 0
        }
      }
    }

    /** One masked client frame (mask key 0). */
    def frame(fin: Boolean, opcode: Int, payload: Array[Byte]): Unit = {
      out.write((if (fin) 0x80 else 0x00) | opcode)
      val n = payload.length
      if (n <= 125) out.write(0x80 | n)
      else if (n <= 0xFFFF) { out.write(0x80 | 126); out.write(n >> 8); out.write(n & 0xFF) }
      else {
        out.write(0x80 | 127)
        var i = 7
        while (i >= 0) { out.write(((n.toLong >> (8 * i)) & 0xFF).toInt); i -= 1 }
      }
      out.write(Array[Byte](0, 0, 0, 0)) // zero mask = identity
      out.write(payload)
      out.flush()
    }

    def rawBytes(bs: Array[Byte]): Unit = { out.write(bs); out.flush() }

    /** Read one server frame: (opcode, payload). */
    def readFrame(): (Int, Array[Byte]) = {
      val b0 = in.read(); val b1 = in.read()
      assert(b0 >= 0 && b1 >= 0, "EOF")
      var len: Long = b1 & 0x7F
      if (len == 126) len = (in.read() << 8) | in.read()
      else if (len == 127) { len = 0; for (_ <- 0 until 8) len = (len << 8) | in.read() }
      val buf = new Array[Byte](len.toInt)
      var off = 0
      while (off < buf.length) {
        val n = in.read(buf, off, buf.length - off); assert(n >= 0, "EOF")
        off += n
      }
      (b0 & 0x0F, buf)
    }

    def awaitEof(): Boolean = {
      sock.setSoTimeout(10000)
      try { while (in.read() >= 0) {}; true }
      catch { case _: Exception => false }
    }
  }

  test("control frames interleave mid-fragmentation without corrupting the message") {
    val server = new WsServer(new Echo)
    val port = server.start()
    try {
      val c = new RawWs(port)
      c.frame(fin = false, 0x1, "ab".getBytes(UTF_8))
      c.frame(fin = true, 0x9, "ping!".getBytes(UTF_8)) // ping mid-message
      val (op1, pong) = c.readFrame()
      assert(op1 == 0xA && new String(pong, UTF_8) == "ping!")
      c.frame(fin = true, 0x0, "cd".getBytes(UTF_8)) // continuation
      val (op2, echo) = c.readFrame()
      assert(op2 == 0x1 && new String(echo, UTF_8) == "abcd")
      c.sock.close()
    } finally server.stop()
  }

  test("unmasked and negative-length client frames close the connection") {
    val server = new WsServer(new Echo)
    val port = server.start()
    try {
      val c1 = new RawWs(port)
      // unmasked text frame: §5.1 requires close 1002
      c1.rawBytes(Array[Byte](0x81.toByte, 0x02, 'h', 'i'))
      val (op, body) = c1.readFrame()
      assert(op == 0x8)
      assert(((body(0) & 0xFF) << 8 | (body(1) & 0xFF)) == 1002)
      assert(c1.awaitEof())
      // 64-bit length with the sign bit set must not desync or throw
      val c2 = new RawWs(port)
      c2.rawBytes(Array[Byte](0x81.toByte, 0xFF.toByte) ++
        Array.fill[Byte](8)(0xFF.toByte))
      val (op2, body2) = c2.readFrame()
      assert(op2 == 0x8)
      assert(((body2(0) & 0xFF) << 8 | (body2(1) & 0xFF)) == 1002)
      assert(c2.awaitEof())
    } finally server.stop()
  }

  test("ping answers pong with the same payload; close handshake completes") {
    val server = new WsServer(new Echo)
    val port = server.start()
    try {
      val c = new Client(port)
      c.ws.sendPing(ByteBuffer.wrap("p1".getBytes(UTF_8))).get(5, TimeUnit.SECONDS)
      val deadline = System.nanoTime + 10000L * 1000000
      while (c.pongs.isEmpty && System.nanoTime < deadline) Thread.sleep(5)
      assert(new String(c.pongs.poll(), UTF_8) == "p1")
      c.ws.sendClose(WebSocket.NORMAL_CLOSURE, "bye").get(5, TimeUnit.SECONDS)
      assert(c.closed.await(10, TimeUnit.SECONDS))
    } finally server.stop()
  }
}
