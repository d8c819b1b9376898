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
