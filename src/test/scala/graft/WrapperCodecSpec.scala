package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WrapperCodec
import graft.sources.WrapperCodec.WPoint

/** Byte-compatibility of the reference GTSWrapper wire format
  * (sources/WrapperCodec.scala). The first test decodes a fixture blob
  * HAND-ASSEMBLED byte-by-byte from the format spec (GTSEncoder.java
  * flag layout + the thrift compact protocol + the GTSWrapper struct
  * ids) — independent of this repo's encoder, so the decoder is pinned
  * to the documented format, not to its own inverse. The remaining
  * tests are encode→decode round-trip properties across the value
  * types, delta/identical paths, gzip and OPB64.
  */
class WrapperCodecSpec extends AnyFunSuite {

  test("encodePoints matches the reference's own GTSEncoderTest.testEncoding vectors") {
    // every hex vector of GTSEncoderTest.testEncoding:309-394 (r13 —
    // these caught a real divergence: a fresh encoder delta-encodes
    // its FIRST point against base; only safeDelta() forces raw)
    def hex(points: Seq[WPoint], base: Long = 0L) =
      WrapperCodec.encodePoints(points, base).map(b => f"$b%02x").mkString
    def p(ts: Long, v: Any) = WPoint(ts, None, None, v)
    assert(hex(Seq(p(0, 1L))) == "2c02")
    assert(hex(Seq(p(0x0123456789abcdefL, 1L))) == "6c0123456789abcdef02")
    assert(hex(Seq(p((1L << 48) - 1, 1L))) == "4cfeffffffffff7f02")
    assert(hex(Seq(p(0, 1L), p(1, 2L))) == "2c024e0202")
    assert(hex(Seq(p(0, 1L), p(1, 1L))) == "2c024902")
    assert(hex(Seq(p(0, Double.NaN))) == "347ff8000000000000")
    // the BigDecimal scaled form is decode-side for us (our encoder
    // IEEE754s plain doubles): the reference's "300002" is 1.0 at 0
    val dec = WrapperCodec.decodePoints(
      Array(0x30, 0x00, 0x02).map(_.toByte), 0L)
    assert(dec == Vector(WPoint(0L, None, None, 1.0)))
    assert(hex(Seq(
      WPoint(0, Some(0xb000000000000001L), None, 0L),
      WPoint(1, Some(0xb000000000000002L), None, 1L)))
      == "ac40b00000000000000100cc60020202")
    assert(hex(Seq(
      WPoint(0, None, Some(0x7000000000000001L), 0L),
      WPoint(1, None, Some(0x7000000000000002L), 1L)))
      == "ac08700000000000000100cc0e020202")
    assert(hex(Seq(
      WPoint(0, Some(0xb000000000000001L), Some(0x7000000000000001L), 0L),
      WPoint(1, Some(0xb000000000000002L), Some(0x7000000000000002L), 1L)))
      == "ac48b000000000000001700000000000000100cc6e02020202")
  }

  test("OPB64 matches the reference's own OrderPreservingBase64Test") {
    // crypto/OrderPreservingBase64Test.java:34-60 vectors + the
    // :661-677 order-preservation property (seeded here)
    def enc(bs: Array[Byte]) = WrapperCodec.opb64Encode(bs)
    assert(enc(Array(-1)) == "zk")
    assert(enc(Array(-1, -1)) == "zzw")
    assert(enc(Array(-1, -1, -1)) == "zzzz")
    assert(enc(Array(-1, -1, -1, -1)) == "zzzzzk")
    assert(enc(Array(-1, -1, -1, -1, -1)) == "zzzzzzw")
    assert(WrapperCodec.opb64Decode("zzzzzk").toSeq == Seq[Byte](-1, -1, -1, -1))
    assert(WrapperCodec.opb64Decode("zzw").toSeq == Seq[Byte](-1, -1))
    val rand = new scala.util.Random(7)
    def cmp(x: Array[Byte], y: Array[Byte]): Int = {
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
    for (_ <- 1 to 2000) {
      val a = Array.fill(rand.nextInt(16))(rand.nextInt().toByte)
      val b = Array.fill(rand.nextInt(16))(rand.nextInt().toByte)
      val bc = cmp(a, b); val sc = enc(a).compareTo(enc(b))
      assert((bc == 0 && sc == 0) || bc.toLong * sc > 0)
    }
  }

  /** GTSWrapper{ metadata{name:"t.s", labels:{u:1}}, encoded, count:3 }
    * with three points (1000, 42L), (2000, 42L), (3000, 3.5):
    *
    * thrift compact:
    *   1C                    field 1 (delta 1, type 12 struct) Metadata
    *     18 03 74 2E 73      name: field 1, string, len 3, "t.s"
    *     1B 01 88 01 75 01 31  labels: field 2, map, 1 entry,
    *                            key/val both string(8), "u" -> "1"
    *     00                  Metadata stop
    *   68 18                 field 7 (delta 6, binary), len 24
    *     encoded stream:
    *     6C  00 00 00 00 00 00 03 E8  54
    *         p1: flags RAW_ABSOLUTE|LONG|ZIGZAG, ts=1000 raw BE,
    *             zigzag(42)=0x54
    *     09  D0 0F
    *         p2: flags DELTA_PREVIOUS|LONG|IDENTICAL,
    *             zigzag(1000)=2000 varint D0 0F, value identical
    *     14  D0 0F  40 0C 00 00 00 00 00 00
    *         p3: flags DELTA_PREVIOUS|DOUBLE|IEEE754, delta 1000,
    *             bits(3.5)=0x400C000000000000
    *   16 06                 field 8 (delta 1, i64) count zigzag(3)=6
    *   00                    stop
    */
  private val handBuilt: Array[Byte] = Array(
    0x1C, 0x18, 0x03, 0x74, 0x2E, 0x73,
    0x1B, 0x01, 0x88, 0x01, 0x75, 0x01, 0x31, 0x00,
    0x68, 0x18,
    0x6C, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x03, 0xE8, 0x54,
    0x09, 0xD0, 0x0F,
    0x14, 0xD0, 0x0F, 0x40, 0x0C, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x16, 0x06, 0x00).map(_.toByte)

  test("hand-assembled spec blob decodes to the expected rows") {
    val (w, pts) = WrapperCodec.unwrapBytes(handBuilt)
    assert(w.name == "t.s")
    assert(w.labels == Map("u" -> "1"))
    assert(w.count == 3L)
    assert(!w.compressed)
    assert(pts == Vector(
      WPoint(1000L, None, None, 42L),
      WPoint(2000L, None, None, 42L),
      WPoint(3000L, None, None, 3.5d)))
  }

  test("our emit of the same series reproduces the reference encoding") {
    // the reference's FRESH encoder delta-encodes p1 against base too
    // (GTSEncoderTest.testEncoding vectors, r13) — so its stream for
    // this series is `4C D0 0F 54` (ZIGZAG_DELTA_BASE) where the
    // hand-built DECODE fixture above deliberately uses the
    // raw-absolute form (both are valid wire; the decoder must accept
    // both, the encoder must emit the reference's choice)
    val blob = WrapperCodec.wrapBytes("t.s", Map("u" -> "1"),
      Seq(WPoint(1000L, None, None, 42L), WPoint(2000L, None, None, 42L),
        WPoint(3000L, None, None, 3.5d)),
      compress = false)
    val expected: Array[Byte] = Array(
      0x1C, 0x18, 0x03, 0x74, 0x2E, 0x73,
      0x1B, 0x01, 0x88, 0x01, 0x75, 0x01, 0x31, 0x00,
      0x68, 0x12,
      0x4C, 0xD0, 0x0F, 0x54,
      0x09, 0xD0, 0x0F,
      0x14, 0xD0, 0x0F, 0x40, 0x0C, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
      0x16, 0x06, 0x00).map(_.toByte)
    assert(blob.toSeq == expected.toSeq)
  }

  private val mixed = Vector(
    WPoint(0L, None, None, 7L),
    WPoint(1000000L, Some(0x123456789AL), Some(150L), -3L),
    WPoint(1000001L, Some(0x123456789BL), Some(151L), -3L),
    WPoint(2000000L, None, Some(-40L), true),
    WPoint(2000001L, None, None, false),
    WPoint(3000000L, None, None, "héllo"),
    WPoint(3000001L, None, None, "héllo"),
    WPoint(4000000L, None, None, Array[Byte](0, 1, 2, -1)),
    WPoint(5000000L, None, None, 2.25d),
    WPoint(5000001L, None, None, 2.25d),
    WPoint(6000000L, None, None, Long.MaxValue), // raw-8 long path
    WPoint(7000000L, None, None, Double.NaN))

  private def eqPoints(a: Vector[WPoint], b: Vector[WPoint]): Unit =
    a.zip(b).foreach { case (x, y) =>
      assert(x.ts == y.ts && x.location == y.location &&
        x.elevation == y.elevation)
      (x.value, y.value) match {
        case (xb: Array[Byte], yb: Array[Byte]) => assert(xb.toSeq == yb.toSeq)
        case (xd: Double, yd: Double) if xd.isNaN => assert(yd.isNaN)
        case (xv, yv) => assert(xv == yv)
      }
    }

  test("encode→decode round-trips every value type and delta path") {
    val enc = WrapperCodec.encodePoints(mixed, base = 0L)
    eqPoints(WrapperCodec.decodePoints(enc, base = 0L), mixed)
  }

  test("non-zero base exercises equals-base and delta-base timestamps") {
    val pts = Vector(WPoint(500L, None, None, 1L),
      WPoint(100L, None, None, 2L), WPoint(520L, None, None, 3L))
    val enc = WrapperCodec.encodePoints(pts, base = 500L)
    eqPoints(WrapperCodec.decodePoints(enc, base = 500L), pts)
  }

  test("gzip'd wrapper + OPB64 string round-trip") {
    // repetitive content so gzip actually shrinks and stays chosen
    val pts = (0 until 200).map(i => WPoint(1000L * i, None, None, 42L)).toVector
    val s = WrapperCodec.wrapString("big", Map("k" -> "v"), pts)
    val (w, back) = WrapperCodec.unwrapString(s)
    assert(w.compressed && w.name == "big" && w.count == 200)
    eqPoints(back, pts)
  }

  test("OPB64 preserves byte order (the alphabet's design property)") {
    val samples = Seq(Array[Byte](0, 0), Array[Byte](0, 1),
      Array[Byte](1, 0), Array[Byte](0x7f, -1), Array[Byte](-128, 0),
      Array[Byte](-1, -1))
    // unsigned-lexicographic byte order ↔ string order
    def ulex(a: Array[Byte], b: Array[Byte]): Boolean = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      a.length < b.length
    }
    val sorted = samples.sortWith(ulex)
    val encSorted = samples.map(WrapperCodec.opb64Encode).sorted
    assert(sorted.map(WrapperCodec.opb64Encode) == encSorted)
    samples.foreach { b =>
      assert(WrapperCodec.opb64Decode(WrapperCodec.opb64Encode(b)).toSeq == b.toSeq)
    }
  }
}
