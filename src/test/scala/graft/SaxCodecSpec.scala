package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.{SaxCodec, SeriesKernels}
import graft.kernels.SeriesKernels.Pt

/** Goldens for the faithful SAX surface (script/SAXUtils.java,
  * continuum/gts/DISCORDS.java) — bounds, quantization edges, the
  * bit-interleaved word packing, and the HOTSAX discord trace. */
class SaxCodecSpec extends AnyFunSuite {

  test("alphabet-4 bounds are the Acklam quartiles, not the 0.67 table") {
    val b = SaxCodec.getBounds(4)
    assert(b.length === 3)
    // true N(0,1) quartile is 0.674489750196082…
    assert(math.abs(b(0) + 0.6744897501960817) < 1e-12)
    assert(b(1) === 0.0)
    assert(math.abs(b(2) - 0.6744897501960817) < 1e-12)
    // agreement with commons-math's independent inverse CDF
    val nd = new org.apache.commons.math3.distribution.NormalDistribution(null, 0.0, 1.0)
    for (n <- Seq(2, 4, 8, 16); (x, i) <- SaxCodec.getBounds(n).zipWithIndex)
      assert(math.abs(x - nd.inverseCumulativeProbability((i + 1.0) / n)) < 1e-9)
  }

  test("quantization: upper bound included, 0.67-vs-0.6745 band moves up") {
    // SAXUtils.SAX: exact bound match maps INTO the bound's interval
    val b = SaxCodec.getBounds(4)
    assert(SaxCodec.sax(2, b(0)) === 0)
    assert(SaxCodec.sax(2, 0.0) === 1)
    assert(SaxCodec.sax(2, b(2)) === 2)
    assert(SaxCodec.sax(2, -1.0) === 0)
    assert(SaxCodec.sax(2, 1.0) === 3)
    // the band the rounded table got wrong: 0.67 < z <= 0.674489…
    assert(SaxCodec.sax(2, 0.672) === 2) // table said 'd' (3)
    assert(SaxCodec.sax(2, -0.672) === 1) // table said 'a' (0)
  }

  test("bSAX packing is bit-interleaved MSB-first + OPB64") {
    // levels=2, symbols [1,1,3,1,1]: bit0 (MSB) = 00100, bit1 = 11111
    // stream 0010011111 → bytes 0x27 0xC0 → OPB64 groups over the
    // BYTES 001001|111100|0000 → alphabet[9]='8', [60]='w', [0]='.'
    assert(SaxCodec.bsaxBytes(2, Array(1, 1, 3, 1, 1)).toSeq ===
      Seq(0x27.toByte, 0xC0.toByte))
    assert(SaxCodec.bsaxWord(2, Array(1, 1, 3, 1, 1)) === "8w.")
    // single byte-aligned case: levels=2, 4 symbols = 8 bits
    // symbols [0,1,2,3]: bit0 = 0011, bit1 = 0101 → 00110101 = 0x35 →
    // OPB64 001101|01<<4 → alphabet[13]='C', alphabet[16]='F'
    assert(SaxCodec.bsaxBytes(2, Array(0, 1, 2, 3)).toSeq === Seq(0x35.toByte))
    assert(SaxCodec.bsaxWord(2, Array(0, 1, 2, 3)) === "CF")
  }

  test("wordTable indexes every word by its base-alphabet integer") {
    val t = SaxCodec.wordTable(2, 5)
    assert(t.length === 1024)
    // V([1,1,3,1,1]) = (((1*4+1)*4+3)*4+1)*4+1 = 373
    assert(t(373) === "8w.")
    assert(t(0) === SaxCodec.bsaxWord(2, Array(0, 0, 0, 0, 0)))
    assert(t(1023) === SaxCodec.bsaxWord(2, Array(3, 3, 3, 3, 3)))
  }

  test("levelsOf rejects non-power-of-two alphabets") {
    assert(SaxCodec.levelsOf(2) === 1)
    assert(SaxCodec.levelsOf(8) === 3)
    intercept[IllegalArgumentException](SaxCodec.levelsOf(3))
    intercept[IllegalArgumentException](SaxCodec.levelsOf(0))
  }

  test("discords: hand-traced 8-point series, windowLen 4, count 1") {
    // values: two identical half-windows then a spike
    val v = Seq(1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 50.0, 2.0)
    val pts = v.zipWithIndex.map { case (x, i) => Pt(i.toLong, x) }.toIndexedSeq
    // 5 windows (i=0..4); only the (0,4) pair is >= windowLen apart.
    // Every window i in {1,2,3} keeps nndist=+inf (no far neighbour
    // reachable via same-or-preceding symbols), so the winner is the
    // first +inf candidate in (occurrence, lex, location) order.
    val out = SeriesKernels.discords(pts, 4, 4, 4, 1, mayOverlap = true,
      distRatio = 0.0, standardizePAA = true)
    assert(out.length === 4)
    // the winning window is one of the interior ones: 4 consecutive ticks
    val ts = out.map(_.ts)
    assert(ts === (ts.head until ts.head + 4))
    assert(ts.head >= 1 && ts.head <= 3)
  }

  test("discords: count 0 or short series yield nothing") {
    val pts = (0 until 10).map(i => Pt(i.toLong, i.toDouble))
    assert(SeriesKernels.discords(pts, 12, 4, 4, 1, mayOverlap = true,
      distRatio = 0.0, standardizePAA = true).isEmpty)
    assert(SeriesKernels.discords(pts, 4, 4, 4, 0, mayOverlap = true,
      distRatio = 0.0, standardizePAA = true).isEmpty)
  }
}
