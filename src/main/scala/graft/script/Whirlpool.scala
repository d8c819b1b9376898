package graft.script

/** Clean-room WHIRLPOOL hash (the ISO/IEC 10118-3 dedicated hash
  * function of Barreto & Rijmen; the reference wraps BouncyCastle's
  * WhirlpoolDigest, WarpScriptLib.java:2305).
  *
  * Everything below is re-derived from the public specification: the
  * 8-bit S-box is GENERATED from the spec's two 4-bit mini-boxes E and
  * R (not transcribed), the diffusion layer is the circulant MDS
  * matrix cir(1,1,4,1,8,5,2,9) over GF(2⁸)/0x11D, the key schedule
  * feeds round constants taken from the S-box, and the compression is
  * Miyaguchi-Preneel. Verified in `WhirlpoolSpec` against the
  * specification's published test vectors.
  */
object Whirlpool {

  // mini-boxes from the spec; the 256-entry S-box is derived:
  // S(u‖v) = E(E(u) ⊕ r) ‖ E⁻¹(E⁻¹(v) ⊕ r), r = R(E(u) ⊕ E⁻¹(v))
  private val E = Array(0x1, 0xB, 0x9, 0xC, 0xD, 0x6, 0xF, 0x3,
    0xE, 0x8, 0x7, 0x4, 0xA, 0x2, 0x5, 0x0)
  private val R = Array(0x7, 0xC, 0xB, 0xD, 0xE, 0x4, 0x9, 0xF,
    0x6, 0x3, 0x8, 0xA, 0x2, 0x5, 0x1, 0x0)
  private val Einv: Array[Int] = {
    val inv = new Array[Int](16)
    var i = 0
    while (i < 16) { inv(E(i)) = i; i += 1 }
    inv
  }
  private val S: Array[Int] = Array.tabulate(256) { x =>
    val e = E(x >> 4)
    val ei = Einv(x & 15)
    val r = R(e ^ ei)
    (E(e ^ r) << 4) | Einv(ei ^ r)
  }

  /** GF(2⁸) multiply, reduction polynomial x⁸+x⁴+x³+x²+1 (0x11D). */
  private def gmul(a0: Int, b0: Int): Int = {
    var a = a0; var b = b0; var p = 0
    while (b != 0) {
      if ((b & 1) != 0) p ^= a
      a <<= 1
      if ((a & 0x100) != 0) a ^= 0x11D
      b >>= 1
    }
    p
  }

  private val cir = Array(1, 1, 4, 1, 8, 5, 2, 9)

  /** One round ρ[k] = σ[k] ∘ θ ∘ π ∘ γ on a 64-byte state. */
  private def round(st: Array[Int], key: Array[Int]): Array[Int] = {
    val g = new Array[Int](64)
    var i = 0
    while (i < 64) { g(i) = S(st(i)); i += 1 }
    val p = new Array[Int](64) // π: column j rotated down by j
    i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) { p(i * 8 + j) = g(((i - j + 8) % 8) * 8 + j); j += 1 }
      i += 1
    }
    val m = new Array[Int](64) // θ: rows × cir(1,1,4,1,8,5,2,9)
    i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        var acc = 0
        var k = 0
        while (k < 8) { acc ^= gmul(p(i * 8 + k), cir((j - k + 8) % 8)); k += 1 }
        m(i * 8 + j) = acc ^ key(i * 8 + j)
        j += 1
      }
      i += 1
    }
    m
  }

  /** The W block cipher under Miyaguchi-Preneel: H ← W_H(m) ⊕ H ⊕ m. */
  private def compress(h: Array[Int], block: Array[Int]): Unit = {
    var k = h.clone()
    var s = new Array[Int](64)
    var i = 0
    while (i < 64) { s(i) = block(i) ^ k(i); i += 1 }
    var r = 1
    while (r <= 10) {
      val rc = new Array[Int](64) // round constant: S-box bytes in row 0
      var j = 0
      while (j < 8) { rc(j) = S(8 * (r - 1) + j); j += 1 }
      k = round(k, rc)
      s = round(s, k)
      r += 1
    }
    i = 0
    while (i < 64) { h(i) = h(i) ^ s(i) ^ block(i); i += 1 }
  }

  def digest(msg: Array[Byte]): Array[Byte] = {
    // pad: 0x80, zeros to ≡32 (mod 64), then 256-bit big-endian bit length
    val bitLen = java.math.BigInteger.valueOf(msg.length.toLong)
      .multiply(java.math.BigInteger.valueOf(8))
    val padZeros = ((32 - (msg.length + 1) % 64) + 64) % 64
    val total = msg.length + 1 + padZeros + 32
    val buf = new Array[Byte](total)
    System.arraycopy(msg, 0, buf, 0, msg.length)
    buf(msg.length) = 0x80.toByte
    val lenBytes = bitLen.toByteArray.takeRight(32)
    System.arraycopy(lenBytes, 0, buf, total - lenBytes.length, lenBytes.length)
    val h = new Array[Int](64)
    var off = 0
    val block = new Array[Int](64)
    while (off < total) {
      var i = 0
      while (i < 64) { block(i) = buf(off + i) & 0xff; i += 1 }
      compress(h, block)
      off += 64
    }
    h.map(_.toByte)
  }
}
