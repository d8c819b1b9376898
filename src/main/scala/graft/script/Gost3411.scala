package graft.script

/** Clean-room GOST R 34.11-94 hash (RFC 5831) over the GOST 28147-89
  * block cipher (RFC 5830) with the CryptoPro hash S-box of RFC 4357
  * (id-GostR3411-94-CryptoProParamSet) — the parameter set the
  * reference's BouncyCastle GOST3411Digest uses (WarpScriptLib.java:2306).
  *
  * Structure per the standard: per 256-bit block, key generation via
  * the P byte permutation and the A word transform with the C3
  * constant, four GOST 28147 ECB encryptions of the chaining value,
  * then the ψ-LFSR output mixing H ← ψ⁶¹(H ⊕ ψ(m ⊕ ψ¹²(S))); finally
  * H ← f(H, L) and H ← f(H, Σ) where Σ is the mod-2²⁵⁶ byte sum of the
  * (zero-padded) message blocks. All 256-bit quantities are
  * little-endian byte arrays as in the standard. Validated against the
  * published CryptoPro test vectors in `Gost3411Spec`.
  */
object Gost3411 {

  // RFC 4357 id-GostR3411-94-CryptoProParamSet substitution boxes
  private val SBOX: Array[Array[Int]] = Array(
    Array(0xA, 0x4, 0x5, 0x6, 0x8, 0x1, 0x3, 0x7, 0xD, 0xC, 0xE, 0x0, 0x9, 0x2, 0xB, 0xF),
    Array(0x5, 0xF, 0x4, 0x0, 0x2, 0xD, 0xB, 0x9, 0x1, 0x7, 0x6, 0x3, 0xC, 0xE, 0xA, 0x8),
    Array(0x7, 0xF, 0xC, 0xE, 0x9, 0x4, 0x1, 0x0, 0x3, 0xB, 0x5, 0x2, 0x6, 0xA, 0x8, 0xD),
    Array(0x4, 0xA, 0x7, 0xC, 0x0, 0xF, 0x2, 0x8, 0xE, 0x1, 0x6, 0x5, 0xD, 0xB, 0x9, 0x3),
    Array(0x7, 0x6, 0x4, 0xB, 0x9, 0xC, 0x2, 0xA, 0x1, 0x8, 0x0, 0xE, 0xF, 0xD, 0x3, 0x5),
    Array(0x7, 0x6, 0x2, 0x4, 0xD, 0x9, 0xF, 0x0, 0xA, 0x1, 0x5, 0xB, 0x8, 0xE, 0xC, 0x3),
    Array(0xD, 0xE, 0x4, 0x1, 0x7, 0x0, 0x5, 0xA, 0x3, 0xC, 0x8, 0xF, 0x6, 0x2, 0x9, 0xB),
    Array(0x1, 0x3, 0xA, 0x9, 0x5, 0xB, 0x4, 0xF, 0x8, 0x6, 0x7, 0xE, 0xD, 0x0, 0x2, 0xC))

  /** The C3 key-generation constant (the standard's only nonzero C). */
  private val C3: Array[Byte] = Array(
    0x00, 0xFF, 0x00, 0xFF, 0x00, 0xFF, 0x00, 0xFF,
    0xFF, 0x00, 0xFF, 0x00, 0xFF, 0x00, 0xFF, 0x00,
    0x00, 0xFF, 0xFF, 0x00, 0xFF, 0x00, 0x00, 0xFF,
    0xFF, 0x00, 0x00, 0x00, 0xFF, 0xFF, 0x00, 0xFF).map(_.toByte)

  // ---- GOST 28147-89 (ECB encrypt, 32 rounds)

  private def g(x: Int): Int = {
    var y = 0
    var i = 0
    while (i < 8) { y |= SBOX(i)((x >>> (4 * i)) & 0xf) << (4 * i); i += 1 }
    (y << 11) | (y >>> 21)
  }

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def putLe32(v: Int, b: Array[Byte], off: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }

  /** Encrypt the 8-byte block at `in(inOff)` with the 256-bit key. */
  private def e(key: Array[Byte], in: Array[Byte], inOff: Int,
                out: Array[Byte], outOff: Int): Unit = {
    val k = Array.tabulate(8)(i => le32(key, 4 * i))
    var n1 = le32(in, inOff)
    var n2 = le32(in, inOff + 4)
    var r = 0
    while (r < 24) { val t = n1; n1 = n2 ^ g(n1 + k(r % 8)); n2 = t; r += 1 }
    var j = 7
    while (j > 0) { val t = n1; n1 = n2 ^ g(n1 + k(j)); n2 = t; j -= 1 }
    n2 ^= g(n1 + k(0))
    putLe32(n1, out, outOff)
    putLe32(n2, out, outOff + 4)
  }

  // ---- 34.11 key generation helpers

  /** P: out(4k+i) = in(8i+k). */
  private def p(in: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    var k = 0
    while (k < 8) {
      var i = 0
      while (i < 4) { out(4 * k + i) = in(8 * i + k); i += 1 }
      k += 1
    }
    out
  }

  /** A: out = in(8..31) ‖ (in(0..7) ⊕ in(8..15)). */
  private def a(in: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    System.arraycopy(in, 8, out, 0, 24)
    var j = 0
    while (j < 8) { out(24 + j) = (in(j) ^ in(8 + j)).toByte; j += 1 }
    out
  }

  private def xor(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 32) { out(i) = (x(i) ^ y(i)).toByte; i += 1 }
    out
  }

  /** ψ: 16 little-endian 16-bit words, new top word =
    * η0⊕η1⊕η2⊕η3⊕η12⊕η15, others shift down. */
  private def psi(in: Array[Byte]): Array[Byte] = {
    def w(i: Int) = (in(2 * i) & 0xff) | ((in(2 * i + 1) & 0xff) << 8)
    val top = w(0) ^ w(1) ^ w(2) ^ w(3) ^ w(12) ^ w(15)
    val out = new Array[Byte](32)
    System.arraycopy(in, 2, out, 0, 30)
    out(30) = top.toByte
    out(31) = (top >>> 8).toByte
    out
  }

  private def psiN(x: Array[Byte], n: Int): Array[Byte] = {
    var v = x
    var i = 0
    while (i < n) { v = psi(v); i += 1 }
    v
  }

  /** The compression function H ← f(H, m). */
  private def f(h: Array[Byte], m: Array[Byte]): Array[Byte] = {
    val s = new Array[Byte](32)
    var u = h
    var v = m
    var key = p(xor(u, v))
    e(key, h, 0, s, 0)
    var i = 1
    while (i <= 3) {
      u = a(u)
      if (i == 2) u = xor(u, C3)
      v = a(a(v))
      key = p(xor(u, v))
      e(key, h, 8 * i, s, 8 * i)
      i += 1
    }
    psiN(xor(h, psi(xor(m, psiN(s, 12)))), 61)
  }

  /** Σ ← Σ + m (mod 2²⁵⁶), little-endian byte order. */
  private def sumAdd(sum: Array[Byte], m: Array[Byte]): Unit = {
    var carry = 0
    var i = 0
    while (i < 32) {
      val t = (sum(i) & 0xff) + (m(i) & 0xff) + carry
      sum(i) = t.toByte
      carry = t >>> 8
      i += 1
    }
  }

  def digest(msg: Array[Byte]): Array[Byte] = {
    var h = new Array[Byte](32)
    val sum = new Array[Byte](32)
    var off = 0
    while (off + 32 <= msg.length) {
      val m = java.util.Arrays.copyOfRange(msg, off, off + 32)
      h = f(h, m)
      sumAdd(sum, m)
      off += 32
    }
    if (off < msg.length) { // zero-padded partial tail block
      val m = new Array[Byte](32)
      System.arraycopy(msg, off, m, 0, msg.length - off)
      h = f(h, m)
      sumAdd(sum, m)
    }
    val l = new Array[Byte](32)
    val bits = msg.length.toLong * 8
    var i = 0
    while (i < 8) { l(i) = (bits >>> (8 * i)).toByte; i += 1 }
    h = f(h, l)
    h = f(h, sum)
    h
  }
}
