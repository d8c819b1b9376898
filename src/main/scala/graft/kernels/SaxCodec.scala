package graft.kernels

import graft.sources.WrapperCodec

/** Faithful SAX quantization + binary-SAX word codec
  * (script/SAXUtils.java).
  *
  * The reference does NOT use the rounded Lin et al. breakpoint table:
  * its interval bounds come from Peter Acklam's published rational
  * approximation of the inverse normal CDF (SAXUtils.getInvCDF:79-110,
  * coefficients from the public note at math.uio.no/~jacklam/notes/
  * invnorm) refined by one Halley step through erfc
  * (SAXUtils.refine:320-329). Alphabet-4 bounds are therefore
  * ±0.674489750196… and 0, not ±0.67 — values whose |z| lands between
  * 0.67 and 0.6745 quantize differently under the table approximation.
  *
  * Wire-format words are byte-compatible with the reference: symbols
  * are bit-INTERLEAVED (for each bit position MSB-first, one bit from
  * every symbol — SAXUtils.bSAX:508-553), zero-padded to whole bytes,
  * then OrderPreservingBase64-encoded (the same codec WRAP uses).
  *
  * Bounds are deterministic literals: the DuckDB oracles embed the
  * exact same doubles (shortest round-trip decimal form), so both
  * engines quantize identically.
  */
object SaxCodec {

  /** Max levels (log2 alphabet) — SAXUtils.SAX_MAX_LEVELS = 16. */
  val MaxLevels = 16

  // Acklam rational-approximation coefficients (published constants;
  // SAXUtils.java:60-77 uses the identical table).
  private val A = Array(-3.969683028665376e+01, 2.209460984245205e+02,
    -2.759285104469687e+02, 1.383577518672690e+02,
    -3.066479806614716e+01, 2.506628277459239e+00)
  private val B = Array(-5.447609879822406e+01, 1.615858368580409e+02,
    -1.556989798598866e+02, 6.680131188771972e+01,
    -1.328068155288572e+01)
  private val C = Array(-7.784894002430293e-03, -3.223964580411365e-01,
    -2.400758277161838e+00, -2.549732539343734e+00,
    4.374664141464968e+00, 2.938163982698783e+00)
  private val D = Array(7.784695709041462e-03, 3.224671290700398e-01,
    2.445134137142996e+00, 3.754408661907416e+00)

  private val PLow = 0.02425
  private val PHigh = 1.0 - PLow

  /** Inverse N(0,1) CDF — Acklam's approximation with the reference's
    * high-precision Halley refinement (SAXUtils.getInvCDF:79-110,
    * refine:320-329; erfc from commons-math3 in place of the
    * reference's embedded netlib-SPECFUN port — agreement to the last
    * couple of ulps, and both engines share OUR literals). */
  def getInvCDF(d: Double): Double = {
    require(!d.isNaN && d >= 0.0 && d <= 1.0, s"p out of range: $d")
    if (d == 0.0) return Double.NegativeInfinity
    if (d == 1.0) return Double.PositiveInfinity
    val z =
      if (d < PLow) {
        val q = math.sqrt(-2.0 * math.log(d))
        (((((C(0) * q + C(1)) * q + C(2)) * q + C(3)) * q + C(4)) * q + C(5)) /
          ((((D(0) * q + D(1)) * q + D(2)) * q + D(3)) * q + 1.0)
      } else if (d > PHigh) {
        val q = math.sqrt(-2.0 * math.log(1.0 - d))
        -(((((C(0) * q + C(1)) * q + C(2)) * q + C(3)) * q + C(4)) * q + C(5)) /
          ((((D(0) * q + D(1)) * q + D(2)) * q + D(3)) * q + 1.0)
      } else {
        val q = d - 0.5
        val r = q * q
        (((((A(0) * r + A(1)) * r + A(2)) * r + A(3)) * r + A(4)) * r + A(5)) * q /
          (((((B(0) * r + B(1)) * r + B(2)) * r + B(3)) * r + B(4)) * r + 1.0)
      }
    // one Halley step: e = Φ(z) − d via erfc, u = e·√(2π)·exp(z²/2)
    val e = 0.5 * org.apache.commons.math3.special.Erf.erfc(-z / math.sqrt(2.0)) - d
    val u = e * math.sqrt(2.0 * math.Pi) * math.exp(z * z / 2.0)
    z - u / (1.0 + z * u / 2.0)
  }

  /** n−1 bounds carving N(0,1) into n equal-probability intervals;
    * upper bound INCLUDED in its interval (SAXUtils.getBounds:342-355
    * — bounds[i] = invCDF((i+1)·(1/n)), same fp evaluation order). */
  def getBounds(n: Int): Array[Double] = {
    require(n >= 2, s"need at least 2 intervals: $n")
    val area = 1.0 / n
    Array.tabulate(n - 1)(i => getInvCDF((i + 1) * area))
  }

  private val boundsCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()

  /** Bounds for a 2^levels alphabet (cached like INVNORM_BOUNDS). */
  def boundsForLevels(levels: Int): Array[Double] = {
    require(levels >= 1 && levels <= MaxLevels, s"levels out of range: $levels")
    boundsCache.computeIfAbsent(levels, l => getBounds(1 << l))
  }

  /** SAX symbol of a value: index of the first bound ≥ value (exact
    * match maps DOWN into that bound's interval — SAXUtils.SAX:367-396,
    * Arrays.binarySearch semantics). */
  def sax(levels: Int, value: Double): Int = {
    val bounds = boundsForLevels(levels)
    val idx = java.util.Arrays.binarySearch(bounds, value)
    if (idx >= 0) idx else -idx - 1
  }

  /** log2 of a power-of-two alphabet size; rejects non-powers like the
    * reference word builders (MapperSAX.java:59-81, GTSHelper.bSAX). */
  def levelsOf(alphabetSize: Int): Int = {
    require(alphabetSize >= 2 && (alphabetSize & (alphabetSize - 1)) == 0,
      s"alphabet size MUST be a power of two >= 2: $alphabetSize")
    java.lang.Integer.numberOfTrailingZeros(alphabetSize)
  }

  /** Bit-interleaved binary SAX: for each bit position (MSB first) one
    * bit from every symbol, zero-padded to whole bytes
    * (SAXUtils.bSAX:508-553). */
  def bsaxBytes(levels: Int, symbols: Array[Int]): Array[Byte] = {
    val bitlen = levels * symbols.length
    val out = new Array[Byte](if (bitlen % 8 == 0) bitlen >>> 3 else 1 + (bitlen >>> 3))
    var acc = 0; var nbits = 0; var idx = 0
    var bit = 0
    while (bit < levels) {
      var w = 0
      while (w < symbols.length) {
        acc = (acc << 1) | ((symbols(w) >>> (levels - bit - 1)) & 0x1)
        nbits += 1
        if (nbits == 8) { out(idx) = (acc & 0xff).toByte; idx += 1; acc = 0; nbits = 0 }
        w += 1
      }
      bit += 1
    }
    if (idx < out.length) out(idx) = ((acc << (8 - nbits)) & 0xff).toByte
    out
  }

  /** The reference's wire word: OPB64(bSAX bits) — what PATTERNS emits
    * and PATTERNDETECTION matches on (GTSHelper.bSAX:9087). */
  def bsaxWord(levels: Int, symbols: Array[Int]): String =
    WrapperCodec.opb64Encode(bsaxBytes(levels, symbols))

  /** Every word of a (levels, wordLen) vocabulary indexed by the
    * base-alphabet integer Σ symbol_w · alphabet^(wordLen−1−w) — the
    * shared-literal table the DuckDB oracles look words up in. */
  def wordTable(levels: Int, wordLen: Int): IndexedSeq[String] = {
    val alphabet = 1 << levels
    val total = math.pow(alphabet, wordLen).toLong
    require(total <= 65536, s"word table too large: $total")
    (0L until total).map { v =>
      val symbols = new Array[Int](wordLen)
      var rest = v
      var w = wordLen - 1
      while (w >= 0) { symbols(w) = (rest % alphabet).toInt; rest /= alphabet; w -= 1 }
      bsaxWord(levels, symbols)
    }
  }
}
