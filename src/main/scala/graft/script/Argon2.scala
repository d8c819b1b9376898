package graft.script

/** Clean-room Argon2 (RFC 9106, version 0x13): types d/i/id, the
  * BlaMka G compression, data-(in)dependent addressing, multi-lane
  * fill, and the variable-length H' built on [[Blake2b]]. The
  * reference delegates to BouncyCastle's Argon2BytesGenerator
  * (fn ARGON2, script/functions/ARGON2.java). Validated against the
  * RFC's Argon2d/i/id test vectors in `Argon2Spec`.
  */
object Argon2 {

  val TypeD = 0
  val TypeI = 1
  val TypeId = 2

  private final val Version = 0x13
  private final val BlockBytes = 1024
  private final val QwordsPerBlock = 128
  private final val SyncPoints = 4

  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  /** H'(X, outLen): Blake2b when short, 64-byte chain emitting 32
    * bytes per link when long (RFC 9106 §3.3). */
  private def hPrime(x: Array[Byte], outLen: Int): Array[Byte] = {
    val pre = le32(outLen) ++ x
    if (outLen <= 64) Blake2b.hash(pre, outLen)
    else {
      val out = new Array[Byte](outLen)
      var v = Blake2b.hash(pre, 64)
      var off = 0
      while (outLen - off > 64) {
        System.arraycopy(v, 0, out, off, 32)
        off += 32
        v = Blake2b.hash(v, 64)
      }
      System.arraycopy(v, 0, out, off, outLen - off)
      out
    }
  }

  /** BlaMka mixing: the Blake2b G with `a+b` replaced by
    * a + b + 2·trunc32(a)·trunc32(b). */
  private def blamka(v: Array[Long], a: Int, b: Int, c: Int, d: Int): Unit = {
    def mix(x: Long, y: Long): Long =
      x + y + 2L * (x & 0xffffffffL) * (y & 0xffffffffL)
    def rotr(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))
    v(a) = mix(v(a), v(b)); v(d) = rotr(v(d) ^ v(a), 32)
    v(c) = mix(v(c), v(d)); v(b) = rotr(v(b) ^ v(c), 24)
    v(a) = mix(v(a), v(b)); v(d) = rotr(v(d) ^ v(a), 16)
    v(c) = mix(v(c), v(d)); v(b) = rotr(v(b) ^ v(c), 63)
  }

  private def permute(v: Array[Long]): Unit = {
    blamka(v, 0, 4, 8, 12); blamka(v, 1, 5, 9, 13)
    blamka(v, 2, 6, 10, 14); blamka(v, 3, 7, 11, 15)
    blamka(v, 0, 5, 10, 15); blamka(v, 1, 6, 11, 12)
    blamka(v, 2, 7, 8, 13); blamka(v, 3, 4, 9, 14)
  }

  /** G(x, y) → out (1024-byte blocks as 128-long arrays). */
  private def gBlock(x: Array[Long], y: Array[Long], out: Array[Long]): Unit = {
    val r = new Array[Long](QwordsPerBlock)
    var i = 0
    while (i < QwordsPerBlock) { r(i) = x(i) ^ y(i); i += 1 }
    val z = r.clone()
    val v = new Array[Long](16)
    // rows: 8 stripes of 16 consecutive qwords
    i = 0
    while (i < 8) {
      System.arraycopy(z, 16 * i, v, 0, 16)
      permute(v)
      System.arraycopy(v, 0, z, 16 * i, 16)
      i += 1
    }
    // columns: v = (z[2j], z[2j+1], z[2j+16], z[2j+17], ...)
    var j = 0
    while (j < 8) {
      var k = 0
      while (k < 8) { v(2 * k) = z(2 * j + 16 * k); v(2 * k + 1) = z(2 * j + 16 * k + 1); k += 1 }
      permute(v)
      k = 0
      while (k < 8) { z(2 * j + 16 * k) = v(2 * k); z(2 * j + 16 * k + 1) = v(2 * k + 1); k += 1 }
      j += 1
    }
    i = 0
    while (i < QwordsPerBlock) { out(i) = z(i) ^ r(i); i += 1 }
  }

  private def blockToBytes(b: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](BlockBytes)
    var i = 0
    while (i < QwordsPerBlock) {
      var j = 0
      while (j < 8) { out(8 * i + j) = (b(i) >>> (8 * j)).toByte; j += 1 }
      i += 1
    }
    out
  }

  private def bytesToBlock(b: Array[Byte]): Array[Long] = {
    val out = new Array[Long](QwordsPerBlock)
    var i = 0
    while (i < QwordsPerBlock) {
      var v = 0L
      var j = 7
      while (j >= 0) { v = (v << 8) | (b(8 * i + j) & 0xffL); j -= 1 }
      out(i) = v
      i += 1
    }
    out
  }

  /** The full KDF. `memoryKb` is m, `lanes` is p, `passes` is t. */
  def hash(tpe: Int, password: Array[Byte], salt: Array[Byte],
           secret: Array[Byte], additional: Array[Byte],
           passes: Int, memoryKb: Int, lanes: Int, outLen: Int): Array[Byte] = {
    require(lanes >= 1 && passes >= 1 && memoryKb >= 8 * lanes,
      s"ARGON2: invalid parameters t=$passes m=$memoryKb p=$lanes")
    // H0
    val h0input =
      le32(lanes) ++ le32(outLen) ++ le32(memoryKb) ++ le32(passes) ++
      le32(Version) ++ le32(tpe) ++
      le32(password.length) ++ password ++
      le32(salt.length) ++ salt ++
      le32(secret.length) ++ secret ++
      le32(additional.length) ++ additional
    val h0 = Blake2b.hash(h0input, 64)

    val mPrime = SyncPoints * lanes * (memoryKb / (SyncPoints * lanes))
    val q = mPrime / lanes // columns per lane
    val segLen = q / SyncPoints
    val mem = Array.ofDim[Array[Long]](lanes, q)
    var lane = 0
    while (lane < lanes) {
      mem(lane)(0) = bytesToBlock(hPrime(h0 ++ le32(0) ++ le32(lane), BlockBytes))
      mem(lane)(1) = bytesToBlock(hPrime(h0 ++ le32(1) ++ le32(lane), BlockBytes))
      lane += 1
    }

    val zeroBlock = new Array[Long](QwordsPerBlock)
    var pass = 0
    while (pass < passes) {
      var slice = 0
      while (slice < SyncPoints) {
        lane = 0
        while (lane < lanes) {
          // data-independent address stream (Argon2i, and Argon2id in
          // the first half of pass 0)
          val independent =
            tpe == TypeI || (tpe == TypeId && pass == 0 && slice < 2)
          var addrBlock: Array[Long] = null
          var addrCounter = 0L
          // each address block holds 128 (J1,J2) pairs, one per qword;
          // the pair for segment index `idx` is entry idx%128 of block
          // ceil((idx+1)/128) — skipped initial blocks still consume
          // their address slots
          def jFor(idx: Int): (Long, Long) = {
            val blockNum = idx / QwordsPerBlock + 1L
            if (addrBlock == null || blockNum != addrCounter) {
              addrCounter = blockNum
              val in = new Array[Long](QwordsPerBlock)
              in(0) = pass.toLong; in(1) = lane.toLong; in(2) = slice.toLong
              in(3) = mPrime.toLong; in(4) = passes.toLong; in(5) = tpe.toLong
              in(6) = addrCounter
              val t1 = new Array[Long](QwordsPerBlock)
              addrBlock = new Array[Long](QwordsPerBlock)
              gBlock(zeroBlock, in, t1)
              gBlock(zeroBlock, t1, addrBlock)
            }
            val v = addrBlock(idx % QwordsPerBlock)
            (v & 0xffffffffL, (v >>> 32) & 0xffffffffL)
          }
          var idx = if (pass == 0 && slice == 0) 2 else 0
          while (idx < segLen) {
            val col = slice * segLen + idx
            val prevCol = (col - 1 + q) % q
            val prev = mem(lane)(prevCol)
            val (j1, j2) =
              if (independent) jFor(idx)
              else (prev(0) & 0xffffffffL, (prev(0) >>> 32) & 0xffffffffL)
            val refLane =
              if (pass == 0 && slice == 0) lane
              else (j2 % lanes).toInt
            val sameLane = refLane == lane
            val refArea: Long =
              if (pass == 0) {
                if (slice == 0) idx - 1L
                else if (sameLane) slice.toLong * segLen + idx - 1
                else slice.toLong * segLen - (if (idx == 0) 1 else 0)
              } else {
                if (sameLane) q.toLong - segLen + idx - 1
                else q.toLong - segLen - (if (idx == 0) 1 else 0)
              }
            val x = (j1 * j1) >>> 32
            val y = (refArea * x) >>> 32
            val zz = refArea - 1 - y
            val startPos =
              if (pass == 0) 0
              else ((slice + 1) % SyncPoints) * segLen
            val refCol = ((startPos + zz) % q).toInt
            val ref = mem(refLane)(refCol)
            val out = new Array[Long](QwordsPerBlock)
            gBlock(prev, ref, out)
            if (pass > 0) { // version 0x13: XOR with the overwritten block
              val old = mem(lane)(col)
              var i = 0
              while (i < QwordsPerBlock) { out(i) ^= old(i); i += 1 }
            }
            mem(lane)(col) = out
            idx += 1
          }
          lane += 1
        }
        slice += 1
      }
      pass += 1
    }

    val c = mem(0)(q - 1).clone()
    lane = 1
    while (lane < lanes) {
      var i = 0
      while (i < QwordsPerBlock) { c(i) ^= mem(lane)(q - 1)(i); i += 1 }
      lane += 1
    }
    hPrime(blockToBytes(c), outLen)
  }
}
