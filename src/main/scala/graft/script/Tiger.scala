package graft.script

/** Clean-room Tiger hash (Anderson & Biham, FSE 1996; the reference
  * wraps BouncyCastle's TigerDigest, WarpScriptLib.java:2304).
  *
  * Everything below is re-derived from the public specification — the
  * four 256×64-bit S-boxes are NOT transcribed: they are regenerated at
  * class-init by the paper's published bootstrap procedure (fill each
  * table entry's every byte with its index, then for 5 passes permute
  * byte columns using a state evolved by the — self-referential —
  * compression function over the 64-byte seed string "Tiger - A Fast
  * New Hash Function, by Ross Anderson and Eli Biham"). The round
  * structure is the spec's three passes (multipliers 5/7/9) of eight
  * rotating rounds with the in-between key schedule, MD4-style 0x01
  * padding and little-endian 64-bit length. Validated in `TigerSpec`
  * against the published test vectors ("", "abc", "Tiger") and the
  * published first S-box entries (t1[0]=02AAB17CF7E90C5E,
  * t1[1]=AC424B03E243A8EC).
  */
object Tiger {

  @inline private def getByte(v: Long, col: Int): Int =
    ((v >>> (8 * col)) & 0xffL).toInt
  @inline private def setByte(v: Long, col: Int, b: Long): Long =
    (v & ~(0xffL << (8 * col))) | ((b & 0xffL) << (8 * col))

  /** One compression of 8 little-endian message words into state.
    * Eight rounds per pass rotate (a,b,c) one step left, so three
    * passes are exactly the spec's pass(a,b,c)/pass(c,a,b)/pass(b,c,a)
    * role sequence with naming restored (3×8 ≡ 0 mod 3) for the
    * feed-forward a^=aa, b-=bb, c+=cc.
    */
  private def compress(x: Array[Long], state: Array[Long], t: Array[Long]): Unit = {
    var a = state(0); var b = state(1); var c = state(2)
    val aa = a; val bb = b; val cc = c
    val w = new Array[Long](8)
    System.arraycopy(x, 0, w, 0, 8)
    var pass = 0
    while (pass < 3) {
      if (pass != 0) keySchedule(w)
      val mul = if (pass == 0) 5L else if (pass == 1) 7L else 9L
      var i = 0
      while (i < 8) {
        c ^= w(i)
        a -= t(getByte(c, 0)) ^ t(256 + getByte(c, 2)) ^
             t(512 + getByte(c, 4)) ^ t(768 + getByte(c, 6))
        b += t(768 + getByte(c, 1)) ^ t(512 + getByte(c, 3)) ^
             t(256 + getByte(c, 5)) ^ t(getByte(c, 7))
        b *= mul
        val tmp = a; a = b; b = c; c = tmp
        i += 1
      }
      pass += 1
    }
    state(0) = a ^ aa
    state(1) = b - bb
    state(2) = c + cc
  }

  private def keySchedule(x: Array[Long]): Unit = {
    x(0) -= x(7) ^ 0xA5A5A5A5A5A5A5A5L
    x(1) ^= x(0)
    x(2) += x(1)
    x(3) -= x(2) ^ ((~x(1)) << 19)
    x(4) ^= x(3)
    x(5) += x(4)
    x(6) -= x(5) ^ ((~x(4)) >>> 23)
    x(7) ^= x(6)
    x(0) += x(7)
    x(1) -= x(0) ^ ((~x(7)) << 19)
    x(2) ^= x(1)
    x(3) += x(2)
    x(4) -= x(3) ^ ((~x(2)) >>> 23)
    x(5) ^= x(4)
    x(6) += x(5)
    x(7) -= x(6) ^ 0x0123456789ABCDEFL
  }

  private def toBlock(buf: Array[Byte], off: Int): Array[Long] = {
    val w = new Array[Long](8)
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        w(i) |= (buf(off + 8 * i + j) & 0xffL) << (8 * j)
        j += 1
      }
      i += 1
    }
    w
  }

  /** The four S-boxes as one 1024-entry array, regenerated per spec
    * (5 bootstrap passes). Exposed for the spec's constant check.
    */
  private[graft] val table: Array[Long] = {
    val t = new Array[Long](1024)
    val msg = "Tiger - A Fast New Hash Function, by Ross Anderson and Eli Biham"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    require(msg.length == 64)
    val block = toBlock(msg, 0)
    val state = Array(0x0123456789ABCDEFL, 0xFEDCBA9876543210L, 0xF096A5B4C3B2E187L)
    var i = 0
    while (i < 1024) {
      var col = 0
      while (col < 8) { t(i) = setByte(t(i), col, i & 0xff); col += 1 }
      i += 1
    }
    var abc = 2
    var cnt = 0
    while (cnt < 5) {
      i = 0
      while (i < 256) {
        var sb = 0
        while (sb < 1024) {
          abc += 1
          if (abc == 3) { abc = 0; compress(block, state, t) }
          var col = 0
          while (col < 8) {
            val other = sb + getByte(state(abc), col)
            val tmp = getByte(t(sb + i), col)
            t(sb + i) = setByte(t(sb + i), col, getByte(t(other), col))
            t(other) = setByte(t(other), col, tmp)
            col += 1
          }
          sb += 256
        }
        i += 1
      }
      cnt += 1
    }
    t
  }

  /** 24-byte Tiger digest (original 0x01 padding, as BouncyCastle's
    * TigerDigest which the reference registers — not Tiger2's 0x80).
    */
  def digest(msg: Array[Byte]): Array[Byte] = {
    val state = Array(0x0123456789ABCDEFL, 0xFEDCBA9876543210L, 0xF096A5B4C3B2E187L)
    val full = msg.length / 64
    var blk = 0
    while (blk < full) { compress(toBlock(msg, blk * 64), state, table); blk += 1 }
    val rem = msg.length - full * 64
    val tail = new Array[Byte](if (rem <= 55) 64 else 128)
    System.arraycopy(msg, full * 64, tail, 0, rem)
    tail(rem) = 0x01
    val bits = msg.length.toLong << 3
    var j = 0
    while (j < 8) { tail(tail.length - 8 + j) = (bits >>> (8 * j)).toByte; j += 1 }
    blk = 0
    while (blk < tail.length / 64) { compress(toBlock(tail, blk * 64), state, table); blk += 1 }
    val out = new Array[Byte](24)
    var i = 0
    while (i < 3) {
      j = 0
      while (j < 8) { out(8 * i + j) = (state(i) >>> (8 * j)).toByte; j += 1 }
      i += 1
    }
    out
  }
}
