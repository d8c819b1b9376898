package graft.sources

import javax.crypto.Cipher
import javax.crypto.spec.SecretKeySpec

/** AES key wrap of arbitrary byte blobs — the reference's metadata
  * encryption envelope (crypto/CryptoUtils.java:64-122: PKCS7-pad the
  * payload to an 8-byte multiple, then RFC 3394 AES key wrap).
  * Clean-room from RFC 3394 §2.2.1/§2.2.2 on JDK AES/ECB blocks; the
  * spec's §4 test vectors are pinned in `AesWrapSpec`.
  */
object AesWrap {

  private val IV: Long = 0xA6A6A6A6A6A6A6A6L

  private def cipher(key: Array[Byte], mode: Int): Cipher = {
    val c = Cipher.getInstance("AES/ECB/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"))
    c
  }

  private def getLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  private def putLong(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(off + i) = (v >>> (8 * (7 - i))).toByte; i += 1 }
  }

  /** RFC 3394 §2.2.1 wrap of an 8-byte-multiple payload. A single
    * 8-byte block (n = 1, outside the RFC's n ≥ 2 algorithm) uses the
    * one-AES-call shortcut the reference's BouncyCastle
    * RFC3394WrapEngine applies: C = AES(K, IV ∥ P₁). */
  def wrapRaw(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    require(data.length >= 8 && data.length % 8 == 0,
      s"AES key wrap needs full 8-byte blocks, got ${data.length}")
    val enc = cipher(key, Cipher.ENCRYPT_MODE)
    if (data.length == 8) {
      val block = new Array[Byte](16)
      putLong(block, 0, IV)
      System.arraycopy(data, 0, block, 8, 8)
      return enc.doFinal(block)
    }
    val n = data.length / 8
    var a = IV
    val r = new Array[Long](n + 1) // 1-based
    (1 to n).foreach(i => r(i) = getLong(data, (i - 1) * 8))
    val block = new Array[Byte](16)
    for (j <- 0 to 5; i <- 1 to n) {
      putLong(block, 0, a); putLong(block, 8, r(i))
      val b = enc.doFinal(block)
      a = getLong(b, 0) ^ (n.toLong * j + i)
      r(i) = getLong(b, 8)
    }
    val out = new Array[Byte]((n + 1) * 8)
    putLong(out, 0, a)
    (1 to n).foreach(i => putLong(out, i * 8, r(i)))
    out
  }

  /** RFC 3394 §2.2.2 unwrap; None when the integrity check fails.
    * A 16-byte input is the n = 1 single-block shortcut. */
  def unwrapRaw(key: Array[Byte], data: Array[Byte]): Option[Array[Byte]] = {
    if (data.length < 16 || data.length % 8 != 0) return None
    val dec = cipher(key, Cipher.DECRYPT_MODE)
    if (data.length == 16) {
      val b = dec.doFinal(data)
      return if (getLong(b, 0) != IV) None
        else Some(java.util.Arrays.copyOfRange(b, 8, 16))
    }
    val n = data.length / 8 - 1
    var a = getLong(data, 0)
    val r = new Array[Long](n + 1)
    (1 to n).foreach(i => r(i) = getLong(data, i * 8))
    val block = new Array[Byte](16)
    for (j <- 5 to 0 by -1; i <- n to 1 by -1) {
      putLong(block, 0, a ^ (n.toLong * j + i)); putLong(block, 8, r(i))
      val b = dec.doFinal(block)
      a = getLong(b, 0)
      r(i) = getLong(b, 8)
    }
    if (a != IV) None
    else {
      val out = new Array[Byte](n * 8)
      (1 to n).foreach(i => putLong(out, (i - 1) * 8, r(i)))
      Some(out)
    }
  }

  /** The reference envelope: PKCS7-pad to the next 8-byte boundary
    * (always 1..8 bytes of padding, CryptoUtils.java:70-76), wrap. */
  def wrap(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val pad = 8 - data.length % 8
    val padded = java.util.Arrays.copyOf(data, data.length + pad)
    java.util.Arrays.fill(padded, data.length, padded.length, pad.toByte)
    wrapRaw(key, padded)
  }

  /** Unwrap + unpad; None on integrity or padding failure. */
  def unwrap(key: Array[Byte], data: Array[Byte]): Option[Array[Byte]] =
    unwrapRaw(key, data).flatMap { padded =>
      val pad = padded.last & 0xff
      if (pad < 1 || pad > 8 || pad > padded.length) None
      else if (!(padded.length - pad until padded.length)
        .forall(i => (padded(i) & 0xff) == pad)) None
      else Some(java.util.Arrays.copyOf(padded, padded.length - pad))
    }
}
