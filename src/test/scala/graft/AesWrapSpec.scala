package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AesWrap

/** RFC 3394 AES key wrap + the reference's PKCS7-to-8 envelope
  * (crypto/CryptoUtils.java:64-122), pinned against the RFC's own §4
  * test vectors. */
class AesWrapSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def toHex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02X").mkString

  test("RFC 3394 §4.1: 128-bit data with 128-bit KEK") {
    val kek = hex("000102030405060708090A0B0C0D0E0F")
    val data = hex("00112233445566778899AABBCCDDEEFF")
    val wrapped = AesWrap.wrapRaw(kek, data)
    assert(toHex(wrapped) ==
      "1FA68B0A8112B447AEF34BD8FB5A7B829D3E862371D2CFE5")
    assert(AesWrap.unwrapRaw(kek, wrapped).map(toHex).contains(toHex(data)))
  }

  test("RFC 3394 §4.6: 256-bit data with 256-bit KEK") {
    val kek = hex("000102030405060708090A0B0C0D0E0F" +
      "101112131415161718191A1B1C1D1E1F")
    val data = hex("00112233445566778899AABBCCDDEEFF" +
      "000102030405060708090A0B0C0D0E0F")
    val wrapped = AesWrap.wrapRaw(kek, data)
    assert(toHex(wrapped) == "28C9F404C4B810F4CBCCB35CFB87F826" +
      "3F5786E2D80ED326CBC7F0E71A99F43BFB988B9B7A02DD21")
    assert(AesWrap.unwrapRaw(kek, wrapped).map(toHex).contains(toHex(data)))
  }

  test("PKCS7 envelope round-trips every length mod 8, incl. full-pad " +
    "and the n=1 single-block shortcut (tiny metadata)") {
    val kek = hex("000102030405060708090A0B0C0D0E0F")
    (1 to 24).foreach { n =>
      val data = Array.tabulate(n)(i => (i * 7 + 3).toByte)
      val w = AesWrap.wrap(kek, data)
      assert(w.length == ((n / 8) + 2) * 8) // pad to next boundary + IV block
      assert(AesWrap.unwrap(kek, w).map(_.toSeq).contains(data.toSeq))
    }
    // bare n=1 raw block (BouncyCastle RFC3394WrapEngine shortcut shape:
    // one AES call, 16-byte output)
    val one = hex("0011223344556677")
    val w1 = AesWrap.wrapRaw(kek, one)
    assert(w1.length == 16)
    assert(AesWrap.unwrapRaw(kek, w1).map(toHex).contains(toHex(one)))
    assert(AesWrap.unwrapRaw(hex("FF0102030405060708090A0B0C0D0E0F"), w1).isEmpty)
  }

  test("tampered ciphertext and wrong key fail the integrity check") {
    val kek = hex("000102030405060708090A0B0C0D0E0F")
    val w = AesWrap.wrap(kek, Array.tabulate(20)(_.toByte))
    val tampered = w.clone(); tampered(3) = (tampered(3) ^ 1).toByte
    assert(AesWrap.unwrap(kek, tampered).isEmpty)
    assert(AesWrap.unwrap(new Array[Byte](16), w).isEmpty)
  }
}
