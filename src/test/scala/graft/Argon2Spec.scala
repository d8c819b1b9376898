package graft

import graft.script.{Argon2, Blake2b}

/** BLAKE2b against RFC 7693's vector; Argon2 d/i/id against the RFC
  * 9106 §5 test vectors (p=4, T=32, m=32, t=3, v=0x13). */
class Argon2Spec extends org.scalatest.funsuite.AnyFunSuite {

  private def hex(b: Array[Byte]) = b.map(x => f"$x%02x").mkString

  test("BLAKE2b-512 of 'abc' (RFC 7693 appendix A)") {
    assert(hex(Blake2b.hash("abc".getBytes("US-ASCII"), 64)) ==
      "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1" +
      "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923")
  }

  test("BLAKE2b keyed + short outputs self-consistency") {
    val key = Array.tabulate(64)(_.toByte)
    val m = Array.tabulate(255)(_.toByte)
    assert(Blake2b.hash(m, 32, key).length == 32)
    assert(!Blake2b.hash(m, 32).sameElements(Blake2b.hash(m, 32, key)))
    // multi-block unkeyed (3 blocks + tail)
    assert(Blake2b.hash(Array.fill[Byte](400)(7), 64).length == 64)
  }

  private val pwd = Array.fill[Byte](32)(1)
  private val salt = Array.fill[Byte](16)(2)
  private val secret = Array.fill[Byte](8)(3)
  private val ad = Array.fill[Byte](12)(4)

  private def tag(tpe: Int) =
    hex(Argon2.hash(tpe, pwd, salt, secret, ad,
      passes = 3, memoryKb = 32, lanes = 4, outLen = 32))

  test("RFC 9106 §5.1 Argon2d") {
    assert(tag(Argon2.TypeD) ==
      "512b391b6f1162975371d30919734294f868e3be3984f3c1a13a4db9fabe4acb")
  }

  test("RFC 9106 §5.2 Argon2i") {
    assert(tag(Argon2.TypeI) ==
      "c814d9d1dc7f37aa13f0d77f2494bda1c8de6b016dd388d29952a4c4672b6ce8")
  }

  test("RFC 9106 §5.3 Argon2id") {
    assert(tag(Argon2.TypeId) ==
      "0d640df58d78766c08c037a34a8b53c9d01ef0452d75b65eb52520e96b01e659")
  }
}
