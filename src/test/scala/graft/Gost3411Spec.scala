package graft

import graft.script.Gost3411

/** GOST R 34.11-94 (CryptoPro parameter set) against the published
  * test vectors for that parameter set. */
class Gost3411Spec extends org.scalatest.funsuite.AnyFunSuite {

  private def gost(s: String) =
    Gost3411.digest(s.getBytes("US-ASCII")).map(x => f"$x%02x").mkString

  test("empty string") {
    assert(gost("") ==
      "981e5f3ca30c841487830f84fb433e13ac1101569b9c13584ac483234cd656c0")
  }

  test("'a'") {
    assert(gost("a") ==
      "e74c52dd282183bf37af0079c9f78055715a103f17e3133ceff1aacf2f403011")
  }

  test("quick brown fox") {
    assert(gost("The quick brown fox jumps over the lazy dog") ==
      "9004294a361a508c586fe53d1f1b02746765e71b765472786e4770d565830a76")
  }

  test("message digest (multi-block boundary: 14 bytes, zero-padded)") {
    assert(gost("message digest") ==
      "bc6041dd2aa401ebfa6e9886734174febdb4729aa972d60f549ac39b29721ba0")
  }
}
