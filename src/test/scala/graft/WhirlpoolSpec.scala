package graft

import graft.script.Whirlpool

/** WHIRLPOOL against the specification's published test vectors
  * (ISO/IEC 10118-3 / the Barreto-Rijmen reference vectors). */
class WhirlpoolSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def hex(b: Array[Byte]) = b.map(x => f"$x%02x").mkString
  private def wp(s: String) = hex(Whirlpool.digest(s.getBytes("US-ASCII")))

  test("empty string") {
    assert(wp("") ==
      "19fa61d75522a4669b44e39c1d2e1726c530232130d407f89afee0964997f7a7" +
      "3e83be698b288febcf88e3e03c4f0757ea8964e59b63d93708b138cc42a66eb3")
  }

  test("'a' and 'abc'") {
    assert(wp("a") ==
      "8aca2602792aec6f11a67206531fb7d7f0dff59413145e6973c45001d0087b42" +
      "d11bc645413aeff63a42391a39145a591a92200d560195e53b478584fdae231a")
    assert(wp("abc") ==
      "4e2448a4c6f486bb16b6562c73b4020bf3043e3a731bce721ae1b303d97e6d4c" +
      "7181eebdb6c57e277d0e34957114cbd6c797fc9d95d8b582d225292076d4eef5")
  }

  test("quick brown fox") {
    assert(wp("The quick brown fox jumps over the lazy dog") ==
      "b97de512e91e3828b40d2b0fdce9ceb3c4a71f9bea8d88e75c4fa854df36725f" +
      "d2b52eb6544edcacd6f8beddfea403cb55ae31f03ad62a5ef54e42ee82c3fb35")
  }

  test("message digest and 64-byte boundary") {
    assert(wp("message digest") ==
      "378c84a4126e2dc6e56dcc7458377aac838d00032230f53ce1f5700c0ffb4d3b" +
      "8421557659ef55c106b4b52ac5a4aaa692ed920052838f3362e86dbd37a8903e")
    // exactly one padding-boundary case: 32 bytes (fits with length)
    assert(wp("12345678901234567890123456789012").length == 128)
  }
}
