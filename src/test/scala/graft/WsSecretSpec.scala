package graft

import graft.script.WarpScriptEngine

/** RSAGEN and Shamir secret sharing round-trips. */
class WsSecretSpec extends SparkSpec {

  private def eng = new WarpScriptEngine(
    fetch = (_, _, _, _) => throw new UnsupportedOperationException("no storage"),
    nowTs = 0L, session = Some(spark))

  private def top(p: String): Any = eng.run(p).head

  test("RSAGEN produces a working keypair for SIGN/VERIFY") {
    val ok = top(
      """'65537' 1024 RSAGEN 'pub' STORE 'priv' STORE
        |'hello' 'SHA256withRSA' $priv RSAPRIVATE RSASIGN 'sig' STORE
        |'hello' $sig 'SHA256withRSA' $pub RSAPUBLIC RSAVERIFY""".stripMargin)
    assert(ok == true)
  }

  test("->SSSS / SSSS-> round-trip with exactly k shares") {
    // 5 shares, threshold 3; reconstruct from shares 0, 2, 4
    val out = top(
      """'the quick brown fox' 'UTF-8' ->BYTES 5 3 ->SSSS 's' STORE
        |[ $s 0 GET $s 2 GET $s 4 GET ] SSSS-> 'UTF-8' BYTES->""".stripMargin)
    assert(out == "the quick brown fox")
    // also from a different subset
    val out2 = top(
      """'topsecret' 'UTF-8' ->BYTES 4 2 ->SSSS 's' STORE
        |[ $s 1 GET $s 3 GET ] SSSS-> 'UTF-8' BYTES->""".stripMargin)
    assert(out2 == "topsecret")
  }

  test("SSSS shares alone do not reveal the secret (k-1 shares differ)") {
    val got = top(
      """'secret12' 'UTF-8' ->BYTES 3 3 ->SSSS 's' STORE
        |[ $s 0 GET $s 1 GET ] SSSS-> 'UTF-8' BYTES->""".stripMargin)
    // reconstruction from k-1 shares yields garbage (astronomically
    // unlikely to equal the secret)
    assert(got != "secret12")
  }
}
