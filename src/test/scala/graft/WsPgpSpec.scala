package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.PgpVectors._
import graft.script.{OpenPgp, WarpScriptEngine}

/** PGP word family against GnuPG 2.2.40 cross-vectors: ring parsing,
  * fingerprints/key ids, gpg-made detached-signature verification,
  * gpg-made PKESK+SEIPD decryption, passphrase-protected (S2K) key
  * unlock, our own sign→verify and encrypt→decrypt round-trips, and
  * the word-level stack contracts. */
class WsPgpSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def eng = new WarpScriptEngine(
    (_, _, _, _) => throw new IllegalStateException("no fetch"), nowTs = 1706659200000000L)

  test("PGPRING parses gpg public and secret rings with correct key ids") {
    val e = eng
    val st = e.run(s"'$PUB' HEX-> PGPRING")
    val rings = st.head.asInstanceOf[Vector[Any]]
    assert(rings.length == 1)
    val pr = rings.head.asInstanceOf[OpenPgp.PubRing]
    assert(pr.keys.map(_.keyIdHex) == Vector("FDDA1D005B9051CF", "036809140CD3F8EC"))
    assert(pr.keys.head.fingerprint.map(b => f"$b%02X").mkString ==
      "8DF368B9C4313C6D937412F4FDDA1D005B9051CF")
    assert(pr.keys.head.uids.map(new String(_, StandardCharsets.UTF_8)) ==
      Vector("Graft Test <graft@example.org>"))
    val sr = e.run(s"'$SEC' HEX-> PGPRING").head.asInstanceOf[Vector[Any]]
      .head.asInstanceOf[OpenPgp.SecRing]
    assert(sr.keys.map(_.pub.keyIdHex) == Vector("FDDA1D005B9051CF", "036809140CD3F8EC"))
  }

  test("a gpg detached SHA-256 signature verifies; tampered data does not") {
    val pub = OpenPgp.parseRings(hex(PUB)).head.asInstanceOf[OpenPgp.PubRing].keys.head
    assert(OpenPgp.verifyDetached(pub, MSG.getBytes(StandardCharsets.UTF_8), hex(SIG)))
    assert(!OpenPgp.verifyDetached(pub, (MSG + "!").getBytes(StandardCharsets.UTF_8), hex(SIG)))
    assert(OpenPgp.sigIssuer(hex(SIG)) == pub.keyId)
  }

  test("a gpg PKESK+SEIPD message decrypts to the plaintext") {
    val sr = OpenPgp.parseRings(hex(SEC)).head.asInstanceOf[OpenPgp.SecRing]
    val sub = sr.keys(1).unlock("") // encryption subkey, unprotected
    val plain = OpenPgp.decrypt(sub, hex(ENC))
    assert(new String(plain, StandardCharsets.UTF_8) == MSG)
  }

  test("a passphrase-protected secret key unlocks with the right passphrase only") {
    val sr = OpenPgp.parseRings(hex(SEC_LOCKED)).head.asInstanceOf[OpenPgp.SecRing]
    val mat = sr.keys.head.unlock("secret123")
    // signing with the unlocked key round-trips
    val sig = OpenPgp.signDetached(mat, "x".getBytes, "SHA256", 1706659200L)
    assert(OpenPgp.verifyDetached(sr.keys.head.pub, "x".getBytes, sig))
    intercept[Exception] { sr.keys.head.unlock("wrong") }
  }

  test("our detached signature round-trips and matches gpg's packet grammar") {
    val sr = OpenPgp.parseRings(hex(SEC)).head.asInstanceOf[OpenPgp.SecRing]
    val pub = sr.keys.head.pub
    val sig = OpenPgp.signDetached(sr.keys.head.unlock(""),
      MSG.getBytes(StandardCharsets.UTF_8), "SHA512", 1706659200L)
    assert(OpenPgp.verifyDetached(pub, MSG.getBytes(StandardCharsets.UTF_8), sig))
    assert(OpenPgp.sigIssuer(sig) == pub.keyId)
    // v4, binary doc, RSA, SHA-512 header bytes of the packet body
    val body = OpenPgp.packets(sig).head._2
    assert((body(0) & 0xff) == 4 && (body(1) & 0xff) == 0 &&
      (body(2) & 0xff) == 1 && (body(3) & 0xff) == 10)
  }

  test("our encrypt→decrypt round-trips (anonymous and keyed recipients)") {
    val sr = OpenPgp.parseRings(hex(SEC)).head.asInstanceOf[OpenPgp.SecRing]
    val sub = sr.keys(1)
    val rnd = new java.util.Random(7L)
    val data = "round trip payload × UTF-8".getBytes(StandardCharsets.UTF_8)
    val anon = OpenPgp.encrypt(sub.pub, data, rnd, throwKeyId = true)
    assert(java.util.Arrays.equals(OpenPgp.decrypt(sub.unlock(""), anon), data))
    val keyed = OpenPgp.encrypt(sub.pub, data, rnd, throwKeyId = false)
    assert(java.util.Arrays.equals(OpenPgp.decrypt(sub.unlock(""), keyed), data))
    // keyed message names the subkey; wrong key must refuse
    intercept[Exception] { OpenPgp.decrypt(sr.keys.head.unlock(""), keyed) }
  }

  test("PGPSIGN/PGPVERIFY words: detached and one-pass forms") {
    val e = eng
    val out = e.run(
      s"""'$MSG'
         |'$SEC' HEX-> PGPRING 0 GET 'ring' STORE
         |{ 'keyring' $$ring 'keyid' 'FDDA1D005B9051CF' 'passphrase' ''
         |  'digest' 'SHA256' } PGPSIGN
         |'sig' STORE
         |'$MSG' $$sig '$PUB' HEX-> PGPRING 0 GET 'FDDA1D005B9051CF' true PGPVERIFY""".stripMargin)
    assert(out.head == true)
    // one-pass (detached false): verify pushes data then validity
    val out2 = e.run(
      s"""'$MSG'
         |'$SEC' HEX-> PGPRING 0 GET 'ring' STORE
         |{ 'keyring' $$ring 'keyid' 'FDDA1D005B9051CF' 'passphrase' ''
         |  'detached' false 'armor' false } PGPSIGN
         |'$PUB' HEX-> PGPRING 0 GET 'FDDA1D005B9051CF' PGPVERIFY""".stripMargin)
    assert(out2.head == true)
    assert(new String(out2(1).asInstanceOf[Array[Byte]], StandardCharsets.UTF_8) == MSG)
  }

  test("PGPENCRYPT/PGPDECRYPT words round-trip through armor") {
    val e = eng
    val out = e.run(
      s"""'$SEC' HEX-> PGPRING 0 GET 'ring' STORE
         |'payload' { 'keyring' $$ring 'recipient' '036809140CD3F8EC' } PGPENCRYPT
         |$$ring '036809140CD3F8EC' '' PGPDECRYPT""".stripMargin)
    assert(new String(out.head.asInstanceOf[Array[Byte]], StandardCharsets.UTF_8) == "payload")
  }

  test("PGPINFO/PGPPUBLIC/PGPPRIVATE word surfaces") {
    val e = eng
    val info = e.run(s"'$SEC' HEX-> PGPRING 0 GET PGPINFO")
      .head.asInstanceOf[Map[Any, Any]]
    val master = info("FDDA1D005B9051CF").asInstanceOf[Map[Any, Any]]
    assert(master("master") == true && master("bits") == 2048L)
    assert(master("fingerprint") == "8df368b9c4313c6d937412f4fdda1d005b9051cf")
    val ids = e.run(s"'$SEC' HEX-> PGPRING 0 GET PGPPRIVATE").head
    assert(ids == Vector("FDDA1D005B9051CF", "036809140CD3F8EC"))
    val armored = e.run(
      s"'$PUB' HEX-> PGPRING 0 GET 'FDDA1D005B9051CF' PGPPUBLIC PGPPUBLIC PGPPUBLIC").head
    // armored key re-parses to the same key id via the blob overload
    val m = armored.asInstanceOf[Map[Any, Any]]
    assert(m.contains("FDDA1D005B9051CF"))
  }

  test("a two-recipient gpg message decrypts when our PKESK is not first") {
    val sr = OpenPgp.parseRings(hex(SEC)).head.asInstanceOf[OpenPgp.SecRing]
    // locked@'s PKESK precedes ours (gpg -r locked -r graft)
    val plain = OpenPgp.decrypt(sr.keys(1).unlock(""), hex(ENC2))
    assert(new String(plain, StandardCharsets.UTF_8) == MSG)
    // a key that matches NO pkesk reports all candidate ids
    val err = intercept[IllegalArgumentException] {
      OpenPgp.decrypt(sr.keys.head.unlock(""), hex(ENC2))
    }
    assert(err.getMessage.contains("message is for key"))
  }

  test("a gpg SHA-224 detached signature verifies") {
    val pub = OpenPgp.parseRings(hex(PUB)).head.asInstanceOf[OpenPgp.PubRing].keys.head
    assert(OpenPgp.verifyDetached(pub, MSG.getBytes(StandardCharsets.UTF_8), hex(SIG224)))
    assert(!OpenPgp.verifyDetached(pub, (MSG + ".").getBytes(StandardCharsets.UTF_8), hex(SIG224)))
  }

  test("armor encode/decode round-trips with CRC24") {
    val data = Array.tabulate[Byte](300)(i => (i * 7).toByte)
    val a = OpenPgp.armor("MESSAGE", data)
    assert(a.startsWith("-----BEGIN PGP MESSAGE-----"))
    assert(java.util.Arrays.equals(OpenPgp.dearmor(a), data))
    // gpg's own armored output parses too (sig vector re-armored)
    assert(java.util.Arrays.equals(OpenPgp.dearmor(OpenPgp.armor("SIGNATURE", hex(SIG))), hex(SIG)))
  }
}
