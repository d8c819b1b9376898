package graft.script

import java.math.BigInteger
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Clean-room OpenPGP (RFC 4880) subset backing the PGP* words.
  *
  * The reference wraps BouncyCastle (fn/PGPSIGN.java etc.); nothing of
  * that library ships in the reference repo, so this is an independent
  * implementation of the published message format: packet framing (old
  * + new formats), v4 RSA key/subkey packets with SHA-1 fingerprints,
  * iterated-salted S2K private-key protection, v4 binary-document
  * signatures (EMSA-PKCS1 over the RFC 5.2.4 trailer), PKESK +
  * SEIPD/MDC encryption with OpenPGP CFB, ZIP/ZLIB compressed-data
  * handling, and ASCII armor with CRC24. Interop is pinned by GnuPG
  * cross-vectors in WsPgpSpec (gpg-made signatures verify here;
  * signatures/messages made here verify/decrypt under gpg's format
  * rules replayed in the spec).
  *
  * Scope: RSA only (algos 1-3), SHA-256/SHA-512/SHA-1 digests, AES-128/
  * 256 session ciphers — the subset the reference's own defaults
  * exercise. No network, no keystore: keys come from serialized rings.
  */
object OpenPgp {

  // ------------------------------------------------------------ model

  final case class PubKey(tag: Int, body: Array[Byte], created: Long,
      algo: Int, n: BigInteger, e: BigInteger,
      var uids: Vector[Array[Byte]] = Vector.empty) {
    lazy val fingerprint: Array[Byte] = {
      val md = MessageDigest.getInstance("SHA-1")
      md.update(0x99.toByte)
      md.update(((body.length >> 8) & 0xff).toByte)
      md.update((body.length & 0xff).toByte)
      md.update(body)
      md.digest()
    }
    def keyId: Long =
      fingerprint.takeRight(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
    def keyIdHex: String = f"$keyId%016X"
    def bits: Int = n.bitLength
    def isMaster: Boolean = tag == 6
  }

  /** A secret key whose material may still be S2K-protected; `unlock`
    * yields the usable private-key arithmetic (the reference's
    * extractPrivateKey step — decryption is deferred to signing/
    * decryption time so rings parse without a passphrase). */
  final case class SecKey(pub: PubKey, secBody: Array[Byte]) {
    def unlock(passphrase: String): SecMat = secMaterial(this, passphrase)
  }

  final case class SecMat(pub: PubKey, d: BigInteger, p: BigInteger,
      q: BigInteger, u: BigInteger) {
    /** RSA private op via CRT when p/q present (gpg key MPIs are
      * d, p, q, u = p⁻¹ mod q — RFC 4880 §5.5.3). */
    def privOp(m: BigInteger): BigInteger =
      if (p.signum > 0 && q.signum > 0) {
        val mp = m.mod(p).modPow(d.mod(p.subtract(BigInteger.ONE)), p)
        val mq = m.mod(q).modPow(d.mod(q.subtract(BigInteger.ONE)), q)
        // h = (mq - mp) * u mod q ; m = mp + p * h
        val h = mq.subtract(mp).multiply(u).mod(q)
        mp.add(p.multiply(h))
      } else m.modPow(d, pub.n)
  }

  final case class PubRing(keys: Vector[PubKey], encoded: Array[Byte]) {
    def byId(id: Long): Option[PubKey] =
      if (id == 0L) keys.headOption else keys.find(_.keyId == id)
  }
  final case class SecRing(keys: Vector[SecKey], encoded: Array[Byte]) {
    def byId(id: Long): Option[SecKey] =
      if (id == 0L) keys.headOption else keys.find(_.pub.keyId == id)
    def pubById(id: Long): Option[PubKey] = byId(id).map(_.pub)
  }

  // ------------------------------------------------------- byte plumbing

  private final class Reader(val a: Array[Byte]) {
    var pos = 0
    def remaining: Int = a.length - pos
    def u8(): Int = { val v = a(pos) & 0xff; pos += 1; v }
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Long = (u16().toLong << 16) | u16()
    def take(n: Int): Array[Byte] = {
      require(n >= 0 && pos + n <= a.length, s"truncated packet (need $n)")
      val out = java.util.Arrays.copyOfRange(a, pos, pos + n); pos += n; out
    }
    def mpi(): BigInteger = {
      val bits = u16()
      new BigInteger(1, take((bits + 7) / 8))
    }
  }

  private def mpiBytes(x: BigInteger): Array[Byte] = {
    val bits = x.bitLength
    val raw = x.toByteArray.dropWhile(_ == 0)
    Array(((bits >> 8) & 0xff).toByte, (bits & 0xff).toByte) ++ raw
  }

  /** New-format packet header. */
  private[script] def packet(tag: Int, body: Array[Byte]): Array[Byte] = {
    val len =
      if (body.length < 192) Array(body.length.toByte)
      else if (body.length < 8384) {
        val l = body.length - 192
        Array((192 + (l >> 8)).toByte, (l & 0xff).toByte)
      } else Array(255.toByte, (body.length >> 24).toByte,
        (body.length >> 16).toByte, (body.length >> 8).toByte, body.length.toByte)
    Array((0xc0 | tag).toByte) ++ len ++ body
  }

  /** Parse a packet stream into (tag, body) pairs — both header
    * formats, partial lengths reassembled. */
  def packets(blob: Array[Byte]): Vector[(Int, Array[Byte])] = {
    val r = new Reader(blob)
    val out = Vector.newBuilder[(Int, Array[Byte])]
    while (r.remaining > 0) {
      val hdr = r.u8()
      require((hdr & 0x80) != 0, "not an OpenPGP packet header")
      if ((hdr & 0x40) != 0) { // new format
        val tag = hdr & 0x3f
        val buf = Array.newBuilder[Byte]
        var more = true
        while (more) {
          val b1 = r.u8()
          if (b1 < 192) { buf ++= r.take(b1); more = false }
          else if (b1 <= 223) { buf ++= r.take(((b1 - 192) << 8) + r.u8() + 192); more = false }
          else if (b1 == 255) { buf ++= r.take(r.u32().toInt); more = false }
          else buf ++= r.take(1 << (b1 & 0x1f)) // partial; continue
        }
        out += ((tag, buf.result()))
      } else { // old format
        val tag = (hdr >> 2) & 0x0f
        val body = (hdr & 3) match {
          case 0 => r.take(r.u8())
          case 1 => r.take(r.u16())
          case 2 => r.take(r.u32().toInt)
          case _ => r.take(r.remaining)
        }
        out += ((tag, body))
      }
    }
    out.result()
  }

  // ------------------------------------------------------------- keys

  private def parsePubBody(tag: Int, body: Array[Byte]): PubKey = {
    val r = new Reader(body)
    val ver = r.u8()
    require(ver == 4, s"only v4 keys supported (got v$ver)")
    val created = r.u32()
    val algo = r.u8()
    require(algo == 1 || algo == 2 || algo == 3, s"only RSA keys supported (algo $algo)")
    val n = r.mpi(); val e = r.mpi()
    // public part length = bytes consumed so far
    PubKey(if (tag == 5 || tag == 6) 6 else 14,
      java.util.Arrays.copyOfRange(body, 0, r.pos), created, algo, n, e)
  }

  /** Iterated+salted S2K (RFC 4880 §3.7.1.3) key derivation. */
  private def s2kKey(hashAlgo: Int, salt: Array[Byte], count: Long,
      passphrase: Array[Byte], keyLen: Int): Array[Byte] = {
    val hashName = hashAlgo match {
      case 2 => "SHA-1"; case 8 => "SHA-256"; case 9 => "SHA-384"
      case 10 => "SHA-512"; case 11 => "SHA-224"
      case o => throw new IllegalArgumentException(s"S2K hash algo $o")
    }
    var out = Array.empty[Byte]
    var ctx = 0
    while (out.length < keyLen) {
      val md = MessageDigest.getInstance(hashName)
      md.update(Array.fill[Byte](ctx)(0))
      val unit = salt ++ passphrase
      var fed = 0L
      val total = math.max(count, unit.length.toLong)
      while (fed < total) {
        val left = total - fed
        if (left >= unit.length) { md.update(unit); fed += unit.length }
        else { md.update(unit, 0, left.toInt); fed += left }
      }
      out ++= md.digest()
      ctx += 1
    }
    out.take(keyLen)
  }

  private def secMaterial(sk: SecKey, passphrase: String): SecMat = {
    val pub = sk.pub; val body = sk.secBody
    val r = new Reader(body); r.pos = pub.body.length
    val usage = r.u8()
    val mpiData: Array[Byte] = usage match {
      case 0 => r.take(r.remaining) // plaintext MPIs + 2-byte checksum
      case 254 | 255 =>
        val symAlgo = r.u8()
        val keyLen = symAlgo match {
          case 7 => 16; case 8 => 24; case 9 => 32
          case o => throw new IllegalArgumentException(s"secret-key cipher $o")
        }
        val s2kType = r.u8()
        val hashAlgo = r.u8()
        val salt = if (s2kType >= 1) r.take(8) else Array.empty[Byte]
        val count =
          if (s2kType == 3) { val c = r.u8(); (16L + (c & 15)) << ((c >> 4) + 6) }
          else 0L
        val iv = r.take(16)
        val enc = r.take(r.remaining)
        val key = s2kKey(hashAlgo, salt, count,
          passphrase.getBytes(StandardCharsets.UTF_8), keyLen)
        val dec = cfb(key, iv, enc, encrypting = false)
        if (usage == 254) {
          val plain = dec.dropRight(20)
          val sha = MessageDigest.getInstance("SHA-1").digest(plain)
          require(java.util.Arrays.equals(sha, dec.takeRight(20)),
            "secret key checksum mismatch (wrong passphrase?)")
          plain ++ Array[Byte](0, 0) // uniform trailing 2 bytes below
        } else dec
      case o => throw new IllegalArgumentException(s"S2K usage $o unsupported")
    }
    val m = new Reader(mpiData)
    val d = m.mpi(); val p = m.mpi(); val q = m.mpi(); val u = m.mpi()
    SecMat(pub, d, p, q, u)
  }

  /** Split a (possibly concatenated) binary keyring blob into rings. */
  def parseRings(blob: Array[Byte]): Vector[Any] = {
    val pks = packets(blob)
    val rings = Vector.newBuilder[Any]
    var cur = Vector.empty[(Int, Array[Byte])]
    def flush(): Unit = if (cur.nonEmpty) {
      val isSecret = cur.head._1 == 5
      var keysP = Vector.empty[PubKey]
      var keysS = Vector.empty[SecKey]
      var last: PubKey = null
      cur.foreach {
        case (t @ (5 | 7), b) =>
          val sk = SecKey(parsePubBody(t, b), b)
          keysS :+= sk; last = sk.pub
        case (t @ (6 | 14), b) =>
          val pk = parsePubBody(t, b); keysP :+= pk; last = pk
        case (13, b) => if (last != null) last.uids :+= b
        case _ => // signatures / trust — identity established by keys
      }
      val encoded = cur.flatMap { case (t, b) => packet(t, b) }.toArray
      rings += (if (isSecret) SecRing(keysS, encoded) else PubRing(keysP, encoded))
    }
    pks.foreach { case pk @ (tag, _) =>
      if (tag == 5 || tag == 6) { flush(); cur = Vector(pk) }
      else if (cur.nonEmpty) cur :+= pk
    }
    flush()
    rings.result()
  }

  def parseRingsAuto(in: Any): Vector[Any] = in match {
    case s: String if s.contains("-----BEGIN PGP") => parseRings(dearmor(s))
    case s: String => parseRings(s.getBytes(StandardCharsets.ISO_8859_1))
    case b: Array[Byte] => parseRings(b)
    case o => throw new IllegalArgumentException(s"PGP ring source: $o")
  }

  // ------------------------------------------------------- signatures

  private def hashName(algo: Int): String = algo match {
    case 2 => "SHA-1"; case 8 => "SHA-256"; case 9 => "SHA-384"
    case 10 => "SHA-512"; case 11 => "SHA-224"
    case o => throw new IllegalArgumentException(s"hash algo $o")
  }
  def hashAlgoId(name: String): Int = name.toUpperCase match {
    case "SHA1" | "SHA-1" => 2
    case "SHA256" | "SHA-256" => 8
    case "SHA384" | "SHA-384" => 9
    case "SHA512" | "SHA-512" => 10
    case o => throw new IllegalArgumentException(s"digest $o")
  }

  /** DigestInfo prefixes for EMSA-PKCS1-v1_5 (RFC 8017 §9.2 notes). */
  private def digestInfoPrefix(algo: Int): Array[Byte] = (algo match {
    case 2 => "3021300906052b0e03021a05000414"
    case 8 => "3031300d060960864801650304020105000420"
    case 9 => "3041300d060960864801650304020205000430"
    case 10 => "3051300d060960864801650304020305000440"
    case 11 => "302d300d06096086480165030402040500041c"
    case o => throw new IllegalArgumentException(s"hash algo $o")
  }).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def emsaPkcs1(digest: Array[Byte], algo: Int, emLen: Int): BigInteger = {
    val t = digestInfoPrefix(algo) ++ digest
    require(emLen >= t.length + 11, "RSA modulus too small for digest")
    val em = Array[Byte](0, 1) ++ Array.fill[Byte](emLen - t.length - 3)(0xff.toByte) ++
      Array[Byte](0) ++ t
    new BigInteger(1, em)
  }

  /** Detached v4 binary-document signature packet (RFC 4880 §5.2.3/4).
    * Hashed subpackets: creation time + issuer fingerprint; unhashed:
    * issuer key id — gpg's own layout for detached signatures. */
  def signDetached(sec: SecMat, data: Array[Byte], digest: String,
      createdSec: Long): Array[Byte] = {
    val algo = hashAlgoId(digest)
    def subpkt(tpe: Int, body: Array[Byte]): Array[Byte] = {
      val len = body.length + 1
      require(len < 192, "subpacket too long")
      Array(len.toByte, tpe.toByte) ++ body
    }
    val hashed =
      subpkt(33, Array(4.toByte) ++ sec.pub.fingerprint) ++ // issuer fpr
      subpkt(2, Array(((createdSec >> 24) & 0xff).toByte, ((createdSec >> 16) & 0xff).toByte,
        ((createdSec >> 8) & 0xff).toByte, (createdSec & 0xff).toByte))
    val unhashed = subpkt(16,
      sec.pub.fingerprint.takeRight(8)) // issuer key id
    val head = Array[Byte](4, 0x00, 1, algo.toByte,
      ((hashed.length >> 8) & 0xff).toByte, (hashed.length & 0xff).toByte) ++ hashed
    val trailer = head ++ Array[Byte](4, 0xff.toByte,
      ((head.length >> 24) & 0xff).toByte, ((head.length >> 16) & 0xff).toByte,
      ((head.length >> 8) & 0xff).toByte, (head.length & 0xff).toByte)
    val md = MessageDigest.getInstance(hashName(algo))
    md.update(data); md.update(trailer)
    val dig = md.digest()
    val emLen = (sec.pub.n.bitLength + 7) / 8
    val sig = sec.privOp(emsaPkcs1(dig, algo, emLen))
    val body = head ++
      Array(((unhashed.length >> 8) & 0xff).toByte, (unhashed.length & 0xff).toByte) ++
      unhashed ++ dig.take(2) ++ mpiBytes(sig)
    packet(2, body)
  }

  /** Verify a detached signature packet (binary document). */
  def verifyDetached(pub: PubKey, data: Array[Byte], sigBlob: Array[Byte]): Boolean = {
    val (tag, body) = packets(sigBlob).headOption.getOrElse(
      throw new IllegalArgumentException("empty signature"))
    require(tag == 2, s"not a signature packet (tag $tag)")
    val r = new Reader(body)
    val ver = r.u8()
    require(ver == 4 || ver == 3, s"signature v$ver unsupported")
    if (ver == 3) return false // not emitted by our subset's peers
    val sigType = r.u8()
    val pkAlgo = r.u8()
    val hAlgo = r.u8()
    val hLen = r.u16()
    r.take(hLen)
    val head = java.util.Arrays.copyOfRange(body, 0, r.pos)
    val uLen = r.u16(); r.take(uLen)
    val left16 = r.take(2)
    val sig = r.mpi()
    if (sigType != 0 || (pkAlgo != 1 && pkAlgo != 3)) return false
    val trailer = head ++ Array[Byte](4, 0xff.toByte,
      ((head.length >> 24) & 0xff).toByte, ((head.length >> 16) & 0xff).toByte,
      ((head.length >> 8) & 0xff).toByte, (head.length & 0xff).toByte)
    val md = MessageDigest.getInstance(hashName(hAlgo))
    md.update(data); md.update(trailer)
    val dig = md.digest()
    if (dig(0) != left16(0) || dig(1) != left16(1)) return false
    val emLen = (pub.n.bitLength + 7) / 8
    val expect = emsaPkcs1(dig, hAlgo, emLen)
    sig.modPow(pub.e, pub.n) == expect
  }

  /** One-pass signed message (RFC 4880 §5.4): one-pass packet +
    * literal data + the trailing signature packet. */
  def onePassMessage(sec: SecMat, data: Array[Byte], digest: String,
      dateSec: Long, sigPacket: Array[Byte]): Array[Byte] = {
    val ops = packet(4, Array[Byte](3, 0x00, hashAlgoId(digest).toByte, 1) ++
      sec.pub.fingerprint.takeRight(8) ++ Array[Byte](1))
    ops ++ literal(data, dateSec) ++ sigPacket
  }

  /** Verify a one-pass signed message; returns (literal data, valid). */
  def verifyOnePass(pub: PubKey, msg: Array[Byte]): (Array[Byte], Boolean) = {
    val pks = packets(msg)
    val lit = pks.collectFirst { case (11, b) => b }.getOrElse(
      throw new IllegalArgumentException("no literal data packet"))
    val r = new Reader(lit)
    r.u8(); r.take(r.u8()); r.u32()
    val data = r.take(r.remaining)
    val sig = pks.collectFirst { case (2, b) => packet(2, b) }.getOrElse(
      throw new IllegalArgumentException("no signature packet"))
    (data, verifyDetached(pub, data, sig))
  }

  /** Issuer key id of a signature packet (subpacket 16 or 33). */
  def sigIssuer(sigBlob: Array[Byte]): Long = {
    val (_, body) = packets(sigBlob).head
    val r = new Reader(body)
    r.u8(); r.u8(); r.u8(); r.u8()
    var issuer = 0L
    def scan(area: Array[Byte]): Unit = {
      val s = new Reader(area)
      while (s.remaining > 0) {
        // SUBPACKET lengths (RFC 4880 §5.2.3.1): 192..254 is the
        // two-octet form, 255 the five-octet — NOT the packet-header
        // ranges (no partials in subpackets)
        val l0 = s.u8()
        val len = if (l0 < 192) l0
          else if (l0 < 255) ((l0 - 192) << 8) + s.u8() + 192
          else s.u32().toInt
        val tpe = s.u8() & 0x7f
        val bodyS = s.take(len - 1)
        if (tpe == 16 && bodyS.length == 8)
          issuer = bodyS.foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
        else if (tpe == 33 && issuer == 0L && bodyS.length == 21)
          issuer = bodyS.takeRight(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      }
    }
    scan(r.take(r.u16())) // hashed
    scan(r.take(r.u16())) // unhashed
    issuer
  }

  // -------------------------------------------------------- encryption

  /** Raw AES-CFB128 with explicit IV (OpenPGP SEIPD uses a zero IV and
    * no resync) — built on single-block ECB so no provider mode-name
    * variance can bite. */
  private def cfb(key: Array[Byte], iv: Array[Byte], data: Array[Byte],
      encrypting: Boolean): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"))
    val out = new Array[Byte](data.length)
    var prev = iv.clone()
    var off = 0
    while (off < data.length) {
      val ks = c.doFinal(prev)
      val blk = math.min(16, data.length - off)
      var i = 0
      while (i < blk) {
        out(off + i) = (data(off + i) ^ ks(i)).toByte
        i += 1
      }
      prev = if (encrypting) java.util.Arrays.copyOfRange(out, off, off + 16)
        else java.util.Arrays.copyOfRange(data, off, off + 16)
      // (short final block: prev is only consumed if another block follows)
      off += blk
    }
    out
  }

  /** Literal data packet (binary, empty name, fixed date). */
  private def literal(data: Array[Byte], dateSec: Long): Array[Byte] =
    packet(11, Array[Byte]('b'.toByte, 0) ++
      Array(((dateSec >> 24) & 0xff).toByte, ((dateSec >> 16) & 0xff).toByte,
        ((dateSec >> 8) & 0xff).toByte, (dateSec & 0xff).toByte) ++ data)

  /** PKESK + SEIPD/MDC message for one RSA recipient (AES-256).
    * Randomness comes from the caller's PRNG so sessions replay
    * deterministically under SRAND. */
  def encrypt(pub: PubKey, data: Array[Byte], rnd: java.util.Random,
      throwKeyId: Boolean = true, dateSec: Long = 0L): Array[Byte] = {
    val sessKey = new Array[Byte](32); rnd.nextBytes(sessKey)
    // session-key payload: algo byte + key + 16-bit additive checksum
    val ck = sessKey.foldLeft(0)((a, b) => (a + (b & 0xff)) & 0xffff)
    val payload = Array(9.toByte) ++ sessKey ++
      Array(((ck >> 8) & 0xff).toByte, (ck & 0xff).toByte)
    // EME-PKCS1-v1_5: 00 02 PS(nonzero) 00 M
    val k = (pub.n.bitLength + 7) / 8
    val ps = new Array[Byte](k - payload.length - 3)
    var i = 0
    while (i < ps.length) {
      val b = (rnd.nextInt(255) + 1).toByte // 1..255, never zero
      ps(i) = b; i += 1
    }
    val em = Array[Byte](0, 2) ++ ps ++ Array[Byte](0) ++ payload
    val esk = new BigInteger(1, em).modPow(pub.e, pub.n)
    val keyIdBytes =
      if (throwKeyId) Array.fill[Byte](8)(0) // anonymous recipient
      else pub.fingerprint.takeRight(8)
    val pkesk = packet(1, Array(3.toByte) ++ keyIdBytes ++ Array(1.toByte) ++ mpiBytes(esk))
    // SEIPD v1: prefix(16+2 repeat) || literal || MDC, CFB, zero IV
    val prefix = new Array[Byte](18)
    rnd.nextBytes(prefix)
    prefix(16) = prefix(14); prefix(17) = prefix(15)
    val inner = literal(data, dateSec)
    val mdcIn = prefix ++ inner ++ Array[Byte](0xd3.toByte, 0x14)
    val mdc = Array[Byte](0xd3.toByte, 0x14) ++
      MessageDigest.getInstance("SHA-1").digest(mdcIn)
    val ct = cfb(sessKey, new Array[Byte](16), prefix ++ inner ++ mdc, encrypting = true)
    pkesk ++ packet(18, Array(1.toByte) ++ ct)
  }

  /** Decrypt a PKESK+SEIPD message with a secret key; returns the
    * literal payload (handles ZIP/ZLIB compressed bodies). */
  def decrypt(sec: SecMat, msg: Array[Byte]): Array[Byte] = {
    val pks = packets(msg)
    // a message may carry one PKESK per recipient — pick ours (exact
    // key-id match first, anonymous 0-id as fallback)
    val pkesks = pks.collect { case (1, body) =>
      val r = new Reader(body)
      require(r.u8() == 3, "PKESK version")
      val kid = r.take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      r.u8() // pubkey algo (RSA)
      (kid, r.mpi())
    }
    require(pkesks.nonEmpty, "no PKESK packet")
    val esk = pkesks.collectFirst { case (kid, e) if kid == sec.pub.keyId => e }
      .orElse(pkesks.collectFirst { case (0L, e) => e })
      .getOrElse(throw new IllegalArgumentException(
        f"message is for key(s) ${pkesks.map(p => f"${p._1}%016X").mkString(",")}, " +
          f"not ${sec.pub.keyId}%016X"))
    val em = sec.privOp(esk)
    // EME-PKCS1 decode: skip 02, PS, 00
    val full = {
      val k = (sec.pub.n.bitLength + 7) / 8
      val raw = em.toByteArray.dropWhile(_ == 0)
      Array.fill[Byte](k - 1 - raw.length)(0) ++ raw
    }
    require(full(0) == 2, "EME-PKCS1 framing")
    val zero = full.indexOf(0.toByte, 1)
    require(zero > 8, "EME-PKCS1 padding")
    val payload = full.drop(zero + 1)
    val symAlgo = payload(0) & 0xff
    val keyLen = symAlgo match {
      case 7 => 16; case 8 => 24; case 9 => 32
      case o => throw new IllegalArgumentException(s"session cipher $o")
    }
    val sessKey = payload.slice(1, 1 + keyLen)
    val ck = (payload(1 + keyLen) & 0xff) << 8 | (payload(2 + keyLen) & 0xff)
    require(sessKey.foldLeft(0)((a, b) => (a + (b & 0xff)) & 0xffff) == ck,
      "session key checksum")
    val seipd = pks.collectFirst { case (18, b) => b }.getOrElse(
      throw new IllegalArgumentException("no SEIPD packet"))
    require((seipd(0) & 0xff) == 1, "SEIPD version")
    val plain = cfb(sessKey, new Array[Byte](16), seipd.drop(1), encrypting = false)
    require(plain(16) == plain(14) && plain(17) == plain(15), "session key wrong (prefix check)")
    val content = plain.slice(18, plain.length - 22)
    val mdcTag = plain.takeRight(22)
    val sha = MessageDigest.getInstance("SHA-1")
    sha.update(plain, 0, plain.length - 20)
    require(java.util.Arrays.equals(sha.digest(), mdcTag.drop(2)), "MDC mismatch")
    extractLiteral(content)
  }

  private def extractLiteral(content: Array[Byte]): Array[Byte] = {
    packets(content).headOption match {
      case Some((11, body)) =>
        val r = new Reader(body)
        r.u8() // format
        r.take(r.u8()) // filename
        r.u32() // date
        r.take(r.remaining)
      case Some((8, body)) => // compressed data
        val algo = body(0) & 0xff
        if (algo == 0) return extractLiteral(body.drop(1)) // uncompressed
        require(algo == 1 || algo == 2,
          s"compression algo $algo unsupported (ZIP/ZLIB only)")
        val inflater = new java.util.zip.Inflater(algo == 1) // 1 = raw deflate (ZIP)
        inflater.setInput(body, 1, body.length - 1)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!inflater.finished()) {
          val n = inflater.inflate(buf)
          if (n == 0 && inflater.needsInput()) throw new IllegalStateException("truncated deflate")
          out.write(buf, 0, n)
        }
        extractLiteral(out.toByteArray)
      case Some((t, _)) => throw new IllegalArgumentException(s"unexpected inner packet tag $t")
      case None => throw new IllegalArgumentException("empty encrypted body")
    }
  }

  // ------------------------------------------------------------- armor

  private def crc24(data: Array[Byte]): Int = {
    var crc = 0xb704ce
    data.foreach { b =>
      crc ^= (b & 0xff) << 16
      var i = 0
      while (i < 8) {
        crc <<= 1
        if ((crc & 0x1000000) != 0) crc ^= 0x1864cfb
        i += 1
      }
    }
    crc & 0xffffff
  }

  def armor(label: String, data: Array[Byte]): String = {
    val b64 = java.util.Base64.getEncoder.encodeToString(data).grouped(64).mkString("\n")
    val crc = crc24(data)
    val crcB64 = java.util.Base64.getEncoder.encodeToString(
      Array(((crc >> 16) & 0xff).toByte, ((crc >> 8) & 0xff).toByte, (crc & 0xff).toByte))
    s"-----BEGIN PGP $label-----\n\n$b64\n=$crcB64\n-----END PGP $label-----\n"
  }

  def dearmor(text: String): Array[Byte] = {
    val lines = text.linesIterator.map(_.trim).toVector
    val begin = lines.indexWhere(_.startsWith("-----BEGIN PGP"))
    require(begin >= 0, "no armor header")
    // skip armor headers ("Version: ...") and the blank separator
    val rest = lines.drop(begin + 1).dropWhile(l => l.contains(": ") || l.isEmpty)
    val body = rest.takeWhile(l => !l.startsWith("=") && !l.startsWith("-----"))
      .mkString("")
    java.util.Base64.getDecoder.decode(body)
  }
}
