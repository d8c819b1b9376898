package graft.script

/** Crypto/compression word tail: the digest registrations beyond
  * MD5/SHA1/SHA256/SHA512 (WarpScriptLib DIGEST list — SHA3 via the
  * JDK provider), keyed HMAC words, the SipHash-2-4 HASH word
  * (crypto/SipHashInline.java re-derived from the public SipHash
  * spec), GZIP/UNGZIP/DEFLATE/INFLATE stack forms over
  * [[graft.sources.Compress]], and the EC suite (fn/ECGEN.java family
  * — JDK named-curve EC replaces BouncyCastle).
  */
private[script] object WordsCrypto {
  import WarpScriptEngine._

  /** SipHash-2-4 (Aumasson & Bernstein, public reference design;
    * matches crypto/SipHashInline.hash24). */
  private[script] def sipHash24(k0: Long, k1: Long, data: Array[Byte]): Long = {
    var v0 = 0x736f6d6570736575L ^ k0
    var v1 = 0x646f72616e646f6dL ^ k1
    var v2 = 0x6c7967656e657261L ^ k0
    var v3 = 0x7465646279746573L ^ k1
    def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))
    def round(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }
    val n = data.length
    val end = n - (n % 8)
    var i = 0
    while (i < end) {
      var m = 0L
      var j = 7
      while (j >= 0) { m = (m << 8) | (data(i + j) & 0xffL); j -= 1 }
      v3 ^= m; round(); round(); v0 ^= m
      i += 8
    }
    var last = (n.toLong & 0xff) << 56
    var j = n - 1
    while (j >= end) { last |= (data(j) & 0xffL) << (8 * (j - end)); j -= 1 }
    v3 ^= last; round(); round(); v0 ^= last
    v2 ^= 0xff
    round(); round(); round(); round()
    v0 ^ v1 ^ v2 ^ v3
  }

  /** Keccak-f[1600] sponge, re-derived from the public Keccak/FIPS 202
    * specification (the reference wraps BouncyCastle's KeccakDigest).
    * `padByte` 0x01 = original Keccak (KECCAK.* words), 0x06 = SHA-3.
    * Capacity = 2 × output bits, little-endian lanes. */
  private[script] def keccak(data: Array[Byte], outBits: Int,
      padByte: Byte = 0x01): Array[Byte] = {
    val RC = Array(
      0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
      0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
      0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
      0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
      0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
      0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
      0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
      0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)
    val rotOff = Array( // rho offsets, state index x + 5y
      0, 1, 62, 28, 27, 36, 44, 6, 55, 20, 3, 10, 43, 25, 39,
      41, 45, 15, 21, 8, 18, 2, 61, 56, 14)
    def rotl(x: Long, n: Int): Long =
      if (n == 0) x else (x << n) | (x >>> (64 - n))
    val st = new Array[Long](25)
    def permute(): Unit = {
      var round = 0
      while (round < 24) {
        // theta
        val c = Array.tabulate(5)(x => st(x) ^ st(x + 5) ^ st(x + 10) ^ st(x + 15) ^ st(x + 20))
        var x = 0
        while (x < 5) {
          val d = c((x + 4) % 5) ^ rotl(c((x + 1) % 5), 1)
          var y = 0
          while (y < 5) { st(x + 5 * y) ^= d; y += 1 }
          x += 1
        }
        // rho + pi
        val b = new Array[Long](25)
        var i = 0
        while (i < 25) {
          val xx = i % 5; val yy = i / 5
          b(yy + 5 * ((2 * xx + 3 * yy) % 5)) = rotl(st(i), rotOff(i))
          i += 1
        }
        // chi
        var y = 0
        while (y < 5) {
          var x2 = 0
          while (x2 < 5) {
            st(x2 + 5 * y) = b(x2 + 5 * y) ^
              (~b((x2 + 1) % 5 + 5 * y) & b((x2 + 2) % 5 + 5 * y))
            x2 += 1
          }
          y += 1
        }
        // iota
        st(0) ^= RC(round)
        round += 1
      }
    }
    val rateBytes = (1600 - 2 * outBits) / 8
    // absorb with pad10*1
    val padded = {
      val padLen = rateBytes - (data.length % rateBytes)
      val p = java.util.Arrays.copyOf(data, data.length + padLen)
      p(data.length) = padByte
      p(p.length - 1) = (p(p.length - 1) | 0x80).toByte
      p
    }
    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < rateBytes / 8) {
        var lane = 0L
        var j = 7
        while (j >= 0) { lane = (lane << 8) | (padded(off + 8 * i + j) & 0xffL); j -= 1 }
        st(i) ^= lane
        i += 1
      }
      permute()
      off += rateBytes
    }
    // squeeze (single block suffices: outBits <= rate for all variants)
    val out = new Array[Byte](outBits / 8)
    var i = 0
    while (i < out.length) {
      out(i) = ((st(i / 8) >>> (8 * (i % 8))) & 0xff).toByte
      i += 1
    }
    out
  }

  private def ecParams(curve: String): java.security.spec.ECParameterSpec = {
    val ap = java.security.AlgorithmParameters.getInstance("EC")
    ap.init(new java.security.spec.ECGenParameterSpec(curve))
    ap.getParameterSpec(classOf[java.security.spec.ECParameterSpec])
  }

  private def keyMap(st: State): Map[String, String] =
    st.pop().asInstanceOf[Map[Any, Any]]
      .map { case (k, v) => k.toString -> String.valueOf(v) }

  def eval(w: String, st: State, en: WarpScriptEngine): Boolean = {
    w match {
      // ---- digest tail (WarpScriptLib DIGEST registrations; the JDK
      // provider covers MD2 and the SHA-2/SHA-3 families)
      case "MD2" | "SHA224" | "SHA384" |
           "SHA3.224" | "SHA3.256" | "SHA3.384" | "SHA3.512" =>
        val algo = w match {
          case "MD2" => "MD2"
          case "SHA224" => "SHA-224"
          case "SHA384" => "SHA-384"
          case s => "SHA3-" + s.stripPrefix("SHA3.")
        }
        st.push(java.security.MessageDigest.getInstance(algo)
          .digest(en.popBytes(st)))

      // KECCAK family (original 0x01 padding, as the reference's
      // BouncyCastle KeccakDigest — distinct from the JDK's SHA-3)
      case "KECCAK.128" | "KECCAK.224" | "KECCAK.256" | "KECCAK.288" |
           "KECCAK.384" | "KECCAK.512" =>
        val bits = w.stripPrefix("KECCAK.").toInt
        st.push(keccak(en.popBytes(st), bits))

      // keyed HMAC words (fn/SHA1HMAC.java, SHA256HMAC: data key →
      // mac bytes)
      case "SHA1HMAC" | "SHA256HMAC" =>
        val key = en.popBytes(st)
        val data = en.popBytes(st)
        val algo = if (w == "SHA1HMAC") "HmacSHA1" else "HmacSHA256"
        st.push(graft.sources.Compress.hmacBytes(key, data, algo))

      // HASH (fn/HASH.java): SipHash-2-4 of bytes/string under an
      // optional (k0, k1) LONG pair — default key (0, 0) stands in for
      // the platform's configured class-hash key
      case "HASH" =>
        var top = st.pop()
        var k0 = 0L; var k1 = 0L
        top match {
          case l: Long =>
            k1 = l; k0 = st.popLong(); top = st.pop()
          case _ =>
        }
        val data = top match {
          case b: Array[Byte] => b
          case s: String => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          case o => throw new IllegalArgumentException(s"HASH on $o")
        }
        st.push(sipHash24(k0, k1, data))

      // ---- compression stack forms (fn/GZIP.java family over the
      // columnar Compress twins)
      case "GZIP" => st.push(graft.sources.Compress.gzipBytes(en.popBytes(st)))
      case "UNGZIP" =>
        st.push(graft.sources.Compress.gunzipBytes(st.pop().asInstanceOf[Array[Byte]]))
      case "DEFLATE" => st.push(graft.sources.Compress.deflateBytes(en.popBytes(st)))
      case "INFLATE" =>
        st.push(graft.sources.Compress.inflateBytes(st.pop().asInstanceOf[Array[Byte]]))

      // ---- EC suite (fn/ECGEN.java, ECPRIVATE, ECPUBLIC, ECSIGN,
      // ECVERIFY, ECDH): JDK named curves; key maps carry
      // { 'curve', 'd' } (private scalar) / { 'curve', 'q' } (public
      // point, uncompressed hex), mirroring the reference's parameter
      // maps (Constants.KEY_CURVE / KEY_D / KEY_Q)
      case "ECGEN" =>
        val curve = st.popStr()
        val kpg = java.security.KeyPairGenerator.getInstance("EC")
        kpg.initialize(new java.security.spec.ECGenParameterSpec(curve))
        val kp = kpg.generateKeyPair()
        val priv = kp.getPrivate.asInstanceOf[java.security.interfaces.ECPrivateKey]
        val pub = kp.getPublic.asInstanceOf[java.security.interfaces.ECPublicKey]
        val fieldBytes = (priv.getParams.getCurve.getField.getFieldSize + 7) / 8
        def fix(bi: java.math.BigInteger): String = {
          val raw = bi.toByteArray.dropWhile(_ == 0)
          ("00" * (fieldBytes - raw.length)) + raw.map("%02x".format(_)).mkString
        }
        val q = "04" + fix(pub.getW.getAffineX) + fix(pub.getW.getAffineY)
        st.push(Map[Any, Any]("curve" -> curve, "d" -> priv.getS.toString))
        st.push(Map[Any, Any]("curve" -> curve, "q" -> q))
      case "ECPRIVATE" =>
        val params = keyMap(st)
        val spec = new java.security.spec.ECPrivateKeySpec(
          new java.math.BigInteger(params("d")), ecParams(params("curve")))
        st.push(java.security.KeyFactory.getInstance("EC").generatePrivate(spec))
      case "ECPUBLIC" =>
        val params = keyMap(st)
        val qHex = params("q")
        require(qHex.startsWith("04"), "ECPUBLIC expects an uncompressed point")
        val body = qHex.substring(2)
        val half = body.length / 2
        val x = new java.math.BigInteger(body.substring(0, half), 16)
        val y = new java.math.BigInteger(body.substring(half), 16)
        val spec = new java.security.spec.ECPublicKeySpec(
          new java.security.spec.ECPoint(x, y), ecParams(params("curve")))
        st.push(java.security.KeyFactory.getInstance("EC").generatePublic(spec))
      // data alg key ECSIGN → DER signature bytes (e.g.
      // 'SHA256WITHECDSA', as the reference's BouncyCastle alg names)
      case "ECSIGN" =>
        val key = st.pop().asInstanceOf[java.security.PrivateKey]
        val alg = st.popStr().toUpperCase.replace("WITHECDSA", "withECDSA")
        val data = en.popBytes(st)
        val sig = java.security.Signature.getInstance(alg)
        sig.initSign(key); sig.update(data)
        st.push(sig.sign())
      case "ECVERIFY" =>
        val key = st.pop().asInstanceOf[java.security.PublicKey]
        val alg = st.popStr().toUpperCase.replace("WITHECDSA", "withECDSA")
        val signature = st.pop().asInstanceOf[Array[Byte]]
        val data = en.popBytes(st)
        val sig = java.security.Signature.getInstance(alg)
        sig.initVerify(key); sig.update(data)
        st.push(sig.verify(signature))
      // private public ECDH → shared secret as unpadded hex of the
      // agreed X coordinate (fn/ECDH.java: secret.toString(16))
      case "ECDH" =>
        val pub = st.pop().asInstanceOf[java.security.PublicKey]
        val priv = st.pop().asInstanceOf[java.security.PrivateKey]
        val ka = javax.crypto.KeyAgreement.getInstance("ECDH")
        ka.init(priv); ka.doPhase(pub, true)
        st.push(new java.math.BigInteger(1, ka.generateSecret()).toString(16))

      case _ => return false
    }
    true
  }
}
