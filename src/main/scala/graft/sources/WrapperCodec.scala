package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Byte-compatible codec for the reference's GTSWrapper wire format —
  * the `WRAP`/`UNWRAP` interchange blobs a real Warp 10 deployment
  * exports (fn/WRAP.java, fn/UNWRAP.java):
  *
  *   OPB64( thrift-compact( GTSWrapper{ metadata, base, encoded,
  *     count, compressed, compressionPasses, lastbucket, bucketspan,
  *     bucketcount } ) )
  *
  * with `encoded` the GTSEncoder per-point stream (GTSEncoder.java:
  * 40-131 flag layout, :266-610 write path): a flags byte (+ optional
  * location/elevation continuation byte), then timestamp
  * (raw 8-byte BE / equals-base / zigzag-varint delta against base or
  * previous), optional GeoXPPoint location (raw / zigzag delta /
  * identical), optional elevation (raw / zigzag [delta] / identical),
  * then the value (LONG raw/zigzag[+delta]/identical; DOUBLE IEEE754
  * or scale-byte + zigzag-unscaled BigDecimal; STRING varint-length
  * UTF-8 or binary; BOOLEAN/delete in the flags). The thrift envelope
  * is TCompactProtocol (the public Thrift compact-protocol spec;
  * struct fields per io_warp10_continuum_store_thrift_data.thrift:
  * 23-58, 260-303), optionally gzip'd `compressionPasses` times
  * (GTSWrapperHelper.java:139-210, OS byte forced to 0). The string
  * form is OrderPreservingBase64 (crypto/OrderPreservingBase64.java:36
  * alphabet), unpadded.
  *
  * Everything here is re-derived from the format itself; the legacy
  * self-describing blob codec ([[GtsCodec]]) remains the at-rest
  * distributed path. Locations decode through [[graft.functions
  * .GeoFunctions.fromHHCode]] — the repo's self-consistent HHCode
  * re-derivation (cell-center lat/lon), not claimed bit-identical to
  * the GeoXP library's rounding.
  */
object WrapperCodec {

  // ------------------------------------------------------------------
  // OrderPreservingBase64 (crypto/OrderPreservingBase64.java:36)
  // ------------------------------------------------------------------

  private val Alphabet =
    ".0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ_abcdefghijklmnopqrstuvwxyz"
  private val Reverse: Array[Int] = {
    val r = Array.fill(128)(-1)
    var i = 0
    while (i < Alphabet.length) { r(Alphabet.charAt(i).toInt) = i; i += 1 }
    r
  }

  /** 6 bits per character, no padding (3 bytes → 4 chars; tail emits
    * the partial group's characters only). */
  def opb64Encode(data: Array[Byte]): String = {
    val sb = new StringBuilder
    var acc = 0; var nbits = 0
    for (b <- data) {
      acc = (acc << 8) | (b & 0xff); nbits += 8
      while (nbits >= 6) {
        sb.append(Alphabet.charAt((acc >> (nbits - 6)) & 0x3f)); nbits -= 6
      }
    }
    if (nbits > 0) sb.append(Alphabet.charAt((acc << (6 - nbits)) & 0x3f))
    sb.toString
  }

  def opb64Decode(s: String): Array[Byte] = {
    val out = new ByteArrayOutputStream
    var acc = 0; var nbits = 0
    for (c <- s) {
      val v = if (c < 128) Reverse(c.toInt) else -1
      require(v >= 0, s"invalid OPB64 character '$c'")
      acc = (acc << 6) | v; nbits += 6
      if (nbits >= 8) { out.write((acc >> (nbits - 8)) & 0xff); nbits -= 8 }
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Varints (continuum/gts/Varint.java:266,404 — protobuf-style)
  // ------------------------------------------------------------------

  private final class Cursor(val buf: Array[Byte], var pos: Int = 0) {
    def u8(): Int = { val b = buf(pos) & 0xff; pos += 1; b }
    def varU(): Long = {
      var v = 0L; var shift = 0; var b = 0
      do { b = u8(); v |= (b & 0x7fL) << shift; shift += 7 } while ((b & 0x80) != 0)
      v
    }
    def varZ(): Long = { val v = varU(); (v >>> 1) ^ -(v & 1L) }
    def raw8(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | u8(); i += 1 }
      v
    }
    def bytes(n: Int): Array[Byte] = {
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; r
    }
    def remaining: Int = buf.length - pos
  }

  private def writeVarU(out: ByteArrayOutputStream, value0: Long): Unit = {
    var value = value0
    while ((value & 0xFFFFFFFFFFFFFF80L) != 0) {
      out.write(((value & 0x7f) | 0x80).toInt); value >>>= 7
    }
    out.write((value & 0x7f).toInt)
  }
  private def writeVarZ(out: ByteArrayOutputStream, v: Long): Unit =
    writeVarU(out, (v << 1) ^ (v >> 63))
  private def writeRaw8(out: ByteArrayOutputStream, v: Long): Unit = {
    var i = 56
    while (i >= 0) { out.write(((v >> i) & 0xff).toInt); i -= 8 }
  }

  // ------------------------------------------------------------------
  // Thrift compact protocol (public spec) — just what GTSWrapper needs
  // ------------------------------------------------------------------

  /** Decoded GTSWrapper envelope (thrift :260-303). */
  final case class Wrapper(
      name: String, labels: Map[String, String],
      attributes: Map[String, String],
      base: Long, encoded: Array[Byte], count: Long,
      compressed: Boolean, compressionPasses: Int,
      lastbucket: Long, bucketspan: Long, bucketcount: Long)

  private def skipField(c: Cursor, tpe: Int): Unit = tpe match {
    case 1 | 2 => // boolean packed in header
    case 3 => c.u8()
    case 4 | 5 | 6 => c.varZ()
    case 7 => c.bytes(8)
    case 8 => val n = c.varU().toInt; c.bytes(n)
    case 9 | 10 =>
      val h = c.u8(); val et = h & 0x0f
      val n = if ((h >>> 4) == 0xf) c.varU().toInt else h >>> 4
      (0 until n).foreach(_ => skipField(c, et))
    case 11 =>
      val n = c.varU().toInt
      if (n > 0) {
        val kv = c.u8()
        (0 until n).foreach { _ =>
          skipField(c, kv >>> 4); skipField(c, kv & 0x0f)
        }
      }
    case 12 => skipStruct(c)
    case o => throw new IllegalArgumentException(s"thrift compact type $o")
  }

  private def skipStruct(c: Cursor): Unit = {
    var lastId = 0
    while (true) {
      val h = c.u8()
      if (h == 0) return
      val tpe = h & 0x0f
      lastId = if ((h >>> 4) != 0) lastId + (h >>> 4) else c.varZ().toInt
      skipField(c, tpe)
    }
  }

  private def readString(c: Cursor): String =
    new String(c.bytes(c.varU().toInt), StandardCharsets.UTF_8)

  private def readStrMap(c: Cursor): Map[String, String] = {
    val n = c.varU().toInt
    if (n == 0) Map.empty
    else {
      val kv = c.u8()
      require((kv >>> 4) == 8 && (kv & 0x0f) == 8, "expected map<string,string>")
      (0 until n).map(_ => readString(c) -> readString(c)).toMap
    }
  }

  /** Metadata struct (thrift :23-58). */
  private def readMetadata(c: Cursor): (String, Map[String, String], Map[String, String]) = {
    var name = ""; var labels = Map.empty[String, String]
    var attrs = Map.empty[String, String]
    var lastId = 0
    var done = false
    while (!done) {
      val h = c.u8()
      if (h == 0) done = true
      else {
        val tpe = h & 0x0f
        lastId = if ((h >>> 4) != 0) lastId + (h >>> 4) else c.varZ().toInt
        lastId match {
          case 1 => name = readString(c)
          case 2 => labels = readStrMap(c)
          case 5 => attrs = readStrMap(c)
          case _ => skipField(c, tpe)
        }
      }
    }
    (name, labels, attrs)
  }

  def readWrapper(bytes: Array[Byte]): Wrapper = {
    val c = new Cursor(bytes)
    var name = ""; var labels = Map.empty[String, String]
    var attrs = Map.empty[String, String]
    var base = 0L; var encoded = Array.emptyByteArray; var count = 0L
    var compressed = false; var passes = 1
    var lastbucket = 0L; var bucketspan = 0L; var bucketcount = 0L
    var lastId = 0
    var done = false
    while (!done) {
      val h = c.u8()
      if (h == 0) done = true
      else {
        val tpe = h & 0x0f
        lastId = if ((h >>> 4) != 0) lastId + (h >>> 4) else c.varZ().toInt
        lastId match {
          case 1 => val (n, l, a) = readMetadata(c); name = n; labels = l; attrs = a
          case 2 => lastbucket = c.varZ()
          case 3 => bucketspan = c.varZ()
          case 4 => bucketcount = c.varZ()
          case 5 => c.bytes(c.varU().toInt) // encryption key — unused
          case 6 => base = c.varZ()
          case 7 => encoded = c.bytes(c.varU().toInt)
          case 8 => count = c.varZ()
          case 9 => compressed = tpe == 1 // bool packed in the header
          case 10 => passes = c.varZ().toInt
          case _ => skipField(c, tpe)
        }
      }
    }
    Wrapper(name, labels, attrs, base, encoded, count, compressed, passes,
      lastbucket, bucketspan, bucketcount)
  }

  private final class CompactWriter(out: ByteArrayOutputStream) {
    private var lastId = 0
    def field(id: Int, tpe: Int): Unit = {
      val delta = id - lastId
      if (delta >= 1 && delta <= 15) out.write((delta << 4) | tpe)
      else { out.write(tpe); writeVarZ(out, id.toLong) }
      lastId = id
    }
    def stop(): Unit = out.write(0)
    def i64(id: Int, v: Long): Unit = { field(id, 6); writeVarZ(out, v) }
    def i32(id: Int, v: Int): Unit = { field(id, 5); writeVarZ(out, v.toLong) }
    def bool(id: Int, v: Boolean): Unit = field(id, if (v) 1 else 2)
    def binary(id: Int, b: Array[Byte]): Unit = {
      field(id, 8); writeVarU(out, b.length.toLong); out.write(b, 0, b.length)
    }
    def str(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      writeVarU(out, b.length.toLong); out.write(b, 0, b.length)
    }
    def strMap(id: Int, m: Map[String, String]): Unit = {
      field(id, 11); writeVarU(out, m.size.toLong)
      if (m.nonEmpty) {
        out.write((8 << 4) | 8)
        // sorted for deterministic output (thrift map order is free)
        m.toSeq.sortBy(_._1).foreach { case (k, v) => str(k); str(v) }
      }
    }
  }

  /** Standalone thrift-compact Metadata struct (thrift :23-58) — the
    * Plasma RAW format AES-wraps exactly this
    * (StandalonePlasmaHandler.java:655-659 serializes the Metadata with
    * the default compact-protocol TSerializer, ThriftUtils.java:28). */
  def writeMetadata(name: String, labels: Map[String, String],
      attrs: Map[String, String] = Map.empty): Array[Byte] = {
    val out = new ByteArrayOutputStream
    val meta = new CompactWriter(out)
    meta.field(1, 8); meta.str(name)
    meta.strMap(2, labels)
    if (attrs.nonEmpty) meta.strMap(5, attrs)
    meta.stop()
    out.toByteArray
  }

  /** Parse a standalone thrift-compact Metadata struct. */
  def readMetadataBytes(bytes: Array[Byte])
      : (String, Map[String, String], Map[String, String]) =
    readMetadata(new Cursor(bytes))

  /** `includeMeta=false` is the WRAPMV form (fn/WRAP.java mv=true:
    * wrapper.unsetMetadata + unsetCount before serializing). */
  def writeWrapper(w: Wrapper, includeMeta: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream
    val wr = new CompactWriter(out)
    if (includeMeta) {
      // field 1: Metadata struct
      wr.field(1, 12)
      val meta = new CompactWriter(out)
      meta.field(1, 8); meta.str(w.name)
      meta.strMap(2, w.labels)
      if (w.attributes.nonEmpty) meta.strMap(5, w.attributes)
      meta.stop()
    }
    if (w.lastbucket != 0) wr.i64(2, w.lastbucket)
    if (w.bucketspan != 0) wr.i64(3, w.bucketspan)
    if (w.bucketcount != 0) wr.i64(4, w.bucketcount)
    if (w.base != 0) wr.i64(6, w.base)
    wr.binary(7, w.encoded)
    if (includeMeta) wr.i64(8, w.count)
    if (w.compressed) wr.bool(9, true)
    if (w.compressionPasses > 1) wr.i32(10, w.compressionPasses)
    wr.stop()
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // GTSEncoder point stream (GTSEncoder.java:40-131, 266-610)
  // ------------------------------------------------------------------

  val NoLocation: Long = 0x0145014501450145L // GeoTimeSerie.java:78
  val NoElevation: Long = Long.MinValue      // GeoTimeSerie.java:83

  /** One decoded point: GeoXPPoint location / elevation sentinels are
    * already resolved to Option; value is Long / Double / Boolean /
    * String / Array[Byte] / null (delete marker). */
  final case class WPoint(ts: Long, location: Option[Long],
      elevation: Option[Long], value: Any)

  def decodePoints(encoded: Array[Byte], base: Long): Vector[WPoint] = {
    val c = new Cursor(encoded)
    val out = Vector.newBuilder[WPoint]
    var lastTs = 0L
    var lastLong = 0L
    var lastDouble = 0.0d
    var lastString: String = null
    var lastGeo = 0L; var validGeo = false
    var lastElev = 0L; var validElev = false
    while (c.remaining > 0) {
      val flags = c.u8()
      require(flags != 0x00,
        "encrypted GTSWrapper section (FLAGS_ENCRYPTED) is unsupported")
      val locElev = if ((flags & 0x80) != 0) c.u8() else 0
      val ts = (flags & 0x60) match {
        case 0x60 => c.raw8()                 // raw absolute
        case 0x20 => base                     // equals base
        case 0x40 => base + c.varZ()          // zigzag delta vs base
        case _ => lastTs + c.varZ()           // zigzag delta vs previous
      }
      lastTs = ts
      var location: Option[Long] = None
      if ((locElev & 0x40) != 0) {
        val geo =
          if ((locElev & 0x10) != 0) lastGeo
          else if ((locElev & 0x20) != 0) lastGeo + c.varZ()
          else c.raw8()
        lastGeo = geo; validGeo = true
        location = if (geo == NoLocation) None else Some(geo)
      } else validGeo = false
      var elevation: Option[Long] = None
      if ((locElev & 0x08) != 0) {
        val e =
          if ((locElev & 0x01) != 0) lastElev
          else {
            val raw = if ((locElev & 0x04) != 0) c.varZ() else c.raw8()
            if ((locElev & 0x02) != 0) lastElev + raw else raw
          }
        lastElev = e; validElev = true
        elevation = if (e == NoElevation) None else Some(e)
      } else validElev = false
      val value: Any = (flags & 0x18) match {
        case 0x08 => // LONG
          val v =
            if ((flags & 0x01) != 0) lastLong
            else {
              val raw = if ((flags & 0x04) != 0) c.varZ() else c.raw8()
              if ((flags & 0x02) != 0) lastLong + raw else raw
            }
          lastLong = v; Long.box(v)
        case 0x10 => // DOUBLE (IEEE754 or scaled BigDecimal)
          val v =
            if ((flags & 0x01) != 0) lastDouble
            else if ((flags & 0x04) != 0)
              java.lang.Double.longBitsToDouble(c.raw8())
            else {
              val scale = c.u8().toByte.toInt // signed scale byte
              val unscaled = c.varZ()
              java.math.BigDecimal.valueOf(unscaled, scale).doubleValue()
            }
          lastDouble = v; Double.box(v)
        case 0x18 => // STRING / BINARY
          val isBinary = (flags & 0x02) != 0
          if ((flags & 0x01) != 0) {
            // IDENTICAL replays the last string bytes; the binary bit
            // is carried per point (GTSEncoder sets it even when
            // identical), so the current flags choose the shape
            if (isBinary) lastString.getBytes(StandardCharsets.ISO_8859_1)
            else lastString
          } else {
            val bytes = c.bytes(c.varU().toInt)
            if (isBinary) {
              lastString = new String(bytes, StandardCharsets.ISO_8859_1)
              bytes
            } else {
              lastString = new String(bytes, StandardCharsets.UTF_8)
              lastString
            }
          }
        case _ => // BOOLEAN / delete marker
          (flags & 0x07) match {
            case 0x04 => Boolean.box(true)
            case 0x02 => Boolean.box(false)
            case 0x07 => null // delete tombstone
            case o => throw new IllegalArgumentException(
              s"invalid boolean flags 0x${o.toHexString}")
          }
      }
      out += WPoint(ts, location, elevation, value)
    }
    out.result()
  }

  /** Emit direction — mirrors the reference's flag-selection logic
    * byte for byte (GTSEncoder.addValue:266-610): first point raw
    * absolute, then the closer of base/previous delta when < 2^48;
    * identical/delta/zigzag value forms chosen with the same tests. */
  def encodePoints(points: Seq[WPoint], base: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream
    var lastTs = 0L
    var lastLong = 0L; var validLastLong = false
    var lastDouble = 0.0d; var validLastDouble = false
    var lastString: String = null; var validLastString = false
    var lastGeo = 0L; var validGeo = false
    var lastElev = 0L; var validElev = false
    for (p <- points) {
      var flags = 0
      // timestamp mode — a FRESH encoder delta-encodes the first point
      // against base too (GTSEncoder.addValue:313-345:
      // noDeltaMetaTimestamp defaults false; only safeDelta() forces
      // the raw-absolute first point — r13, caught by the reference's
      // own GTSEncoderTest.testEncoding vectors). The lastTs == 0
      // sentinel quirk (`0L != lastTimestamp`) is the reference's own.
      val tsMode: Int =
        if (p.ts == base) 0x20
        else if (lastTs != 0L) {
          val dBase = math.abs(p.ts - base); val dLast = math.abs(p.ts - lastTs)
          if (dBase < dLast) { if (dBase < (1L << 48)) 0x40 else 0x60 }
          else { if (dLast < (1L << 48)) 0x00 else 0x60 }
        } else if (math.abs(p.ts - base) < (1L << 48)) 0x40
        else 0x60
      flags |= tsMode
      // value mode
      var longDelta = false; var longZigzag = false
      var doubleIeee = false; var identical = false
      p.value match {
        case l: Long =>
          flags |= 0x08
          if (validLastLong && l == lastLong) identical = true
          else {
            val off = l - lastLong
            if (validLastLong && math.abs(off) < math.abs(l) &&
                math.abs(off) < (1L << 48)) { longDelta = true; longZigzag = true }
            else if (math.abs(l) < (1L << 48)) longZigzag = true
          }
        case b: Boolean => flags |= (if (b) 0x04 else 0x02)
        case null => flags |= 0x07
        case s: String =>
          flags |= 0x18
          if (validLastString && s == lastString) identical = true
        case b: Array[Byte] =>
          flags |= 0x18 | 0x02
          val asStr = new String(b, StandardCharsets.ISO_8859_1)
          if (validLastString && asStr == lastString) identical = true
        case d: Double =>
          flags |= 0x10
          if (validLastDouble && (d == lastDouble ||
              (d.isNaN && lastDouble.isNaN))) identical = true
          else doubleIeee = true // the plain-Double path always IEEE754
        case o => throw new IllegalArgumentException(s"encoder value: $o")
      }
      if (identical) flags |= 0x01
      if (longZigzag || doubleIeee) flags |= 0x04 // shared bit position
      if (longDelta) flags |= 0x02
      // location / elevation flags
      var locElev = 0
      val hasLoc = p.location.isDefined && p.value != null
      val hasElev = p.elevation.isDefined && p.value != null
      if (hasLoc) {
        flags |= 0x80; locElev |= 0x40
        if (validGeo) {
          if (lastGeo == p.location.get) locElev |= 0x10
          else if (math.abs(p.location.get - lastGeo) < (1L << 48)) locElev |= 0x20
        }
      }
      if (hasElev) {
        flags |= 0x80; locElev |= 0x08
        val e = p.elevation.get
        if (validElev) {
          if (lastElev == e) locElev |= 0x01
          else {
            val d = e - lastElev
            if (math.abs(d) < (1L << 48)) locElev |= 0x06 // delta + zigzag
            else if (math.abs(e) < (1L << 48)) locElev |= 0x04
          }
        } else if (math.abs(e) < (1L << 48)) locElev |= 0x04
      }
      // ---- write
      out.write(flags)
      if ((flags & 0x80) != 0) out.write(locElev)
      tsMode match {
        case 0x60 => writeRaw8(out, p.ts)
        case 0x20 =>
        case 0x40 => writeVarZ(out, p.ts - base)
        case _ => writeVarZ(out, p.ts - lastTs)
      }
      lastTs = p.ts
      if (hasLoc) {
        val g = p.location.get
        if ((locElev & 0x10) == 0) {
          if ((locElev & 0x20) != 0) writeVarZ(out, g - lastGeo)
          else writeRaw8(out, g)
        }
        lastGeo = g; validGeo = true
      } else validGeo = false
      if (hasElev) {
        val e = p.elevation.get
        if ((locElev & 0x01) == 0) {
          val toenc = if ((locElev & 0x02) != 0) e - lastElev else e
          if ((locElev & 0x04) != 0) writeVarZ(out, toenc)
          else writeRaw8(out, toenc)
        }
        lastElev = e; validElev = true
      } else validElev = false
      p.value match {
        case l: Long =>
          if (!identical) {
            val toenc = if (longDelta) l - lastLong else l
            if (longZigzag) writeVarZ(out, toenc) else writeRaw8(out, toenc)
          }
          lastLong = l; validLastLong = true
        case d: Double =>
          if (!identical) {
            writeRaw8(out, java.lang.Double.doubleToLongBits(d))
            lastDouble = d; validLastDouble = true
          }
        case s: String =>
          if (!identical) {
            val b = s.getBytes(StandardCharsets.UTF_8)
            writeVarU(out, b.length.toLong); out.write(b, 0, b.length)
            lastString = s; validLastString = true
          }
        case b: Array[Byte] =>
          if (!identical) {
            writeVarU(out, b.length.toLong); out.write(b, 0, b.length)
            lastString = new String(b, StandardCharsets.ISO_8859_1)
            validLastString = true
          }
        case _ => // boolean / delete in flags
      }
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // gzip passes (GTSWrapperHelper.java:139-210)
  // ------------------------------------------------------------------

  private def gunzipPasses(data: Array[Byte], passes: Int): Array[Byte] = {
    var cur = data
    var i = 0
    while (i < passes) {
      val in = new GZIPInputStream(new ByteArrayInputStream(cur))
      val out = new ByteArrayOutputStream
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      cur = out.toByteArray
      i += 1
    }
    cur
  }

  private[graft] def gzipPass(data: Array[Byte]): Array[Byte] = {
    val baos = new ByteArrayOutputStream
    val gz = new GZIPOutputStream(baos)
    gz.write(data); gz.close()
    val b = baos.toByteArray
    b(9) = 0x00 // force OS id, GTSWrapperHelper.java:183
    b
  }

  // ------------------------------------------------------------------
  // Top level
  // ------------------------------------------------------------------

  /** Decode a reference WRAP blob (raw thrift bytes) to metadata +
    * points. */
  def unwrapBytes(raw: Array[Byte]): (Wrapper, Vector[WPoint]) = {
    val w = readWrapper(raw)
    val stream =
      if (w.compressed) gunzipPasses(w.encoded, math.max(w.compressionPasses, 1))
      else w.encoded
    (w, decodePoints(stream, w.base))
  }

  /** Decode the OPB64 string form (`WRAP` word output). */
  def unwrapString(opb64: String): (Wrapper, Vector[WPoint]) =
    unwrapBytes(opb64Decode(opb64))

  /** Emit a reference-format wrapper (`WRAP` semantics: compress=true
    * single pass when it helps; `includeMeta=false` = WRAPMV). */
  def wrapBytes(name: String, labels: Map[String, String],
      points: Seq[WPoint], base: Long = 0L,
      compress: Boolean = true, includeMeta: Boolean = true): Array[Byte] = {
    val encoded = encodePoints(points, base)
    val (body, compressed) =
      if (compress) {
        val z = gzipPass(encoded)
        if (z.length < encoded.length) (z, true) else (encoded, false)
      } else (encoded, false)
    writeWrapper(Wrapper(name, labels, Map.empty, base, body,
      points.length.toLong, compressed, 1, 0L, 0L, 0L), includeMeta)
  }

  def wrapString(name: String, labels: Map[String, String],
      points: Seq[WPoint], base: Long = 0L): String =
    opb64Encode(wrapBytes(name, labels, points, base))
}
