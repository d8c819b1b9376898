package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream, Deflater, Inflater}

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** GZIP/UNGZIP, DEFLATE/INFLATE, HMAC (fn/GZIP.java, fn/UNGZIP.java,
  * fn/DEFLATE.java, fn/INFLATE.java, fn/HMAC.java) — binary-column
  * utility words on JDK built-ins (java.util.zip, javax.crypto). Kept
  * as narrow UDFs: compression/crypto is bytes→bytes with no columnar
  * shortcut, identical to the reference's per-value calls; spec-gated
  * (no DuckDB analogue), with ScalaTest round-trip/vector coverage.
  */
object Compress {

  private[graft] def gzipBytes(in: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(in); g.close()
    bos.toByteArray
  }

  private[graft] def gunzipBytes(in: Array[Byte]): Array[Byte] = {
    val g = new GZIPInputStream(new ByteArrayInputStream(in))
    val out = g.readAllBytes(); g.close(); out
  }

  private[graft] def deflateBytes(in: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(in); d.finish()
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end(); bos.toByteArray
  }

  private[graft] def inflateBytes(in: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(in)
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      // inflate() returns 0 with needsInput()/needsDictionary() set when
      // the stream is truncated or wants a preset dictionary; finished()
      // would never flip, so raise like GZIPInputStream does on EOF.
      if (n == 0 && !inf.finished()) {
        inf.end()
        throw new java.util.zip.ZipException(
          if (inf.needsDictionary()) "deflate stream needs a preset dictionary"
          else "truncated or corrupt deflate stream")
      }
      bos.write(buf, 0, n)
    }
    inf.end(); bos.toByteArray
  }

  private[graft] def hmacBytes(key: Array[Byte], in: Array[Byte],
                        algo: String): Array[Byte] = {
    val mac = Mac.getInstance(algo)
    mac.init(new SecretKeySpec(key, algo))
    mac.doFinal(in)
  }

  val gzip: Column => Column = udf(gzipBytes _).apply(_)
  val ungzip: Column => Column = udf(gunzipBytes _).apply(_)
  val deflate: Column => Column = udf(deflateBytes _).apply(_)
  val inflate: Column => Column = udf(inflateBytes _).apply(_)

  /** HMAC-SHA256 of a binary column under a literal key. */
  def hmacSha256(key: Array[Byte], c: Column): Column =
    udf((in: Array[Byte]) => hmacBytes(key, in, "HmacSHA256")).apply(c)
}
