package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.queries.PgpVectors._
import graft.script.OpenPgp

/** Dev tool: emit our OpenPGP artifacts for external GnuPG
  * cross-validation (gpg --verify / --decrypt). */
object PgpInterop {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/pgp_interop")
    new java.io.File(outDir).mkdirs()
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val sr = OpenPgp.parseRings(hex(SEC)).head.asInstanceOf[OpenPgp.SecRing]
    val data = MSG.getBytes(StandardCharsets.UTF_8)
    val sig = OpenPgp.signDetached(sr.keys.head.unlock(""), data, "SHA256",
      System.currentTimeMillis() / 1000L)
    Files.write(Paths.get(outDir, "ours.sig"), sig)
    Files.writeString(Paths.get(outDir, "ours.sig.asc"), OpenPgp.armor("SIGNATURE", sig))
    val enc = OpenPgp.encrypt(sr.keys(1).pub, data, new java.util.Random(),
      throwKeyId = false, dateSec = System.currentTimeMillis() / 1000L)
    Files.write(Paths.get(outDir, "ours.enc"), enc)
    val op = OpenPgp.onePassMessage(sr.keys.head.unlock(""), data, "SHA256",
      System.currentTimeMillis() / 1000L,
      OpenPgp.signDetached(sr.keys.head.unlock(""), data, "SHA256",
        System.currentTimeMillis() / 1000L))
    Files.write(Paths.get(outDir, "ours.signed"), op)
    Console.err.println(s"wrote $outDir/ours.{sig,sig.asc,enc,signed}")
  }
}
