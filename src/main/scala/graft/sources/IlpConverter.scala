package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.model.{Gts, GtsType}

/** InfluxDB line protocol → GTS converter (reference:
  * plugins/influxdb/InfluxDBHandler.java + ILPTO.java — the reference
  * maps each ILP field to one GTS `measurement.field{tags}`).
  *
  * Grammar: `measurement[,tag=v...] field=value[,field=value...] [ts]`
  * with ns timestamps (converted to µs ticks), `i`-suffixed integers,
  * bare doubles, `"strings"`, and t/f/true/false booleans. Escapes
  * (`\,` `\ ` `\=`) are honored in identifiers and tag values.
  */
object IlpConverter {

  final case class IlpPoint(cls: String, labels: Map[String, String], ts: Long,
                            vtype: Byte, vlong: Option[Long],
                            vdouble: Option[Double], vbool: Option[Boolean],
                            vstring: Option[String])

  /** Split on a separator honoring backslash escapes. */
  private def splitEsc(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { cur.append(s.charAt(i + 1)); i += 2 }
      else if (c == sep) { out += cur.result(); cur.clear(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    out += cur.result()
    out.result()
  }

  /** Top-level split into (identity, fields, ts?) on UNQUOTED spaces. */
  private def splitTop(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '\\' && i + 1 < line.length) { cur.append(c).append(line.charAt(i + 1)); i += 2 }
      else if (c == '"') { inQuote = !inQuote; cur.append(c); i += 1 }
      else if (c == ' ' && !inQuote) { out += cur.result(); cur.clear(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    out += cur.result()
    out.result().filter(_.nonEmpty)
  }

  def parseLine(line: String, nowMicros: Long): Seq[IlpPoint] = {
    val parts = splitTop(line.trim)
    require(parts.length >= 2, s"ILP line needs measurement and fields: '$line'")
    val idParts = splitEsc(parts(0), ',')
    val measurement = idParts.head
    val tags = idParts.tail.map { t =>
      val kv = splitEsc(t, '=')
      kv(0) -> kv(1)
    }.toMap
    val ts = if (parts.length >= 3) parts(2).toLong / 1000L else nowMicros
    splitEsc(parts(1), ',').map { f =>
      val eq = f.indexOf('=')
      val name = f.substring(0, eq)
      val raw = f.substring(eq + 1)
      val cls = s"$measurement.$name"
      if (raw.startsWith("\"") && raw.endsWith("\"") && raw.length >= 2)
        IlpPoint(cls, tags, ts, GtsType.STRING, None, None, None,
          Some(raw.substring(1, raw.length - 1).replace("\\\"", "\"")))
      else if (raw == "t" || raw == "T" || raw.equalsIgnoreCase("true"))
        IlpPoint(cls, tags, ts, GtsType.BOOLEAN, None, None, Some(true), None)
      else if (raw == "f" || raw == "F" || raw.equalsIgnoreCase("false"))
        IlpPoint(cls, tags, ts, GtsType.BOOLEAN, None, None, Some(false), None)
      else if (raw.endsWith("i") || raw.endsWith("u"))
        IlpPoint(cls, tags, ts, GtsType.LONG,
          Some(raw.substring(0, raw.length - 1).toLong), None, None, None)
      else
        IlpPoint(cls, tags, ts, GtsType.DOUBLE, None, Some(raw.toDouble), None, None)
    }
  }

  /** Distributed conversion of an ILP text frame into the canonical
    * long table (malformed lines dropped, reference handler behavior). */
  def ingest(linesDf: DataFrame, nowMicros: Long): DataFrame = {
    val spark = linesDf.sparkSession
    val rows = linesDf.select(col("value").cast("string")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val line = r.getString(0).trim
        if (line.isEmpty || line.startsWith("#")) Seq.empty
        else try parseLine(line, nowMicros).map { p =>
          Row(p.cls, p.labels, 0L, p.ts, null, null, null, p.vtype,
            p.vlong.orNull, p.vdouble.orNull, p.vbool.orNull,
            p.vstring.orNull, null)
        } catch { case _: Exception => Seq.empty }
      }
    }
    Gts.canonicalRehash(spark.createDataFrame(rows, Gts.pointSchema))
  }
}
