package graft.script

import scala.collection.mutable.ArrayBuffer

/** WarpScript program tokens. The grammar is re-derived from the
  * reference's statement loop (MemoryWarpScriptStack.java:700-1010):
  * whitespace-separated RPN statements, line-based; `//` and `#` line
  * comments and `/&#42; &#42;/` block comments; single- or double-quoted
  * strings whose closing separator must be followed by whitespace or
  * end-of-line (so quotes may appear inside), percent-decoded at parse
  * time (MemoryWarpScriptStack.java:766 WarpURLDecoder); `<' '>`
  * multiline strings (taken verbatim, not decoded); `0x`/`0b` prefixed
  * longs; decimal longs and doubles; `T`/`F`/`true`/`false` booleans
  * (case-insensitive); everything else is a word statement — including
  * the structural words `[ ] { } <% %>` and `$var` / `!$var` variable
  * dereferences, which the evaluator interprets.
  */
sealed trait WsToken
object WsToken {
  final case class WsStr(v: String) extends WsToken
  final case class WsLong(v: Long) extends WsToken
  final case class WsDouble(v: Double) extends WsToken
  final case class WsBool(v: Boolean) extends WsToken
  final case class WsWord(name: String) extends WsToken
}

object WarpScriptTokenizer {
  import WsToken._

  /** Percent-decode like the reference's WarpURLDecoder: only `%xx`
    * escapes (NOT `+`), UTF-8. */
  private[script] def pctDecode(s: String): String = {
    if (!s.contains('%')) return s
    val bytes = new ArrayBuffer[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        bytes += Integer.parseInt(s.substring(i + 1, i + 3), 16).toByte
        i += 3
      } else {
        val enc = c.toString.getBytes("UTF-8")
        bytes ++= enc
        i += 1
      }
    }
    new String(bytes.toArray, "UTF-8")
  }

  private def isLong(s: String): Boolean =
    s.nonEmpty && s.exists(_.isDigit) &&
      s.matches("[+-]?[0-9]+") &&
      (try { s.toLong; true } catch { case _: NumberFormatException => false })

  private def isDouble(s: String): Boolean =
    s.matches("[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?") &&
      (s.exists(c => c == '.' || c == 'e' || c == 'E')) &&
      (try { s.toDouble; true } catch { case _: NumberFormatException => false })

  def tokenize(program: String): Vector[WsToken] = {
    val out = Vector.newBuilder[WsToken]
    var inBlockComment = false
    var multiline: StringBuilder = null

    for (rawLine <- program.split("\n", -1)) {
      val line = rawLine
      // multiline string mode: accumulate verbatim until a line that is '>
      if (multiline != null && line.trim != "'>") {
        if (multiline.nonEmpty) multiline.append('\n')
        multiline.append(line)
      } else if (multiline != null) { // closing '>
        out += WsStr(multiline.toString)
        multiline = null
      } else {
        var pos = 0
        var stop = false
        while (pos < line.length && !stop) {
          if (inBlockComment) {
            val end = line.indexOf("*/", pos)
            if (end < 0) { pos = line.length }
            else { inBlockComment = false; pos = end + 2 }
          } else if (line.charAt(pos) <= ' ') {
            pos += 1
          } else if (line.charAt(pos) == '#' ||
            (pos + 1 < line.length && line.charAt(pos) == '/' && line.charAt(pos + 1) == '/')) {
            stop = true // line comment
          } else if (pos + 1 < line.length && line.charAt(pos) == '/' && line.charAt(pos + 1) == '*') {
            inBlockComment = true; pos += 2
          } else if (line.charAt(pos) == '\'' || line.charAt(pos) == '"') {
            // string: closing separator must sit at (trimmed) EOL or be
            // followed by a space (MemoryWarpScriptStack.java:729-748)
            val sep = line.charAt(pos)
            var trimmed = line.length - 1
            while (trimmed > 0 && line.charAt(trimmed) <= ' ') trimmed -= 1
            trimmed += 1
            var end = -1
            var i = pos + 1
            while (end < 0 && i < trimmed) {
              if (line.charAt(i) == sep &&
                (i == trimmed - 1 || line.charAt(i + 1) == ' ')) end = i
              i += 1
            }
            // "<'" opens a multiline string when alone on its line
            if (sep == '\'' && pos > 0 && line.charAt(pos - 1) == '<' && line.trim == "<'") {
              multiline = new StringBuilder; stop = true
            } else if (end < 0) {
              throw new IllegalArgumentException(s"cannot find end of string: $line")
            } else {
              out += WsStr(pctDecode(line.substring(pos + 1, end)))
              pos = end + 1
            }
          } else if (line.charAt(pos) == '<' && pos + 1 < line.length &&
            line.charAt(pos + 1) == '\'' && line.trim == "<'") {
            multiline = new StringBuilder; stop = true
          } else {
            var end = pos
            while (end < line.length && line.charAt(end) > ' ') end += 1
            val stmt = line.substring(pos, end)
            out += tokenizeStatement(stmt)
            pos = end
          }
        }
      }
    }
    if (multiline != null) throw new IllegalArgumentException("unterminated multiline string")
    if (inBlockComment) throw new IllegalArgumentException("unterminated block comment")
    out.result()
  }

  private def tokenizeStatement(stmt: String): WsToken = {
    if (stmt.length > 2 && stmt.startsWith("0x"))
      WsLong(java.lang.Long.parseUnsignedLong(stmt.substring(2), 16))
    else if (stmt.length > 2 && stmt.startsWith("0b"))
      WsLong(java.lang.Long.parseUnsignedLong(stmt.substring(2), 2))
    else if (isLong(stmt)) WsLong(stmt.toLong)
    else if (isDouble(stmt)) WsDouble(stmt.toDouble)
    else if (stmt.equalsIgnoreCase("T") || stmt.equalsIgnoreCase("true")) WsBool(true)
    else if (stmt.equalsIgnoreCase("F") || stmt.equalsIgnoreCase("false")) WsBool(false)
    else if (stmt.length > 1 && stmt.head == stmt.last && (stmt.head == '\'' || stmt.head == '"'))
      WsStr(pctDecode(stmt.substring(1, stmt.length - 1)))
    else WsWord(stmt)
  }
}
