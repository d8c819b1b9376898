package graft.script

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.GtsFrame
import graft.operators.GtsFrame._

/** WarpScript text front end: an RPN stack evaluator that COMPILES
  * programs onto the [[GtsFrame]] operator algebra — the frame words
  * (FETCH/BUCKETIZE/MAP/REDUCE/APPLY/FILTER/...) build lazy DataFrames,
  * so a WarpScript program becomes one Catalyst plan with zero
  * interpretation cost at execution time; only scalar words run on the
  * driver. This is the reference's user-facing language
  * (WarpScriptLib.java registry; fn/&#42;.java words) re-expressed over
  * Spark: a Warp 10 user can paste the core of their scripts.
  *
  * Word semantics re-derived from the reference (cited per word below);
  * the GTS object model differs by design: a [[GtsFrame]] IS a set of
  * series (gtsid-keyed long table), so a "list of GTS" and a frame are
  * interchangeable here — frame words accept both and merge lists.
  *
  * @param fetch  storage access for FETCH: (classSelector, labelSelectors,
  *               startTs, endTs) => frame. Supplied by the host (a
  *               LongTable scan, a parquet dir, a test fixture...).
  * @param nowTs  the tick NOW pushes (fn/NOW.java) — injected for
  *               determinism.
  */
final class WarpScriptEngine(
    fetch: (String, Map[String, String], Long, Long) => GtsFrame,
    nowTs: Long = 0L,
    session: Option[org.apache.spark.sql.SparkSession] = None) {

  import WsToken._
  import WarpScriptEngine._

  /** Last TRY-caught error message (reference ATTRIBUTE_LAST_ERROR). */
  private var lastError: String = _
  private[script] def setLastError(msg: String): Unit = lastError = msg

  /** Deterministic PRNG behind RAND/SHUFFLE — the reference draws from
    * an unseeded java.util.Random (RAND.java); a fixed default seed
    * (re-seedable via SRAND) keeps scripts replayable here. */
  private[script] val prng = new java.util.Random(42L)

  /** SECTION marker for error reporting (fn/SECTION.java). */
  private[script] var section: String = _

  /** JSONLOOSE/JSONSTRICT parse-mode flag (NaN tolerance). */
  private[script] var jsonLoose: Boolean = false

  private[script] def nowTick: Long = nowTs
  private[script] def sparkSessionOpt: Option[org.apache.spark.sql.SparkSession] = session
  private[script] def execProgram(s: String, st: State): Unit =
    exec(WarpScriptTokenizer.tokenize(s), st)
  private[script] def evalWordPub(w: String, st: State): Unit = evalWord(w, st)
  private[script] def fetchPub(cls: String, labels: Map[String, String],
      start: Long, stop: Long): GtsFrame = fetch(cls, labels, start, stop)

  /** Run a program over an initially empty stack; returns the final
    * stack, top first. */
  def run(program: String): List[Any] = {
    val st = new State
    try exec(WarpScriptTokenizer.tokenize(program), st)
    catch { case _: WsStopEx => } // fn/STOP.java: silent end of program
    st.stack.toList
  }

  /** Run a program whose result (top of stack) is a GTS frame (or a
    * list of frames — merged). */
  def runToFrame(program: String): DataFrame =
    toFrame(run(program).headOption.getOrElse(
      throw new IllegalStateException("empty stack after program"))).df

  // ---------------------------------------------------------------- core

  /** (gtsid → class, labels) side table for kernel words that return
    * compact per-series frames. */
  private[script] def metaOf(f: GtsFrame): org.apache.spark.sql.DataFrame =
    f.df.groupBy(col("gtsid"))
      .agg(first(col("class")).as("class"), first(col("labels")).as("labels"))

  private def exec(tokens: Vector[WsToken], st: State): Unit = {
    var i = 0
    var macroDepth = 0
    var macroBuf: mutable.ArrayBuffer[WsToken] = null
    while (i < tokens.length) {
      val t = tokens(i)
      if (macroDepth > 0) {
        t match {
          case WsWord("<%") => macroDepth += 1; macroBuf += t
          case WsWord("%>") =>
            macroDepth -= 1
            if (macroDepth == 0) st.push(WsMacro(macroBuf.toVector))
            else macroBuf += t
          case other => macroBuf += other
        }
      } else t match {
        case WsWord("<%") => macroDepth = 1; macroBuf = mutable.ArrayBuffer.empty
        case WsWord("%>") => throw new IllegalStateException("%> outside macro")
        case WsStr(s) => st.push(s)
        case WsLong(l) => st.push(l)
        case WsDouble(d) => st.push(d)
        case WsBool(b) => st.push(b)
        case WsWord(w) => evalWord(w, st)
      }
      i += 1
    }
    if (macroDepth > 0) throw new IllegalStateException("unterminated macro")
  }

  /** Evaluate a macro; a macro boundary absorbs one RETURN level
    * (fn/RETURN.java: COUNTER_RETURN_DEPTH decrements per frame,
    * NRETURN unwinds several). */
  private[script] def evalMacro(m: WsMacro, st: State): Unit =
    try exec(m.tokens, st)
    catch {
      case r: WsReturnEx =>
        r.levels -= 1
        if (r.levels > 0) throw r
    }

  // ---------------------------------------------------------------- words

  private def evalWord(w: String, st: State): Unit = {
    st.ops += 1 // fn/OPS.java: operations performed so far
    if (st.defs.contains(w)) { evalMacro(st.defs(w), st); return }
    evalWordDispatch(w, st)
  }

  private def evalWordDispatch(w: String, st: State): Unit = w match {
    // ---- structure: lists and maps (MemoryWarpScriptStack MARK/ENDLIST)
    case "[" => st.push(ListMark)
    case "]" =>
      val items = mutable.ArrayBuffer.empty[Any]
      var v = st.pop()
      while (v != ListMark) { items.prepend(v); v = st.pop() }
      st.push(items.toVector)
    case "{" => st.push(MapMark)
    case "}" =>
      val pairs = mutable.ArrayBuffer.empty[(Any, Any)]
      var v = st.pop()
      while (v != MapMark) {
        val k = st.pop()
        if (k == MapMark) throw new IllegalStateException("odd map entries")
        pairs.prepend((k, v)); v = st.pop()
      }
      st.push(pairs.toMap)

    // ---- variables (fn/STORE.java, $deref MemoryWarpScriptStack.java:973)
    // STORE accepts a name, a LONG register number, or a list of
    // names/registers consuming one stack value per non-null entry,
    // top value bound to the LAST name (fn/STORE.java:48-90)
    case "STORE" => st.pop() match {
      case name: String => st.symbols(name) = st.pop()
      case r: Long => st.regs(r.toInt) = st.pop()
      case names: Vector[Any @unchecked] =>
        names.reverse.foreach {
          case null => st.pop()
          case s: String => st.symbols(s) = st.pop()
          case r: Long => st.regs(r.toInt) = st.pop()
          case o => throw new IllegalArgumentException(s"STORE name: $o")
        }
      case o => throw new IllegalArgumentException(s"STORE name: $o")
    }
    case "LOAD" => st.pop() match {
      case r: Long => st.push(st.regs(r.toInt))
      case name: String => st.push(st.symbols.getOrElse(name,
        throw new IllegalArgumentException("unknown symbol")))
      case o => throw new IllegalArgumentException(s"LOAD name: $o")
    }
    case v if v.startsWith("!$") => st.push(st.symbols.getOrElse(v.substring(2),
      throw new IllegalArgumentException(s"unknown symbol '${v.substring(2)}'")))
    case v if v.startsWith("$") && v.length > 1 => st.push(st.symbols.getOrElse(v.substring(1),
      throw new IllegalArgumentException(s"unknown symbol '${v.substring(1)}'")))

    // ---- stack words (fn/DUP.java, SWAP, DROP, CLEAR, DEPTH, PICK, ROT)
    case "DUP" => val v = st.pop(); st.push(v); st.push(v)
    case "SWAP" => val a = st.pop(); val b = st.pop(); st.push(a); st.push(b)
    case "DROP" => st.pop()
    case "CLEAR" => st.stack.clear()
    case "DEPTH" => st.push(st.stack.length.toLong)
    case "PICK" => val n = st.popLong().toInt; st.push(st.stack(n - 1))
    case "ROT" =>
      val a = st.pop(); val b = st.pop(); val c = st.pop()
      st.push(b); st.push(a); st.push(c)
    // DUPN (MemoryWarpScriptStack.dupn:341): duplicate the top n
    // elements as a block, order preserved
    case "DUPN" =>
      val n = st.popLong().toInt
      require(n >= 0 && n <= st.stack.length, s"DUPN out of bounds: $n")
      st.stack.take(n).reverse.foreach(st.push)
    // ROLL (stack.roll:443): move the n-th element (1 = top) to the top
    case "ROLL" =>
      val n = st.popLong().toInt
      require(n >= 1 && n <= st.stack.length, s"ROLL out of bounds: $n")
      st.push(st.stack.remove(n - 1))
    // ROLLD (stack.rolld:1374): move the top element down to depth n
    case "ROLLD" =>
      val n = st.popLong().toInt
      require(n >= 1 && n <= st.stack.length, s"ROLLD out of bounds: $n")
      val v = st.pop()
      st.stack.insert(n - 1, v)
    // TYPEOF (fn/TYPEOF.java:118-160 type names)
    case "TYPEOF" => st.push(WarpScriptEngine.typeNameOf(st.pop()))
    // DEFINED (fn/DEFINED.java): symbol-table membership
    case "DEFINED" => st.push(st.symbols.contains(st.popStr()))

    // ---- scalar arithmetic (fn/ADD.java promotion: long+long stays
    // long; matrix/vector overloads like the binary op matrix forms)
    case "+" =>
      if (!matBin(st, "+")) binNum(st, _ + _, _ + _, Some(_ + _))
    case "-" =>
      if (!matBin(st, "-")) binNum(st, _ - _, _ - _)
    case "*" =>
      if (!matBin(st, "*")) binNum(st, _ * _, _ * _)
    case "/" => binNum(st, _ / _, _ / _) // long/long stays long (binary/DIV.java:71)
    case "%" => val b = st.pop(); val a = st.pop(); (a, b) match {
      case (x: Long, y: Long) => st.push(x % y)
      case _ => throw new IllegalArgumentException("% expects longs")
    }
    case "**" => val b = st.popNum(); val a = st.popNum(); st.push(math.pow(a, b))
    case "ABS" => st.pop() match {
      case l: Long => st.push(math.abs(l))
      case d: Double => st.push(math.abs(d))
      case o => throw new IllegalArgumentException(s"ABS on $o")
    }
    case "SQRT" => st.push(math.sqrt(st.popNum()))
    case "EXP" => st.push(math.exp(st.popNum()))
    case "LN" => st.push(math.log(st.popNum()))
    case "LOG10" => st.push(math.log10(st.popNum()))
    case "SIN" => st.push(math.sin(st.popNum()))
    case "COS" => st.push(math.cos(st.popNum()))
    case "TAN" => st.push(math.tan(st.popNum()))
    case "ASIN" => st.push(math.asin(st.popNum()))
    case "ACOS" => st.push(math.acos(st.popNum()))
    case "ATAN" => st.push(math.atan(st.popNum()))
    case "PI" => st.push(math.Pi)
    case "E" => st.push(math.E)
    // java.lang.Math tail (WarpScriptLib registrations: CBRT, SIGNUM,
    // SINH/COSH/TANH, TORADIANS/TODEGREES, ATAN2, HYPOT, EXPM1, LOG1P,
    // IEEEREMAINDER, COPYSIGN, NEXTAFTER, RINT, FLOORDIV, FLOORMOD)
    case "CBRT" => st.push(math.cbrt(st.popNum()))
    case "SIGNUM" => st.pop() match {
      case l: Long => st.push(java.lang.Long.signum(l).toLong)
      case d: Double => st.push(math.signum(d))
      case o => throw new IllegalArgumentException(s"SIGNUM on $o")
    }
    case "SINH" => st.push(math.sinh(st.popNum()))
    case "COSH" => st.push(math.cosh(st.popNum()))
    case "TANH" => st.push(math.tanh(st.popNum()))
    case "TORADIANS" => st.push(math.toRadians(st.popNum()))
    case "TODEGREES" => st.push(math.toDegrees(st.popNum()))
    case "ATAN2" => val x = st.popNum(); val y = st.popNum(); st.push(math.atan2(y, x))
    case "HYPOT" => val y = st.popNum(); val x = st.popNum(); st.push(math.hypot(x, y))
    case "EXPM1" => st.push(math.expm1(st.popNum()))
    case "LOG1P" => st.push(math.log1p(st.popNum()))
    case "IEEEREMAINDER" => val y = st.popNum(); val x = st.popNum()
      st.push(math.IEEEremainder(x, y))
    case "COPYSIGN" => val sign = st.popNum(); val mag = st.popNum()
      st.push(math.copySign(mag, sign))
    case "NEXTAFTER" => val dir = st.popNum(); val start = st.popNum()
      st.push(math.nextAfter(start, dir))
    case "RINT" => st.push(math.rint(st.popNum()))
    case "FLOORDIV" => val b = st.popLong(); val a = st.popLong()
      st.push(Math.floorDiv(a, b))
    case "FLOORMOD" => val b = st.popLong(); val a = st.popLong()
      st.push(Math.floorMod(a, b))
    // TOGEOHASH (fn/TOGEOHASH.java lat/lon form): lat lon → max-
    // precision geohash text; GEOHASHTO decodes to the cell CENTER
    // (lat then lon — the reference's HHCode form is toHHCode)
    case "TOGEOHASH" =>
      val lon = st.popNum(); val lat = st.popNum()
      st.push(graft.functions.GeoHash.encodeScalar(lat, lon, 12))
    case "GEOHASHTO" =>
      val (la, lo) = graft.functions.GeoHash.decodeScalar(st.popStr())
      st.push(la); st.push(lo)
    // HAVERSINE (fn/HAVERSINE.java): lat1 lon1 lat2 lon2 → meters
    case "HAVERSINE" =>
      val lon2 = st.popNum(); val lat2 = st.popNum()
      val lon1 = st.popNum(); val lat1 = st.popNum()
      val toRad = math.Pi / 180.0
      val a = math.pow(math.sin((lat2 - lat1) * toRad / 2), 2) +
        math.cos(lat1 * toRad) * math.cos(lat2 * toRad) *
          math.pow(math.sin((lon2 - lon1) * toRad / 2), 2)
      st.push(2.0 * 6378137.0 * math.asin(math.sqrt(a)))
    case "FLOOR" => st.push(math.floor(st.popNum()).toLong)
    case "CEIL" => st.push(math.ceil(st.popNum()).toLong)
    case "ROUND" => st.push(math.rint(st.popNum()).toLong)
    case "MIN" => binNum(st, math.min, math.min)
    case "MAX" => binNum(st, math.max, math.max)
    case "TODOUBLE" => st.push(st.popNum())
    case "TOLONG" => st.push(st.popNum().toLong)
    case "TOSTRING" => st.push(String.valueOf(st.pop()))

    // ---- string words (fn/SUBSTRING.java, SPLIT, JOIN, TEMPLATE family)
    case "TOUPPER" => st.push(st.popStr().toUpperCase)
    case "TOLOWER" => st.push(st.popStr().toLowerCase)
    // encodings (fn/TOB64.java, B64TO, TOHEX, fn/ISO8601.java).
    // B64TO pushes BYTES like the reference (B64TO.java:37) — follow
    // with `'UTF-8' BYTES->` for text.
    case "TOB64" => st.push(java.util.Base64.getEncoder.encodeToString(popBytes(st)))
    case "B64TO" => st.push(java.util.Base64.getDecoder.decode(
      st.popStr().replace("\n", "").replace("\r", "").replace(" ", "")))
    // TOHEX (fn/TOHEX.java): LONG → unpadded hex; STRING/BYTES → hex
    // of the UTF-8 bytes / raw bytes
    case "TOHEX" => st.pop() match {
      case l: Long => st.push(java.lang.Long.toHexString(l))
      case b: Array[Byte] => st.push(b.map("%02x".format(_)).mkString)
      case s: String => st.push(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .map("%02x".format(_)).mkString)
      case o => throw new IllegalArgumentException(s"TOHEX on $o")
    }
    // ->BYTES / BYTES-> (fn/TOBYTES.java, fn/BYTESTO.java): string ↔
    // byte array under an explicit charset
    case "->BYTES" =>
      val cs = st.popStr(); st.push(st.popStr().getBytes(cs))
    case "BYTES->" =>
      val cs = st.popStr()
      st.push(new String(st.pop().asInstanceOf[Array[Byte]], cs))
    // TOBIN (fn/TOBIN.java): LONG → 64-bit binary text; STRING → bits
    // of its UTF-8 bytes
    case "TOBIN" => st.pop() match {
      case l: Long =>
        val s = "0" * 64 + java.lang.Long.toBinaryString(l)
        st.push(s.substring(s.length - 64))
      case s: String =>
        val sb = new StringBuilder
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
          var i = 7
          while (i >= 0) { sb.append((b >> i) & 1); i -= 1 }
        }
        st.push(sb.toString)
      case o => throw new IllegalArgumentException(s"TOBIN on $o")
    }
    // INDEXOF (fn/INDEXOF.java): coll item n INDEXOF → list of the
    // first n matching indices (n <= 0 = all)
    case "INDEXOF" =>
      val nRaw = st.popLong()
      val limit = if (nRaw <= 0) Long.MaxValue else nRaw
      val item = st.pop()
      val l = st.pop().asInstanceOf[Vector[Any]]
      st.push(l.zipWithIndex.collect { case (e, i) if e == item => i.toLong }
        .take(math.min(limit, Int.MaxValue).toInt))
    case "ISO8601" => // µs tick → UTC ISO text (reference time unit)
      val t = st.popLong()
      st.push(java.time.Instant.ofEpochSecond(
          Math.floorDiv(t, 1000000L), Math.floorMod(t, 1000000L) * 1000L)
        .toString)
    case "TRIM" => st.push(st.popStr().trim)
    // URLENCODE/URLDECODE (fn/URLENCODE.java, fn/URLDECODE.java)
    case "URLENCODE" => st.push(java.net.URLEncoder.encode(
      st.popStr(), java.nio.charset.StandardCharsets.UTF_8))
    case "URLDECODE" => st.push(java.net.URLDecoder.decode(
      st.popStr(), java.nio.charset.StandardCharsets.UTF_8))
    case "SUBSTRING" => // str start [len] — 2-arg form: str start
      val b = st.pop(); val a = st.pop()
      (a, b) match {
        case (s: String, from: Long) => st.push(s.substring(from.toInt))
        case (from: Long, len: Long) =>
          val s = st.popStr(); st.push(s.substring(from.toInt, (from + len).toInt))
        case other => throw new IllegalArgumentException(s"SUBSTRING args: $other")
      }
    case "SPLIT" => val sep = st.popStr(); val s = st.popStr()
      st.push(s.split(java.util.regex.Pattern.quote(sep), -1).toVector)
    case "JOIN" => val sep = st.popStr()
      st.push(st.pop().asInstanceOf[Vector[Any]].map(String.valueOf).mkString(sep))
    case "REPLACE" => val r = st.popStr(); val p = st.popStr(); val s = st.popStr()
      st.push(s.replace(p, r))
    case "REPLACEALL" => val r = st.popStr(); val p = st.popStr(); val s = st.popStr()
      st.push(s.replaceAll(p, r))
    case "MATCHES" => val p = st.popStr(); val s = st.popStr()
      st.push(s.matches(p))
    case "CONTAINS" => val n = st.pop(); st.pop() match {
      case s: String => st.push(s.contains(String.valueOf(n)))
      case l: Vector[_] => st.push(l.contains(n))
      case o => throw new IllegalArgumentException(s"CONTAINS on $o")
    }
    // selector words (fn/TOSELECTOR.java, PARSESELECTOR.java)
    case "TOSELECTOR" =>
      val labels = st.pop().asInstanceOf[Map[Any, Any]]
      val cls = st.popStr()
      val l = labels.map { case (k, v) => s"$k=$v" }.toSeq.sorted.mkString(",")
      st.push(s"$cls{$l}")
    case "PARSESELECTOR" =>
      val sel = st.popStr()
      val i = sel.indexOf('{')
      if (i < 0) { st.push(sel); st.push(Map.empty[Any, Any]) }
      else {
        val cls = sel.substring(0, i)
        val body = sel.substring(i + 1, sel.lastIndexOf('}'))
        val m: Map[Any, Any] = body.split(",").filter(_.nonEmpty).map { kv =>
          val Array(k, v) = kv.split("=", 2); (k: Any) -> (v: Any)
        }.toMap
        st.push(cls); st.push(m)
      }

    // ---- comparison / boolean (fn/EQ.java family)
    case "==" => val b = st.pop(); val a = st.pop(); st.push(numEq(a, b))
    case "!=" => val b = st.pop(); val a = st.pop(); st.push(!numEq(a, b))
    case "<" => cmp(st, _ < 0)
    case ">" => cmp(st, _ > 0)
    case "<=" => cmp(st, _ <= 0)
    case ">=" => cmp(st, _ >= 0)
    case "AND" | "&&" => val b = st.pop(); val a = st.pop(); st.push(bool(a) && bool(b))
    case "OR" | "||" => val b = st.pop(); val a = st.pop(); st.push(bool(a) || bool(b))
    case "NOT" | "!" => st.push(!bool(st.pop()))
    case "ISNULL" => st.push(st.pop() == null)
    case "NULL" => st.push(null)
    case "NaN" => st.push(Double.NaN) // fn/NaN.java (WarpScriptLib.java:1226)
    case "ISNaN" => st.push(st.pop() match {
      case d: Double => d.isNaN
      case _ => false
    })

    // ---- time (fn/NOW.java; duration words fn/TOTIMESTAMP-adjacent:
    // the reference registers w/d/h/m/s/ms/us µs-multiplier words)
    case "NOW" => st.push(nowTs)
    // TSELEMENTS (fn/TSELEMENTS.java:80-104): tick [tz] → [ year month
    // day hour minute second micros-in-second dayOfYear isoDayOfWeek
    // isoWeek ] — µs platform time unit, floor division to millis
    case "TSELEMENTS" | "->TSELEMENTS" =>
      val tz = st.stack.headOption match {
        case Some(s: String) => st.pop(); s
        case _ => "UTC"
      }
      val ts = st.popLong()
      val tsms = Math.floorDiv(ts, 1000L)
      val zdt = java.time.Instant.ofEpochMilli(tsms)
        .atZone(java.time.ZoneId.of(tz))
      val microsInSecond =
        zdt.getLong(java.time.temporal.ChronoField.MILLI_OF_SECOND) * 1000L +
          (ts - tsms * 1000L)
      st.push(Vector[Any](
        zdt.getYear.toLong, zdt.getMonthValue.toLong, zdt.getDayOfMonth.toLong,
        zdt.getHour.toLong, zdt.getMinute.toLong, zdt.getSecond.toLong,
        microsInSecond, zdt.getDayOfYear.toLong,
        zdt.getDayOfWeek.getValue.toLong,
        zdt.get(java.time.temporal.IsoFields.WEEK_OF_WEEK_BASED_YEAR).toLong))
    case "w" => st.push(st.popLong() * 7L * 86400000000L)
    case "d" => st.push(st.popLong() * 86400000000L)
    case "h" => st.push(st.popLong() * 3600000000L)
    case "m" => st.push(st.popLong() * 60000000L)
    case "s" => st.push(st.popLong() * 1000000L)
    case "ms" => st.push(st.popLong() * 1000L)
    case "us" => st.push(st.popLong())

    // ---- collections
    case "SIZE" => st.pop() match {
      case v: Vector[_] => st.push(v.size.toLong)
      case m: Map[_, _] => st.push(m.size.toLong)
      case s: Set[_] => st.push(s.size.toLong)
      case s: String => st.push(s.length.toLong)
      case b: Array[Byte] => st.push(b.length.toLong)
      case f: GtsFrame => st.push(f.df.count())
      case BucketedFrame(f, _, _, _) => st.push(f.df.count())
      case b: GtsBuilder => st.push(b.points.size.toLong)
      case o => throw new IllegalArgumentException(s"SIZE on $o")
    }
    // GET (fn/GET.java): single key, or a key-PATH list for nested
    // structures; negative list indices count from the end
    case "GET" =>
      val k = st.pop(); val cont = st.pop()
      def get1(c: Any, key: Any): Any = c match {
        case v: Vector[_] =>
          val raw = asLong(key).toInt
          v(if (raw < 0) raw + v.size else raw)
        case m: Map[Any @unchecked, _] => m.getOrElse(key, null)
        case o => throw new IllegalArgumentException(s"GET on $o")
      }
      (k, cont) match {
        // a list key on a MAP is a plain key lookup, not a path
        case (path: Vector[Any @unchecked], _: Vector[_]) =>
          st.push(path.foldLeft(cont)(get1))
        case _ => st.push(get1(cont, k))
      }
    case "REVERSE" => st.push(st.pop().asInstanceOf[Vector[Any]].reverse)
    case "FLATTEN" => st.push(flatten(st.pop().asInstanceOf[Vector[Any]]))
    // RANGE (fn/RANGE.java): [ stop ] | [ start stop ] | [ start stop
    // step ] → list of longs (stop exclusive, as the reference)
    case "RANGE" =>
      val ps = st.pop().asInstanceOf[Vector[Any]].map(asLong)
      val (from, until, step) = ps match {
        case Vector(b) => (0L, b, 1L)
        case Vector(a, b) => (a, b, 1L)
        case Vector(a, b, s) => (a, b, s)
        case _ => throw new IllegalArgumentException("RANGE expects 1-3 params")
      }
      require(step != 0, "RANGE step must be non-zero")
      st.push((from until until by step).toVector)
    // PUT (fn/PUT.java): value key PUT — set a map key or list index in
    // the container below; the container stays on the stack (our
    // structures are immutable, so the top is REPLACED by the copy)
    case "PUT" =>
      val key = st.pop(); val value = st.pop()
      st.pop() match {
        case m: Map[Any @unchecked, Any @unchecked] => st.push(m + (key -> value))
        case l: Vector[Any @unchecked] => st.push(l.updated(asLong(key).toInt, value))
        case o => throw new IllegalArgumentException(s"PUT on $o")
      }
    // REMOVE (fn/REMOVE.java:40-67): key REMOVE → container', removed
    // value (null when absent; negative list indices count from the end)
    case "REMOVE" =>
      val key = st.pop()
      st.pop() match {
        case m: Map[Any @unchecked, Any @unchecked] =>
          st.push(m - key); st.push(m.getOrElse(key, null))
        case l: Vector[Any @unchecked] =>
          val raw = asLong(key).toInt
          val idx = if (raw < 0) raw + l.size else raw
          if (idx >= 0 && idx < l.size) {
            st.push(l.patch(idx, Nil, 1)); st.push(l(idx))
          } else { st.push(l); st.push(null) }
        case o => throw new IllegalArgumentException(s"REMOVE on $o")
      }
    // CLONE (fn/CLONE.java — replace the top with a deep copy; stack
    // values here are immutable so the copy is the value itself)
    case "CLONE" => st.push(st.pop())
    // SUBLIST (fn/SUBLIST.java:48-130, indices-list form): 2 indices =
    // inclusive range lesser→bigger; >2 = elements at those indices
    // (duplicates allowed); negative indices count from the end.
    case "SUBLIST" =>
      val idx = st.pop().asInstanceOf[Vector[Any]].map(asLong)
      val l = st.pop().asInstanceOf[Vector[Any]]
      val n = l.size
      def at(i: Long): Int = (if (i < 0) i + n else i).toInt
      val out =
        if (idx.length == 2) {
          val a = at(idx(0)); val b = at(idx(1))
          val (lo, hi) = (math.min(a, b), math.max(a, b))
          l.slice(math.max(lo, 0), math.min(hi, n - 1) + 1)
        } else idx.map(i => l(at(i)))
      st.push(out)
    // LMAP (fn/LMAP.java:75-95): macro called per element with the
    // element then (unless the optional boolean says otherwise) its
    // index on the stack; result of each call collected into a list.
    case "LMAP" =>
      var top = st.pop(); var pushIndex = true
      top match {
        case b: Boolean => pushIndex = b; top = st.pop()
        case _ =>
      }
      val m = top.asInstanceOf[WsMacro]
      val l = st.pop().asInstanceOf[Vector[Any]]
      val out = l.zipWithIndex.map { case (e, i) =>
        st.push(e); if (pushIndex) st.push(i.toLong)
        evalMacro(m, st); st.pop()
      }
      st.push(out)
    // MMAP (fn/MMAP.java:48-91): macro called per entry with key, value
    // [, index]; pops the new value then the new key back.
    case "MMAP" =>
      var top = st.pop(); var pushIndex = true
      top match {
        case b: Boolean => pushIndex = b; top = st.pop()
        case _ =>
      }
      val m = top.asInstanceOf[WsMacro]
      val mp = st.pop().asInstanceOf[Map[Any, Any]]
      var i = 0L
      val out = mp.map { case (k, v) =>
        st.push(k); st.push(v); if (pushIndex) { st.push(i); i += 1 }
        evalMacro(m, st)
        val nv = st.pop(); val nk = st.pop(); nk -> nv
      }
      st.push(out)
    // ZIP (continuum/gts/ZIP.java): transpose a list of lists;
    // singletons broadcast to the common length
    case "ZIP" =>
      val meta = st.pop().asInstanceOf[Vector[Any]].map(_.asInstanceOf[Vector[Any]])
      require(meta.forall(_.nonEmpty), "ZIP cannot operate on empty lists")
      val lens = meta.map(_.size).filter(_ > 1).distinct
      require(lens.size <= 1, "ZIP: non-singleton lists must share a size")
      val len = lens.headOption.getOrElse(1)
      st.push((0 until len).toVector.map(i =>
        meta.map(l => if (l.size == 1) l.head else l(i))))
    // SORTBY (fn/SORTBY.java): stable sort of a list by the key the
    // macro computes for each element
    case "SORTBY" =>
      val m = st.pop().asInstanceOf[WsMacro]
      val l = st.pop().asInstanceOf[Vector[Any]]
      val keyed = l.map { e => st.push(e); evalMacro(m, st); (st.pop(), e) }
      st.push(keyed.sortWith((a, b) => wsLt(a._1, b._1)).map(_._2))
    // STRINGFORMAT (fn/STRINGFORMAT.java): fmt [ args ] [locale]
    // STRINGFORMAT — Locale.ROOT by default for determinism (the
    // reference falls back to the JVM default locale)
    case "STRINGFORMAT" =>
      var top = st.pop()
      val locale = top match {
        case s: String =>
          val lo = java.util.Locale.forLanguageTag(s); top = st.pop(); lo
        case _ => java.util.Locale.ROOT
      }
      val args = top.asInstanceOf[Vector[Any]].map(_.asInstanceOf[AnyRef])
      val fmt = st.popStr()
      st.push(String.format(locale, fmt, args: _*))
    // UNIQUE (fn/UNIQUE.java — set-dedup; kept in deterministic
    // first-occurrence order here, the reference's HashSet order is
    // an implementation accident)
    case "UNIQUE" => st.push(st.pop().asInstanceOf[Vector[Any]].distinct)
    // LSORT (fn/LSORT.java): natural-order in-place sort
    case "LSORT" =>
      st.push(st.pop().asInstanceOf[Vector[Any]].sortWith(wsLt))
    // APPEND (fn/APPEND.java): list+list concat or map+map merge
    case "APPEND" =>
      val b = st.pop(); val a = st.pop()
      (a, b) match {
        case (x: Vector[_], y: Vector[_]) => st.push(x ++ y)
        case (x: Map[Any @unchecked, Any @unchecked],
              y: Map[Any @unchecked, Any @unchecked]) => st.push(x ++ y)
        case o => throw new IllegalArgumentException(s"APPEND on $o")
      }
    // KEYLIST / VALUELIST (fn/KEYLIST.java, fn/VALUELIST.java) — sorted
    // by key for determinism (our Map is unordered)
    case "KEYLIST" =>
      st.push(st.pop().asInstanceOf[Map[Any, Any]].keys.toVector.sortWith(wsLt))
    case "VALUELIST" =>
      st.push(st.pop().asInstanceOf[Map[Any, Any]].toVector
        .sortWith((a, b) => wsLt(a._1, b._1)).map(_._2))

    // ---- BigDecimal words (fn/TOBD.java, BDADD/BDSUB/BDMUL/BDDIV,
    // BDSCALE, BDROUND, BDSTRIP — exact decimal stack arithmetic; the
    // columnar DecimalType twin is the r10 oracle row). BDDIV is
    // BigDecimal.divide with no MathContext, so a non-terminating
    // quotient throws, exactly as BDDIV.java:58 does.
    case "TOBD" => st.push(toBd(st.pop()))
    case "BDADD" => val b = toBd(st.pop()); val a = toBd(st.pop()); st.push(a.add(b))
    case "BDSUB" => val b = toBd(st.pop()); val a = toBd(st.pop()); st.push(a.subtract(b))
    case "BDMUL" => val b = toBd(st.pop()); val a = toBd(st.pop()); st.push(a.multiply(b))
    case "BDDIV" => val b = toBd(st.pop()); val a = toBd(st.pop()); st.push(a.divide(b))
    case "BDNEG" => st.push(toBd(st.pop()).negate())
    case "BDABS" => st.push(toBd(st.pop()).abs())
    case "BDSIGNUM" => st.push(toBd(st.pop()).signum().toLong)
    case "BDMIN" => val b = toBd(st.pop()); val a = toBd(st.pop()); st.push(a.min(b))
    case "BDMAX" => val b = toBd(st.pop()); val a = toBd(st.pop()); st.push(a.max(b))
    case "BDSTRIP" => st.push(toBd(st.pop()).stripTrailingZeros())
    // BDSCALE (fn/BDSCALE.java:33-55): BigDecimal on top → push its
    // scale; LONG on top → EXACT setScale of the value below (throws
    // when digits would be lost, like the reference)
    case "BDSCALE" => st.pop() match {
      case bd: java.math.BigDecimal => st.push(bd.scale().toLong)
      case l: Long => st.push(toBd(st.pop()).setScale(l.toInt))
      case o => throw new IllegalArgumentException(s"BDSCALE on $o")
    }
    // BDROUND (fn/BDROUND.java:37-50): round to scale 0, HALF_UP by
    // default, HALF_DOWN when the option string says so
    case "BDROUND" => st.pop() match {
      case "HALF_DOWN" =>
        st.push(toBd(st.pop()).setScale(0, java.math.RoundingMode.HALF_DOWN))
      case "HALF_UP" =>
        st.push(toBd(st.pop()).setScale(0, java.math.RoundingMode.HALF_UP))
      case v => st.push(toBd(v).setScale(0, java.math.RoundingMode.HALF_UP))
    }

    // ---- RSA words (fn/RSAPUBLIC.java, RSAPRIVATE, RSASIGN,
    // RSAVERIFY, RSAENCRYPT, RSADECRYPT — JDK java.security; the
    // reference's BouncyCastle is replaced by the platform provider).
    // Key maps: { 'algorithm' 'RSA' 'modulus' '<dec|0x..>' 'exponent'
    // '<dec|0x..>' }, as the reference's new BigInteger(text).
    case "RSAPUBLIC" | "RSAPRIVATE" =>
      val params = st.pop().asInstanceOf[Map[Any, Any]]
        .map { case (k, v) => k.toString -> String.valueOf(v) }
      require(params.get("algorithm").contains("RSA"),
        s"$w expects 'algorithm' -> 'RSA'")
      def big(s: String) =
        if (s.startsWith("0x")) new java.math.BigInteger(s.substring(2), 16)
        else new java.math.BigInteger(s)
      val mod = big(params("modulus")); val exp = big(params("exponent"))
      val kf = java.security.KeyFactory.getInstance("RSA")
      st.push(
        if (w == "RSAPUBLIC")
          kf.generatePublic(new java.security.spec.RSAPublicKeySpec(mod, exp))
        else
          kf.generatePrivate(new java.security.spec.RSAPrivateKeySpec(mod, exp)))
    // data alg key RSASIGN → signature bytes (PKCS#1 v1.5, deterministic)
    case "RSASIGN" =>
      val key = st.pop().asInstanceOf[java.security.PrivateKey]
      val alg = st.popStr()
      val data = popBytes(st)
      val sig = java.security.Signature.getInstance(alg)
      sig.initSign(key); sig.update(data)
      st.push(sig.sign())
    // data sig alg key RSAVERIFY → boolean
    case "RSAVERIFY" =>
      val key = st.pop().asInstanceOf[java.security.PublicKey]
      val alg = st.popStr()
      val signature = st.pop().asInstanceOf[Array[Byte]]
      val data = popBytes(st)
      val sig = java.security.Signature.getInstance(alg)
      sig.initVerify(key); sig.update(data)
      st.push(sig.verify(signature))
    // data key RSAENCRYPT → bytes (8-byte random nonce prefixed, like
    // RSAENCRYPT.java:60-67); data key RSADECRYPT strips the nonce
    case "RSAENCRYPT" =>
      val key = st.pop().asInstanceOf[java.security.Key]
      val data = popBytes(st)
      val nonced = new Array[Byte](data.length + 8)
      new java.security.SecureRandom().nextBytes(nonced)
      System.arraycopy(data, 0, nonced, 8, data.length)
      val c = javax.crypto.Cipher.getInstance("RSA/ECB/PKCS1Padding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE, key)
      st.push(c.doFinal(nonced))
    case "RSADECRYPT" =>
      val key = st.pop().asInstanceOf[java.security.Key]
      val data = st.pop().asInstanceOf[Array[Byte]]
      val c = javax.crypto.Cipher.getInstance("RSA/ECB/PKCS1Padding")
      c.init(javax.crypto.Cipher.DECRYPT_MODE, key)
      val nonced = c.doFinal(data)
      st.push(java.util.Arrays.copyOfRange(nonced, 8, nonced.length))

    // ---- digests + AES key wrap (WarpScriptLib DIGEST registrations;
    // fn/AESWRAP.java = 8-byte nonce + PKCS7-pad-to-8 + RFC 3394 wrap,
    // BouncyCastle AESWrapEngine replaced by the JDK "AESWrap" cipher)
    case "MD5" | "SHA1" | "SHA256" | "SHA512" =>
      val algo = Map("MD5" -> "MD5", "SHA1" -> "SHA-1",
        "SHA256" -> "SHA-256", "SHA512" -> "SHA-512")(w)
      st.push(java.security.MessageDigest.getInstance(algo).digest(popBytes(st)))
    case "AESWRAP" =>
      val key = st.pop().asInstanceOf[Array[Byte]]
      require(Set(16, 24, 32)(key.length), "AESWRAP expects a 128/192/256-bit key")
      val data = popBytes(st)
      val nonce = new Array[Byte](8)
      new java.security.SecureRandom().nextBytes(nonce)
      st.push(aesWrap(key, nonce ++ data))
    case "AESUNWRAP" =>
      val key = st.pop().asInstanceOf[Array[Byte]]
      require(Set(16, 24, 32)(key.length), "AESUNWRAP expects a 128/192/256-bit key")
      val data = st.pop().asInstanceOf[Array[Byte]]
      st.push(aesUnwrap(key, data).drop(8))

    // ---- control: SWITCH / TRY (fn/SWITCH.java, fn/TRY.java)
    // SWITCH: N (condition,exec) macro pairs + default macro + N; first
    // true condition wins, its exec runs; else the default runs.
    case "SWITCH" =>
      val n = st.popLong().toInt
      val dflt = st.pop().asInstanceOf[WsMacro]
      val pairs = Vector.fill(n) {
        val exec = st.pop().asInstanceOf[WsMacro]
        val cond = st.pop().asInstanceOf[WsMacro]
        (cond, exec)
      }.reverse
      pairs.find { case (cond, _) => evalMacro(cond, st); st.popBool() } match {
        case Some((_, exec)) => evalMacro(exec, st)
        case None => evalMacro(dflt, st)
      }
    // TRY: try / catch / finally macros; the error is recorded where
    // LASTERROR can push it (reference keeps it in a stack attribute,
    // ATTRIBUTE_LAST_ERROR — TRY.java:60).
    case "TRY" =>
      val fin = st.pop().asInstanceOf[WsMacro]
      val cat = st.pop().asInstanceOf[WsMacro]
      val tr = st.pop().asInstanceOf[WsMacro]
      try evalMacro(tr, st)
      catch {
        case e: Exception =>
          lastError = e.getMessage
          evalMacro(cat, st)
      }
      finally evalMacro(fin, st)
    case "LASTERROR" => st.push(lastError)
    // fn/RETHROW.java / ERROR.java over the same last-error attribute
    case "RETHROW" =>
      if (lastError != null) throw new IllegalStateException(lastError)
    case "ERROR" =>
      st.push(if (lastError == null) Vector.empty[Any]
        else Vector[Any](Map[Any, Any]("type" -> "Exception",
          "message" -> lastError)))

    // ---- control (fn/EVAL.java, IFT, IFTE, FOREACH)
    case "EVAL" => st.pop() match {
      case m: WsMacro => evalMacro(m, st)
      case NativeFn(_, f) => f(st)
      case i: WordsExt3.WsInterp => st.push(i.value(st.popNum()))
      case s: String => exec(WarpScriptTokenizer.tokenize(s), st)
      case o => throw new IllegalArgumentException(s"EVAL on $o")
    }
    case "IFT" =>
      val m = st.pop().asInstanceOf[WsMacro]
      if (bool(st.pop())) evalMacro(m, st)
    case "IFTE" =>
      val mf = st.pop().asInstanceOf[WsMacro]
      val mt = st.pop().asInstanceOf[WsMacro]
      if (bool(st.pop())) evalMacro(mt, st) else evalMacro(mf, st)
    // FOREACH (fn/FOREACH.java): list pushes the element, map pushes
    // key then value; BREAK/CONTINUE honored per-iteration
    case "FOREACH" =>
      val m = st.pop().asInstanceOf[WsMacro]
      val items: Iterable[() => Unit] = st.pop() match {
        case l: Vector[Any @unchecked] => l.map(v => () => st.push(v))
        case mp: Map[Any @unchecked, Any @unchecked] =>
          mp.map { case (k, v) => () => { st.push(k); st.push(v) } }
        case o => throw new IllegalArgumentException(s"FOREACH on $o")
      }
      try items.foreach { pushArgs =>
        pushArgs()
        try evalMacro(m, st) catch { case _: WsContinueEx => }
      } catch { case _: WsBreakEx => }

    // ---- GTS frame words ------------------------------------------------
    // FETCH (fn/FETCH.java list form [ token class labels start stop ];
    // the auth token is accepted and ignored — storage ACLs are the
    // host's concern, not the algebra's)
    case "FETCH" =>
      val args = st.pop().asInstanceOf[Vector[Any]]
      val (cls, labels, start, stop) = args match {
        case Vector(_: String, c: String, l: Map[_, _], a: Long, b: Long) =>
          (c, l.asInstanceOf[Map[String, String]], a, b)
        case Vector(c: String, l: Map[_, _], a: Long, b: Long) =>
          (c, l.asInstanceOf[Map[String, String]], a, b)
        case other => throw new IllegalArgumentException(s"FETCH args: $other")
      }
      st.push(fetch(cls, labels, start, stop))

    // BUCKETIZE (fn/BUCKETIZE.java): [ gts bucketizer lastbucket span count ]
    case "BUCKETIZE" =>
      val args = st.pop().asInstanceOf[Vector[Any]]
      val n = args.length
      val (count, span, lb) = (asLong(args(n - 1)), asLong(args(n - 2)), asLong(args(n - 3)))
      val agg = args(n - 4) match {
        case AggVal(_, a) => a
        case MacroAgg(_, tokens) =>
          st.push(GtsFrame(MacroKernel.macroBucketize(
            framesOf(args.take(n - 4)).df, tokens, lb, span)))
          return
        case o => throw new IllegalArgumentException(s"not a bucketizer: $o")
      }
      val bucketed = framesOf(args.take(n - 4)).bucketizeAuto(agg, lb, span, count)
      // explicit params → carry them for downstream fill words; auto
      // params → plain frame (metadata was data-derived inside)
      st.push(if (span > 0 && lb != 0) BucketedFrame(bucketed, lb, span, count)
        else bucketed)

    // MAP (fn/MAP.java): [ gts mapper pre post occurrences ]; negative
    // pre/post = time span, positive = tick count (GTSHelper.java:6440)
    case "MAP" =>
      val args = st.pop().asInstanceOf[Vector[Any]]
      val n = args.length
      val (occ, post, pre) = (asLong(args(n - 1)), asLong(args(n - 2)), asLong(args(n - 3)))
      args(n - 4) match {
        case AggVal(_, a) =>
          st.push(framesOf(args.take(n - 4)).mapWindow(a, pre, post, occurrences = occ))
        case MapperCol(_, f) =>
          val fr = framesOf(args.take(n - 4))
          // a mapper producing no value drops the tick (the reference's
          // comparison mappers MapperEQ/GT/... return null → no point)
          st.push(GtsFrame(fr.df.withColumn("vdouble", f(col("vdouble")))
            .filter(col("vdouble").isNotNull)))
        case MapperDf(_, f) =>
          st.push(GtsFrame(f(framesOf(args.take(n - 4)).df)))
        // a 1D interpolant used as a mapper (INTERPOLATOR_1D.java's
        // WarpScriptMapperFunction face): out-of-range → NaN, point kept
        case i: WordsExt3.WsInterp =>
          val fr = framesOf(args.take(n - 4))
          st.push(GtsFrame(fr.df.withColumn("vdouble",
            i.columnExpr(col("vdouble")))))
        case MacroAgg(_, tokens) =>
          val fr = framesOf(args.take(n - 4))
          st.push(GtsFrame(MacroKernel.macroMap(fr.df, tokens, pre, post, occ)))
        case o => throw new IllegalArgumentException(s"not a mapper: $o")
      }

    // REDUCE (fn/REDUCE.java): [ gts... [labels] reducer ]
    case "REDUCE" =>
      val args = st.pop().asInstanceOf[Vector[Any]]
      val labels = args(args.length - 2).asInstanceOf[Vector[Any]].map(_.toString)
      args.last match {
        case AggVal(_, a) =>
          // REDUCE emits the flattened shape (labels..., ts, vdouble)
          st.push(GtsFrame(framesOf(args.take(args.length - 2)).reduce(a, labels.toSeq)))
        case MacroAgg(_, tokens) =>
          st.push(GtsFrame(MacroKernel.macroReduce(
            framesOf(args.take(args.length - 2)).df, tokens, labels.toSeq)))
        case o => throw new IllegalArgumentException(s"not a reducer: $o")
      }

    // FILTER (fn/FILTER.java): [ gts... [labels] filter ]
    case "FILTER" =>
      val args = st.pop().asInstanceOf[Vector[Any]]
      args.last match {
        case FilterVal(_, pred) =>
          st.push(framesOf(args.take(args.length - 2)).filterSeries(pred))
        case MacroAgg(_, tokens) =>
          st.push(GtsFrame(MacroKernel.filterSeries(
            framesOf(args.take(args.length - 2)).df, tokens)))
        case o => throw new IllegalArgumentException(s"not a filter: $o")
      }

    // APPLY (fn/APPLY.java): [ [gts-a] [gts-b] [labels] op ]
    case "APPLY" =>
      val args = st.pop().asInstanceOf[Vector[Any]]
      val opv = args.last match {
        case o: OpVal => o
        case o => throw new IllegalArgumentException(s"not an op: $o")
      }
      val labels = args(args.length - 2).asInstanceOf[Vector[Any]].map(_.toString).toSeq
      val b = toFrame(args(args.length - 3))
      val a = toFrame(args(args.length - 4))
      val out = opv.name match {
        case "op.mask" => a.mask(b, labels)
        case "op.negmask" => a.mask(b, labels, negate = true)
        case _ => a.applyOp(b, opv.f, labels)
      }
      // APPLY emits the flattened shape (labels..., ts, vdouble)
      st.push(GtsFrame(out))

    // structural frame words — direct GtsFrame methods
    // fill words (fn/FILLPREVIOUS.java etc.): operate on a BUCKETIZE
    // result, bucket params read from the carried metadata
    // fills preserve bucketization metadata, as the reference keeps
    // lastbucket/span/count on the filled GTS (GTSHelper.fill)
    case "FILLPREVIOUS" =>
      val b = toBucketed(st.pop())
      st.push(b.copy(frame = GtsFrame(b.frame.fillPrevious(b.lastbucket, b.span, b.count))))
    case "FILLNEXT" =>
      val b = toBucketed(st.pop())
      st.push(b.copy(frame = GtsFrame(b.frame.fillNext(b.lastbucket, b.span, b.count))))
    case "FILLVALUE" => // [ lat lon elev value ] list form; value used
      val v = st.pop() match {
        case l: Vector[_] => asNum(l.last)
        case n => asNum(n)
      }
      val b = toBucketed(st.pop())
      st.push(b.copy(frame = GtsFrame(b.frame.fillValue(b.lastbucket, b.span, b.count, v))))
    case "INTERPOLATE" =>
      val b = toBucketed(st.pop())
      st.push(b.copy(frame = GtsFrame(b.frame.fillLinear(b.lastbucket, b.span, b.count))))
    case "DEDUP" => st.push(toFrame(st.pop()).dedup())
    case "COMPACT" => st.push(toFrame(st.pop()).compact())
    case "NORMALIZE0" | "ISONORMALIZE" => st.push(toFrame(st.pop()).normalize())
    // RENAME / RELABEL (fn/RENAME.java, fn/RELABEL.java) — also valid
    // on a NEWGTS builder before materialization
    case "RENAME" => val n = st.popStr(); st.pop() match {
      case b: GtsBuilder =>
        st.push(b.copy(cls = if (n.startsWith("+")) b.cls + n.substring(1) else n))
      case f => st.push(toFrame(f).rename(n))
    }
    case "RELABEL" =>
      val m = st.pop().asInstanceOf[Map[Any, Any]]
        .map { case (k, v) => k.toString -> (if (v == null) "" else v.toString) }
      st.pop() match {
        case b: GtsBuilder =>
          val (removes, sets) = m.partition(_._2.isEmpty)
          st.push(b.copy(labels = (b.labels ++ sets) -- removes.keys))
        case f => st.push(toFrame(f).relabel(m))
      }
    // NEWGTS / ADDVALUE (fn/NEWGTS.java, fn/ADDVALUE.java): build a GTS
    // from literals on the stack; materializes into a one-series frame
    // when a frame word consumes it. `gts ts lat lon elev value ADDVALUE`
    // — NaN lat/lon and NULL elev mean absent, as in the reference.
    case "NEWGTS" | "NEWENCODER" => st.push(GtsBuilder("", Map.empty, Vector.empty))
    case "ADDVALUE" =>
      val v: Any = st.pop() match {
        case l: Long => l
        case d: Double => d
        case b: Boolean => b
        case str: String => str
        case bin: Array[Byte] => bin
        case o => throw new IllegalArgumentException(s"ADDVALUE value: $o")
      }
      val elev = st.pop() match {
        case null => None
        case l: Long => Some(l)
        case d: Double if !d.isNaN => Some(d.toLong)
        case _ => None
      }
      val lon = st.popNum(); val lat = st.popNum()
      val ts = st.popLong()
      st.pop() match {
        case b: GtsBuilder =>
          val loc = if (lat.isNaN || lon.isNaN) None else Some((lat, lon))
          st.push(b.copy(points = b.points :+ (ts, loc, elev, v)))
        case o => throw new IllegalArgumentException(s"ADDVALUE on $o")
      }
    // accessor words (fn/FIRSTTICK.java, LASTTICK, TICKS, VALUES, NAME,
    // LABELS, SIZE-for-GTS handled under SIZE): driver-side scalars over
    // the frame — tiny aggs, same contract as GtsFrame auto-params
    case "FIRSTTICK" =>
      st.push(toFrame(st.pop()).df.agg(min(col("ts"))).head().getLong(0))
    case "LASTTICK" =>
      st.push(toFrame(st.pop()).df.agg(max(col("ts"))).head().getLong(0))
    case "NAME" =>
      st.push(toFrame(st.pop()).df.select(col("class")).distinct()
        .collect().map(_.getString(0)).sorted.toVector)
    // LABELS (fn/LABELS.java — the labels map of a single GTS; a frame
    // holding several distinct label sets has no single answer)
    case "LABELS" =>
      val maps = toFrame(st.pop()).df
        .select(col("gtsid"), col("labels")).groupBy(col("gtsid"))
        .agg(first(col("labels")).as("labels"))
        .collect().map(_.getMap[String, String](1).toMap).distinct
      maps match {
        case Array(one) => st.push(one.asInstanceOf[Map[Any, Any]])
        case _ => throw new IllegalArgumentException(
          s"LABELS needs a single-series frame, found ${maps.length} label sets")
      }
    // CLONEEMPTY (fn/CLONEEMPTY.java): same shape, zero points
    case "CLONEEMPTY" => st.push(GtsFrame(toFrame(st.pop()).df.limit(0)))
    case "TICKLIST" =>
      st.push(toFrame(st.pop()).df.select(col("ts")).distinct()
        .collect().map(_.getLong(0)).sorted.toVector)
    // CORRELATE (fn/CORRELATE.java): [ [gts-a] [gts-b] [labels] ] CORRELATE
    case "CORRELATE" =>
      val args = st.pop().asInstanceOf[Vector[Any]]
      val labels = args(args.length - 1).asInstanceOf[Vector[Any]].map(_.toString).toSeq
      val b = toFrame(args(args.length - 2))
      val a = toFrame(args(args.length - 3))
      st.push(GtsFrame(graft.operators.StatOps.correlate(a, b, labels)))
    // LTTB (fn/LTTB.java): gts threshold LTTB — exact-area variant
    case "LTTB" =>
      val thr = st.popLong().toInt
      val f = toFrame(st.pop())
      val sel = new graft.kernels.KernelOps(f.df).lttbExact(thr)
      val meta = f.df.groupBy(col("gtsid"))
        .agg(first(col("class")).as("class"), first(col("labels")).as("labels"))
      st.push(GtsFrame(sel.join(meta, "gtsid")))
    // FFT surface (continuum/gts/FFT.java): gts bins span lastbucket FFT
    // → per-series spectrum rows (k, re, im, mag); see StatOps.dft
    case "FFT" =>
      val lb = st.popLong(); val span = st.popLong(); val bins = st.popLong().toInt
      st.push(GtsFrame(graft.operators.StatOps.dft(toFrame(st.pop()), bins, span, lb)))
    // LOWESS (fn/LOWESS.java): gts q LOWESS, q = odd neighborhood size
    case "LOWESS" | "RLOWESS" =>
      val q = st.popLong().toInt
      require(q >= 3 && q % 2 == 1, s"LOWESS neighborhood must be odd >= 3: $q")
      st.push(GtsFrame(graft.operators.StatOps.lowessFit(toFrame(st.pop()), (q - 1) / 2)))
    // DTW (fn/DTW.java lifted to frames, the CORRELATE list shape):
    // [ a b [ labels ] bins span lastbucket ] DTW → (labels..., dtw)
    case "DTW" =>
      val args = st.pop().asInstanceOf[Vector[Any]]
      val n = args.length
      val (lb, span, bins) = (asLong(args(n - 1)), asLong(args(n - 2)), asLong(args(n - 3)).toInt)
      val labels = args(n - 4).asInstanceOf[Vector[Any]].map(_.toString).toSeq
      val b = toFrame(args(n - 5)); val a = toFrame(args(n - 6))
      st.push(GtsFrame(graft.operators.StatOps.dtwPairs(a, b, labels, bins, span, lb)))
    // OPTDTW (fn/OPTDTW.java): sequence query [window] count OPTDTW →
    // top-`count` [start-index, distance] pairs from sliding the
    // z-normalized query over every |query|-length subsequence with
    // Sakoe-Chiba banded DTW (Manhattan cost, bessel-corrected sd, as
    // the reference's DoubleUtils.musigma(values, true))
    case "OPTDTW" =>
      val count = st.popLong().toInt
      var top = st.pop()
      var window = Int.MaxValue
      top match {
        case l: Long =>
          window = if (l < 0 || l > Int.MaxValue) Int.MaxValue else l.toInt
          top = st.pop()
        case _ =>
      }
      val query = top.asInstanceOf[Vector[Any]].map(asNum).toIndexedSeq
      val series = st.pop().asInstanceOf[Vector[Any]].map(asNum).toIndexedSeq
      require(series.length >= query.length,
        "OPTDTW expects the query to be shorter than the sequence")
      def znorm(v: IndexedSeq[Double]): IndexedSeq[Double] = {
        val n = v.length
        val mu = v.sum / n
        val varPop = v.map(x => (x - mu) * (x - mu)).sum / n
        val sd = math.sqrt(if (n > 1) varPop * n / (n - 1) else varPop)
        if (sd == 0) v.map(_ => 0.0) else v.map(x => (x - mu) / sd)
      }
      val q = znorm(query)
      val hits = (0 to series.length - query.length).map { i =>
        val sub = znorm(series.slice(i, i + query.length))
        (i.toLong, graft.kernels.SeriesKernels.dtwBanded(q, sub, window))
      }.sortBy(r => (r._2, r._1))
      val kept = if (count > 0) hits.take(count) else hits
      st.push(kept.map { case (i, d) => Vector[Any](i, d) }.toVector)

    // PATTERNS/PATTERNDETECTION (fn/PATTERNS.java): gts win alphabet
    // minseries PATTERNS → motif table (word, n_series, n_occ)
    case "PATTERNS" =>
      val minSeries = st.popLong().toInt; val alphabet = st.popLong().toInt
      val win = st.popLong().toInt
      st.push(GtsFrame(graft.operators.StatOps.saxMotifs(toFrame(st.pop()),
        win, alphabet, minSeries)))
    // SINGLEEXPONENTIALSMOOTHING (fn/SINGLEEXPONENTIALSMOOTHING.java):
    // gts alpha → smoothed gts (general-alpha sequential kernel)
    case "SINGLEEXPONENTIALSMOOTHING" =>
      val alpha = st.popNum()
      val f = toFrame(st.pop())
      st.push(GtsFrame(new graft.kernels.KernelOps(f.df).expSmooth(alpha)
        .join(metaOf(f), "gtsid")))
    // DOUBLEEXPONENTIALSMOOTHING (fn/DOUBLEEXPONENTIALSMOOTHING.java):
    // gts alpha beta → Holt level series
    case "DOUBLEEXPONENTIALSMOOTHING" =>
      val beta = st.popNum(); val alpha = st.popNum()
      val f = toFrame(st.pop())
      st.push(GtsFrame(new graft.kernels.KernelOps(f.df).expSmooth(alpha, Some(beta))
        .join(metaOf(f), "gtsid")))
    // ZSCORETEST (fn/ZSCORETEST.java): gts useMedian threshold → flagged
    // points (mean/sd z-score; the modified-z variant is ESDTEST's MAD path)
    case "ZSCORETEST" =>
      val thr = st.popNum(); val useMedian = st.popBool()
      require(!useMedian, "ZSCORETEST: modified z-score not wired; use ESDTEST true")
      st.push(GtsFrame(graft.operators.StatOps.zscoreFlag(toFrame(st.pop()), thr)))
    // ESDTEST (fn/ESDTEST.java): gts k useMedian alpha → flagged outlier
    // rounds (mean/sd or median/MAD per the flag)
    case "ESDTEST" =>
      val alpha = st.popNum(); val useMedian = st.popBool()
      val k = st.popLong().toInt
      val f = toFrame(st.pop())
      val flagged =
        if (useMedian) graft.operators.StatOps.esdMadFlag(f, k, alpha)
        else graft.operators.StatOps.esdFlag(f, k, alpha)
      st.push(GtsFrame(flagged.join(metaOf(f), "gtsid")))
    // RESETS compensation (COUNTERDELTA family, GTSHelper compensateResets)
    case "RESETS" => st.push(toFrame(st.pop()).compensateResets())
    // RANGECOMPACT (fn/RANGECOMPACT.java): gts delta RANGECOMPACT
    case "RANGECOMPACT" =>
      val delta = st.popNum()
      val f = toFrame(st.pop())
      st.push(GtsFrame(new graft.kernels.KernelOps(f.df).rangeCompact(delta)
        .join(metaOf(f), "gtsid")))
    // LR (fn/LR.java): gts span lastbucket LR → per-series regression
    case "LR" =>
      val lb = st.popLong(); val span = st.popLong()
      st.push(GtsFrame(graft.operators.StatOps.linReg(toFrame(st.pop()), span, lb)))
    // SKEWNESS/KURTOSIS/NSUMSUMSQ surface (fn/SKEWNESS.java family):
    // one word pushes the whole per-series moment table
    case "MOMENTS" | "SKEWNESS" | "KURTOSIS" =>
      st.push(GtsFrame(graft.operators.StatOps.momentStats(toFrame(st.pop()))))
    // FDWT Haar (fn/FDWT.java): gts levels span lastbucket FDWT
    case "FDWT" =>
      val lb = st.popLong(); val span = st.popLong(); val lv = st.popLong().toInt
      // bound: levels <= 0 would make the approx cascade empty and large
      // levels allocate 1<<levels columns — a request-triggered OOM via
      // POST /api/v0/exec without this check
      require(lv >= 1 && lv <= 20, s"FDWT levels must be in [1, 20]: $lv")
      st.push(GtsFrame(graft.operators.StatOps.haarDwt(toFrame(st.pop()), lv, span, lb)))
    // IDWT (fn/IDWT.java): dwt-frame levels IDWT → reconstructed buckets
    case "IDWT" =>
      val lv = st.popLong().toInt
      require(lv >= 1 && lv <= 20, s"IDWT levels must be in [1, 20]: $lv")
      st.push(GtsFrame(graft.operators.StatOps.haarIdwt(toFrame(st.pop()).df, lv)))
    // DISCORDS (continuum/gts/DISCORDS.java): gts win alphabet maxocc
    case "DISCORDS" =>
      val maxOcc = st.popLong().toInt; val alphabet = st.popLong().toInt
      val win = st.popLong().toInt
      st.push(GtsFrame(graft.operators.StatOps.saxDiscords(toFrame(st.pop()),
        win, alphabet, maxOcc)))
    // POLYFIT degree 2 (fn/POLYFIT.java): gts span lastbucket buckets
    case "POLYFIT" =>
      val nb = st.popLong().toInt; val lb = st.popLong(); val span = st.popLong()
      st.push(GtsFrame(graft.operators.StatOps.polyFit2(toFrame(st.pop()),
        span, lb, nb)))
    // WRAP/UNWRAP (fn/WRAP.java, fn/UNWRAP.java): frame → per-series
    // binary blobs and back (graft.sources.GtsCodec varint/delta codec)
    case "WRAP" => st.push(graft.sources.GtsCodec.wrap(toFrame(st.pop()).df))
    case "UNWRAP" => st.pop() match {
      case f: GtsFrame => st.push(GtsFrame(graft.sources.GtsCodec.unwrap(f.df)))
      case df: org.apache.spark.sql.DataFrame @unchecked
          if df.columns.contains("blob") =>
        st.push(GtsFrame(graft.sources.GtsCodec.unwrap(df)))
      case o => throw new IllegalArgumentException(s"UNWRAP on $o")
    }
    // SNAPSHOT (fn/SNAPSHOT.java): render the top of the stack as a
    // re-evaluable WarpScript literal (driver-side scalar)
    case "SNAPSHOT" => st.push(graft.sources.Snapshot.render(st.pop()))
    case "QUANTIZE" => // our quantize(step): [ gts step ] form
      val step = st.popNum(); st.push(toFrame(st.pop()).quantize(step))
    case "TIMECLIP" => // fn/TIMECLIP.java: gts end span | gts start end here
      val b = st.popLong(); val a = st.popLong()
      st.push(toFrame(st.pop()).timeclip(a, b))
    case "TIMESHIFT" => val d = st.popLong(); st.push(toFrame(st.pop()).timeshift(d))
    case "TIMESCALE" => val k = st.popNum(); st.push(toFrame(st.pop()).timescale(k))
    case "TIMEMODULO" =>
      val lbl = st.popStr(); val mod = st.popLong()
      st.push(toFrame(st.pop()).timemodulo(mod, lbl))
    case "TIMESPLIT" =>
      val quiet = st.popLong(); st.push(GtsFrame(toFrame(st.pop()).timesplit(quiet)))
    case "CHUNK" =>
      val width = st.popLong(); val lastchunk = st.popLong()
      st.push(GtsFrame(toFrame(st.pop()).chunk(lastchunk, width)))
    case "NORMALIZE" => st.push(toFrame(st.pop()).normalize())
    case "STANDARDIZE" => st.push(toFrame(st.pop()).standardize())
    // COMMONTICKS (fn/COMMONTICKS.java): keep only ticks present in
    // EVERY series of the frame/list — fully lazy: per-tick distinct
    // series count equi-joined against the broadcast 1-row total
    case "COMMONTICKS" =>
      val f = toFrame(st.pop())
      val total = f.df.agg(countDistinct(col("gtsid")).as("__total"))
      val ticks = f.df.groupBy(col("ts"))
        .agg(countDistinct(col("gtsid")).as("__n"))
        .crossJoin(broadcast(total))
        .filter(col("__n") === col("__total"))
        .select(col("ts"))
      st.push(GtsFrame(f.df.join(ticks, "ts")))
    // SORT/RSORT (fn/SORT.java, RSORT): the reference orders the
    // materialized point list; the frame algebra is set-semantic and
    // every order-sensitive operator sorts internally, so these accept
    // and pass the frame through unchanged
    case "SORT" | "RSORT" | "FULLSORT" => st.push(toFrame(st.pop()))
    case "INTEGRATE" => st.push(toFrame(st.pop()).integrate())
    // PIVOT (frame word over the native groupBy().pivot() path — the
    // wide-table view the reference builds via per-class FETCH+APPLY):
    // gts [ classes ] labelkey lastbucket span PIVOT → one row per
    // (label value, bucket end), one sum column per class.
    case "PIVOT" =>
      val span = st.popLong(); val lb = st.popLong()
      val lbl = st.popStr()
      val classes = st.pop().asInstanceOf[Vector[Any]].map(_.toString)
      val f = toFrame(st.pop())
      st.push(GtsFrame(f.withBucketCol(lb, span)
        .groupBy(col("labels").getItem(lbl).as(lbl), col("__bucket").as("ts"))
        .pivot("class", classes)
        .agg(sum(col("vdouble")))))
    case "MERGE" => st.pop() match {
      case v: Vector[_] => st.push(framesOf(v))
      case f: GtsFrame => val g = toFrame(st.pop()); st.push(g.merge(f))
      case o => throw new IllegalArgumentException(s"MERGE on $o")
    }

    // ---- function-value words -------------------------------------------
    // parameterized aggregators pop their parameter NOW, like the
    // reference's builder words (script/aggregator/Percentile.Builder,
    // aggregator/Join.Builder): `90.0 bucketizer.percentile`,
    // `'|' reducer.join`
    case "bucketizer.percentile" | "reducer.percentile" | "mapper.percentile" =>
      st.push(AggVal(w, Percentile(st.popNum())))
    case "bucketizer.percentile.cont" | "reducer.percentile.cont" =>
      st.push(AggVal(w, PercentileCont(st.popNum())))
    case "bucketizer.join" | "reducer.join" =>
      st.push(AggVal(w, JoinAgg(st.popStr())))
    // parameterized pointwise mappers (script/mapper/MapperAdd.java,
    // MapperMul, MapperMod, MapperPow; comparison mappers keep the
    // value when the predicate holds and DROP the tick otherwise)
    case "mapper.add" => val k = st.popNum(); st.push(MapperCol(w, _ + lit(k)))
    case "mapper.mul" => val k = st.popNum(); st.push(MapperCol(w, _ * lit(k)))
    case "mapper.mod" => val k = st.popNum(); st.push(MapperCol(w, _ % lit(k)))
    case "mapper.pow" => val k = st.popNum(); st.push(MapperCol(w, c => pow(c, lit(k))))
    // frame-column mappers: value := tick / calendar field of the tick
    // (script/mapper/MapperTick.java, MapperYear/Month/Day/Hour/Minute/
    // Second/DayOfWeek — UTC; ticks < 2^53 µs stay exact in double)
    case "mapper.tick" =>
      st.push(MapperDf(w, df => df.withColumn("vdouble",
        col("ts").cast(org.apache.spark.sql.types.DoubleType))))
    case "mapper.year" => st.push(calMapper(w, year))
    case "mapper.month" => st.push(calMapper(w, month))
    case "mapper.day" => st.push(calMapper(w, dayofmonth))
    case "mapper.hour" => st.push(calMapper(w, hour))
    case "mapper.minute" => st.push(calMapper(w, minute))
    case "mapper.second" => st.push(calMapper(w, second))
    // ISO weekday 1=Monday..7=Sunday (Joda getDayOfWeek)
    case "mapper.weekday" =>
      st.push(calMapper(w, t => (dayofweek(t) + lit(5)) % 7 + lit(1)))
    case "mapper.eq" => val k = st.popNum(); st.push(MapperCol(w, c => when(c === k, c)))
    case "mapper.ne" => val k = st.popNum(); st.push(MapperCol(w, c => when(c =!= k, c)))
    case "mapper.gt" => val k = st.popNum(); st.push(MapperCol(w, c => when(c > k, c)))
    case "mapper.ge" => val k = st.popNum(); st.push(MapperCol(w, c => when(c >= k, c)))
    case "mapper.lt" => val k = st.popNum(); st.push(MapperCol(w, c => when(c < k, c)))
    case "mapper.le" => val k = st.popNum(); st.push(MapperCol(w, c => when(c <= k, c)))
    // coordinate-comparison mappers (script/mapper/MapperTickGE-style
    // families over tick/lat/lon/elev): keep the point when the
    // coordinate passes; null coordinates drop (SQL three-valued logic)
    case CoordMapperName(colName, cmp) =>
      val k = st.popNum()
      val cond: Column = cmp match {
        case "eq" => col(colName) === k
        case "ne" => col(colName) =!= k
        case "gt" => col(colName) > k
        case "ge" => col(colName) >= k
        case "lt" => col(colName) < k
        case _ => col(colName) <= k
      }
      st.push(MapperDf(w, df => df.filter(cond)))
    // geo mappers (script/mapper/MapperGeoWithin.java, MapperGeoOutside,
    // MapperGeoClearPosition, MapperGeoApproximate — the g47/g98 plans
    // as MAP-word mappers)
    case "mapper.geo.within" | "mapper.geo.outside" =>
      val g = st.pop() match {
        case geo: WordsGeo.WsGeo => geo
        case o => throw new IllegalArgumentException(s"$w expects a GEOSHAPE: $o")
      }
      val inside = g.shape match {
        case Some(shape) => shape.containsCol(col("lat"), col("lon"))
        case None => graft.functions.GeoCells.inCover(col("lat"), col("lon"), g.cells, g.res)
      }
      val pred = if (w endsWith "within") inside
        else !org.apache.spark.sql.functions.coalesce(inside, lit(false))
      st.push(MapperDf(w, df => df.filter(pred)))
    case "mapper.geo.clear" =>
      st.push(MapperDf(w, df => df
        .withColumn("lat", lit(null).cast("double"))
        .withColumn("lon", lit(null).cast("double"))
        .withColumn("elev", lit(null).cast("long"))))
    case "mapper.geo.approximate" =>
      val res = st.popLong().toInt
      require(res >= 1 && res <= 28, s"$w resolution out of range: $res")
      st.push(MapperDf(w, df => {
        val n = 1L << res
        val cell = graft.functions.GeoCells.cellIdCol(col("lat"), col("lon"), res)
        val aLat = (cell.cast("double") / n).cast("long").cast("double") /
          n * 180.0 - 90.0 + 90.0 / n
        val aLon = pmod(cell, lit(n)).cast("double") / n * 360.0 - 180.0 + 180.0 / n
        df.withColumn("lat", when(col("lat").isNotNull, aLat))
          .withColumn("lon", when(col("lon").isNotNull, aLon))
      }))
    // selection mappers (script/mapper/MapperHighest.java, Lowest):
    // the k extreme values per series — the g25/r03 rank pattern
    case "mapper.highest" | "mapper.lowest" =>
      val k = st.popLong()
      require(k >= 1, s"$w expects k >= 1")
      st.push(MapperDf(w, df => {
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy(col("gtsid"))
          .orderBy(
            if (w == "mapper.highest") col("vdouble").desc else col("vdouble").asc,
            col("ts"))
        df.withColumn("__rn", row_number().over(win))
          .filter(col("__rn") <= k).drop("__rn")
      }))
    // STRICT* wrappers (fn/STRICTMAPPER.java: type-checking decorators;
    // the frame algebra is already typed)
    case "STRICTMAPPER" | "STRICTREDUCER" | "STRICTPARTITION" =>
      st.push(st.pop())
    case BucketizerName(a) => st.push(a)
    case MapperName(m) => st.push(m)
    case ReducerName(a) => st.push(a)
    case OpName(o) => st.push(o)
    // parametric filters pop their threshold NOW (value words compose:
    // `90.0 filter.last.gt` — script/filter/FilterLastGT-style)
    case "filter.last.gt" => st.push(FilterVal(w, col("last_v") > st.popNum()))
    case "filter.last.ge" => st.push(FilterVal(w, col("last_v") >= st.popNum()))
    case "filter.last.lt" => st.push(FilterVal(w, col("last_v") < st.popNum()))
    case "filter.last.le" => st.push(FilterVal(w, col("last_v") <= st.popNum()))
    case "filter.last.eq" => st.push(FilterVal(w, col("last_v") === st.popNum()))
    case "filter.bysize.gt" => st.push(FilterVal(w, col("size_v") > st.popLong()))
    // metadata filters (script/filter/FilterByClass.java, FilterByLabels):
    // regex on the series class; exact-or-~regex per-label selectors
    case "filter.byclass" =>
      val sel = st.popStr()
      // selector form: '~regex' (full match, like the reference's
      // Pattern.matches) or '=exact' / bare exact
      val pred =
        if (sel.startsWith("~")) col("class_v").rlike("^(?:" + sel.substring(1) + ")$")
        else col("class_v") === sel.stripPrefix("=")
      st.push(FilterVal(w, pred))
    case "filter.bylabels" =>
      val sel = st.pop().asInstanceOf[Map[Any, Any]]
      val pred = sel.map { case (k, v) =>
        val s = String.valueOf(v)
        if (s.startsWith("~"))
          col("labels_v").getItem(k.toString).rlike("^(?:" + s.substring(1) + ")$")
        else col("labels_v").getItem(k.toString) === s.stripPrefix("=")
      }.reduceOption(_ && _).getOrElse(lit(true))
      st.push(FilterVal(w, pred))
    case "filter.any.gt" => st.push(FilterVal(w, col("max_v") > st.popNum()))
    case "filter.all.gt" => st.push(FilterVal(w, col("min_v") > st.popNum()))

    // extension registries (separate objects keep each dispatch method
    // under the JVM method-size ceiling): control flow + stack tail,
    // scalar math/conversions, collections, crypto, GTS tail
    case other =>
      if (!WordsControl.eval(other, st, this) &&
          !WordsScalar.eval(other, st, this) &&
          !WordsColl.eval(other, st, this) &&
          !WordsCrypto.eval(other, st, this) &&
          !WordsGts.eval(other, st, this) &&
          !WordsExt2.eval(other, st, this) &&
          !WordsGeo.eval(other, st, this) &&
          !WordsAnalytics.eval(other, st, this) &&
          !WordsExt3.eval(other, st, this) &&
          !WordsDebug.eval(other, st, this) &&
          !WordsGts2.eval(other, st, this) &&
          !WordsExt4.eval(other, st, this))
        throw new IllegalArgumentException(s"unknown function '$other'")
  }

  // ---------------------------------------------------------------- helpers

  /** Matrix/vector overloads of + - * (reference binary ADD/SUB/MUL
    * RealMatrix/RealVector branches); false = not a matrix operand,
    * caller falls through to scalar arithmetic. */
  private def matBin(st: State, op: String): Boolean = {
    import WordsColl.{WsMat, WsVec}
    val isMatV = st.stack.length >= 2 &&
      (st.stack(0).isInstanceOf[WsMat] || st.stack(0).isInstanceOf[WsVec] ||
        st.stack(1).isInstanceOf[WsMat] || st.stack(1).isInstanceOf[WsVec])
    if (!isMatV) return false
    val b = st.pop(); val a = st.pop()
    def ew(x: Array[Double], y: Array[Double], f: (Double, Double) => Double) = {
      require(x.length == y.length, s"dimension mismatch: ${x.length} vs ${y.length}")
      Array.tabulate(x.length)(i => f(x(i), y(i)))
    }
    val out: Any = (a, b, op) match {
      case (WsMat(x), WsMat(y), "+") => WsMat(x.zip(y).map { case (r, s) => ew(r, s, _ + _) })
      case (WsMat(x), WsMat(y), "-") => WsMat(x.zip(y).map { case (r, s) => ew(r, s, _ - _) })
      case (WsMat(x), WsMat(y), "*") => // matrix product
        val k = y.length
        require(x(0).length == k, s"inner dimension mismatch: ${x(0).length} vs $k")
        WsMat(Array.tabulate(x.length, y(0).length)((i, j) =>
          (0 until k).map(t => x(i)(t) * y(t)(j)).sum))
      case (WsMat(x), WsVec(v), "*") =>
        WsVec(x.map(row => ew(row, v, _ * _).sum))
      case (WsVec(x), WsVec(y), "+") => WsVec(ew(x, y, _ + _))
      case (WsVec(x), WsVec(y), "-") => WsVec(ew(x, y, _ - _))
      case (WsVec(x), WsVec(y), "*") => ew(x, y, _ * _).sum // dot product
      case (WsMat(x), k: Long, "*") => WsMat(x.map(_.map(_ * k)))
      case (WsMat(x), k: Double, "*") => WsMat(x.map(_.map(_ * k)))
      case (WsVec(x), k: Long, "*") => WsVec(x.map(_ * k))
      case (WsVec(x), k: Double, "*") => WsVec(x.map(_ * k))
      case (k: Long, WsMat(x), "*") => WsMat(x.map(_.map(_ * k)))
      case (k: Double, WsMat(x), "*") => WsMat(x.map(_.map(_ * k)))
      case (k: Long, WsVec(x), "*") => WsVec(x.map(_ * k))
      case (k: Double, WsVec(x), "*") => WsVec(x.map(_ * k))
      case _ => throw new IllegalArgumentException(s"$op on $a, $b")
    }
    st.push(out)
    true
  }

  private[script] def binNum(st: State, fl: (Long, Long) => Long, fd: (Double, Double) => Double,
                     fs: Option[(String, String) => String] = None): Unit = {
    val b = st.pop(); val a = st.pop()
    (a, b) match {
      case (x: Long, y: Long) => st.push(fl(x, y))
      case (x: Long, y: Double) => st.push(fd(x.toDouble, y))
      case (x: Double, y: Long) => st.push(fd(x, y.toDouble))
      case (x: Double, y: Double) => st.push(fd(x, y))
      case (x: String, y: String) if fs.isDefined => st.push(fs.get(x, y))
      case _ => throw new IllegalArgumentException(s"type error: $a ? $b")
    }
  }

  private[script] def numEq(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Double) => x.toDouble == y
    case (x: Double, y: Long) => x == y.toDouble
    case _ => a == b
  }

  private[script] def cmp(st: State, ok: Int => Boolean): Unit = {
    val b = st.pop(); val a = st.pop()
    val c = (a, b) match {
      case (x: String, y: String) => x.compareTo(y)
      case _ => java.lang.Double.compare(
        a.asInstanceOf[Number].doubleValue(), b.asInstanceOf[Number].doubleValue())
    }
    st.push(ok(c))
  }

  private[script] def bool(v: Any): Boolean = v match {
    case b: Boolean => b
    case o => throw new IllegalArgumentException(s"expected BOOLEAN, got $o")
  }

  private[script] def asLong(v: Any): Long = v match {
    case l: Long => l
    case d: Double if d == d.toLong => d.toLong
    case o => throw new IllegalArgumentException(s"expected LONG, got $o")
  }

  private[script] def asNum(v: Any): Double = v match {
    case d: Double => d
    case l: Long => l.toDouble
    case o => throw new IllegalArgumentException(s"expected number, got $o")
  }

  /** RFC 3394 key wrap of PKCS7-padded payload (CryptoUtils.wrap:64-83
    * semantics — a full pad block is added when already 8-aligned). */
  private def aesWrap(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val padLen = 8 - data.length % 8
    val padded = java.util.Arrays.copyOf(data, data.length + padLen)
    java.util.Arrays.fill(padded, data.length, padded.length, padLen.toByte)
    val c = javax.crypto.Cipher.getInstance("AESWrap")
    c.init(javax.crypto.Cipher.WRAP_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"))
    c.wrap(new javax.crypto.spec.SecretKeySpec(padded, "AES"))
  }

  private def aesUnwrap(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AESWrap")
    c.init(javax.crypto.Cipher.UNWRAP_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"))
    val un = c.unwrap(data, "AES", javax.crypto.Cipher.SECRET_KEY).getEncoded
    un.dropRight(un.last & 0xff)
  }

  /** Byte-array operand: raw bytes pass through, strings are UTF-8. */
  private[script] def popBytes(st: State): Array[Byte] = st.pop() match {
    case b: Array[Byte] => b
    case s: String => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    case o => throw new IllegalArgumentException(s"expected BYTES, got $o")
  }

  /** Calendar-field mapper over the tick rendered as UTC (MapperYear
    * family); result cast to double like every vdouble. */
  private[script] def calMapper(w: String, f: Column => Column): MapperDf =
    MapperDf(w, df => df.withColumn("vdouble",
      f(timestamp_micros(col("ts"))).cast(org.apache.spark.sql.types.DoubleType)))

  /** TOBD.toBigDecimal (TOBD.java:44-64): exact from string (0x/0b
    * integer forms included), long, double, or pass-through. */
  private[script] def toBd(v: Any): java.math.BigDecimal = v match {
    case bd: java.math.BigDecimal => bd
    case s: String if s.startsWith("0x") =>
      new java.math.BigDecimal(new java.math.BigInteger(s.substring(2), 16))
    case s: String if s.startsWith("-0x") =>
      new java.math.BigDecimal(new java.math.BigInteger(s.substring(3), 16).negate())
    case s: String if s.startsWith("0b") =>
      new java.math.BigDecimal(new java.math.BigInteger(s.substring(2), 2))
    case s: String if s.startsWith("-0b") =>
      new java.math.BigDecimal(new java.math.BigInteger(s.substring(3), 2).negate())
    case s: String => new java.math.BigDecimal(s)
    case l: Long => java.math.BigDecimal.valueOf(l)
    case d: Double => java.math.BigDecimal.valueOf(d)
    case o => throw new IllegalArgumentException(s"cannot convert to BigDecimal: $o")
  }

  /** Natural WarpScript ordering: numbers by value, strings
    * lexicographically, mixed by rendered text (LSORT/KEYLIST). */
  private[script] def wsLt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Number, y: Number) => x.doubleValue() < y.doubleValue()
    case (x: String, y: String) => x < y
    case _ => String.valueOf(a) < String.valueOf(b)
  }

  private[script] def flatten(v: Vector[Any]): Vector[Any] = v.flatMap {
    case inner: Vector[_] => flatten(inner.asInstanceOf[Vector[Any]])
    case x => Vector(x)
  }

  private[script] def toFrame(v: Any): GtsFrame = v match {
    case f: GtsFrame => f
    case BucketedFrame(f, _, _, _) => f
    case b: GtsBuilder => materialize(b)
    case l: Vector[_] => framesOf(l)
    case o => throw new IllegalArgumentException(s"not a GTS frame: $o")
  }

  /** Bucket metadata for fill words; derives the count from the data
    * extent when BUCKETIZE was called with count 0 (the reference keeps
    * bucketcount on the bucketized GTS itself — GTSHelper.java bucket
    * fields). One tiny driver-side agg, same as bucketizeAuto. */
  private[script] def toBucketed(v: Any): BucketedFrame = v match {
    case b @ BucketedFrame(f, lb, span, count) =>
      if (count > 0) b
      else {
        val ft = f.df.agg(org.apache.spark.sql.functions.min(col("ts")))
          .head().getLong(0)
        BucketedFrame(f, lb, span, (lb - ft) / span + 1)
      }
    case o => throw new IllegalArgumentException(
      s"fill words need a BUCKETIZE result with explicit span: $o")
  }

  /** NEWGTS builder → one-series canonical frame (needs the session
    * the engine was constructed with). */
  private[script] def materialize(b: GtsBuilder): GtsFrame = {
    val spark = session.getOrElse(throw new IllegalStateException(
      "NEWGTS requires a WarpScriptEngine constructed with a session"))
    val schema = graft.model.Gts.pointSchema
    val rows = b.points.map { case (ts, loc, elev, v) =>
      // typed value dispatch: an encoder's points carry any value type
      // (GTSEncoder.addValue), one typed column set per point
      val (vt, vl, vd, vb, vs, vbin): (Byte, Any, Any, Any, Any, Any) = v match {
        case l: Long => (graft.model.GtsType.LONG, Long.box(l), null, null, null, null)
        case d: Double => (graft.model.GtsType.DOUBLE, null, Double.box(d), null, null, null)
        case b2: Boolean => (graft.model.GtsType.BOOLEAN, null, null, Boolean.box(b2), null, null)
        case s2: String => (graft.model.GtsType.STRING, null, null, null, s2, null)
        case bin: Array[Byte] => (graft.model.GtsType.BINARY, null, null, null, null, bin)
        case o => throw new IllegalArgumentException(s"encoder value: $o")
      }
      org.apache.spark.sql.Row(b.cls, b.labels, 0L, ts,
        loc.map(_._1).map(Double.box).orNull, loc.map(_._2).map(Double.box).orNull,
        elev.map(Long.box).orNull, vt, vl, vd, vb, vs, vbin)
    }
    GtsFrame(graft.model.Gts.canonicalRehash(
      spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema)))
  }

  /** Merge any frames found in a (possibly nested) list into one frame. */
  private[script] def framesOf(items: Seq[Any]): GtsFrame = {
    val frames = items.flatMap {
      case f: GtsFrame => Seq(f)
      case BucketedFrame(f, _, _, _) => Seq(f)
      case b: GtsBuilder => Seq(materialize(b))
      case l: Vector[_] => Seq(framesOf(l))
      case o => throw new IllegalArgumentException(s"not a GTS frame: $o")
    }
    if (frames.isEmpty) throw new IllegalArgumentException("no GTS on stack")
    frames.reduce(_ merge _)
  }
}

object WarpScriptEngine {

  /** The evaluation state: operand stack (head = top), symbol table,
    * and the reference's 256 numbered registers
    * (MemoryWarpScriptStack regs; POPR/PUSHR words). */
  private[script] final class State {
    val stack = new mutable.ArrayDeque[Any] // head = top of stack
    val symbols = mutable.Map.empty[String, Any]
    val regs = new Array[Any](256)
    // fn/DEF.java named-macro table, consulted before the builtin words
    val defs = mutable.Map.empty[String, WsMacro]
    val redefs = mutable.Set.empty[String]
    var ops: Long = 0 // fn/OPS.java counter
    // MAXOPS/MAXDEPTH/... soft limits (fn/MAXOPS.java family)
    val limits = mutable.Map.empty[String, Long]
    // DEBUGON/TIMEON/LINEON/... toggles
    val flags = mutable.Set.empty[String]
    // CHRONOSTART/CHRONOEND per-alias (totalNanos, activeSince, calls)
    val chrono = mutable.Map.empty[String, (Long, Long, Long)]
    // HIDE'd stack levels (SHOW restores)
    var hidden: List[Any] = Nil
    // SAVE/RESTORE contexts and the SECUREKEY
    var secureKey: Option[String] = None
    val startNanos: Long = System.nanoTime()
    // SETATTRIBUTES/ATTRIBUTES per-gtsid attribute store (the
    // distributed path is MetaOps; this is the stack-word surface)
    val attrs = mutable.Map.empty[Long, Map[String, String]]
    // CAPADD/CAPGET capability store (reference: token-carried caps)
    val caps = mutable.Map.empty[String, String]
    // KVSTORE/KVLOAD engine-side key-value store (the reference writes
    // through StoreClient; session state here, NEVER a data path — no
    // DataFrame-derived iterator may be stored)
    val kv = mutable.Map.empty[String, Any]
    def push(v: Any): Unit = stack.prepend(v)
    def pop(): Any =
      if (stack.isEmpty) throw new IllegalStateException("stack underflow")
      else stack.removeHead()
    def popLong(): Long = pop() match {
      case l: Long => l
      case d: Double if d == d.toLong => d.toLong
      case other => throw new IllegalArgumentException(s"expected LONG, got $other")
    }
    def popNum(): Double = pop() match {
      case l: Long => l.toDouble
      case d: Double => d
      case other => throw new IllegalArgumentException(s"expected number, got $other")
    }
    def popStr(): String = pop() match {
      case s: String => s
      case other => throw new IllegalArgumentException(s"expected STRING, got $other")
    }
    def popBool(): Boolean = pop() match {
      case b: Boolean => b
      case other => throw new IllegalArgumentException(s"expected BOOLEAN, got $other")
    }
  }

  /** Loop/macro control transfer, mirroring the reference's
    * WarpScriptLoopBreakException / LoopContinueException /
    * ReturnException / StopException hierarchy. Stackless — these are
    * jumps, not errors (but TRY catches them, as the reference's
    * `catch (Throwable)` does). */
  private[script] final class WsBreakEx
    extends RuntimeException("BREAK outside loop", null, false, false)
  private[script] final class WsContinueEx
    extends RuntimeException("CONTINUE outside loop", null, false, false)
  private[script] final class WsReturnEx(var levels: Long)
    extends RuntimeException("RETURN outside macro", null, false, false)
  private[script] final class WsStopEx
    extends RuntimeException("STOP", null, false, false)

  /** A native function value (NPDF-style builders): EVAL applies it to
    * the state like a macro. */
  private[script] final case class NativeFn(name: String, f: State => Unit)

  /** MACROMAPPER-family wrapper (MACROMAPPER.java's MacroMapperWrapper
    * implements mapper+reducer+bucketizer at once — one value, consumed
    * by MAP/REDUCE/BUCKETIZE/FILTER, executed by [[MacroKernel]]). */
  private[script] final case class MacroAgg(name: String, tokens: Vector[WsToken])

  /** A filler value (script/filler/Filler*.java builders), consumed by
    * the FILL word over a BUCKETIZE result. */
  private[script] final case class FillerVal(name: String,
      value: Double = Double.NaN)

  /** List/map builder marks (reference MARK object). */
  private[script] object ListMark
  private[script] object MapMark

  /** A captured `<% %>` macro (reference Macro). */
  final case class WsMacro(tokens: Vector[WsToken])

  /** A GTS under construction via NEWGTS/ADDVALUE, materialized into a
    * frame when first consumed by a frame word. */
  final case class GtsBuilder(cls: String, labels: Map[String, String],
      points: Vector[(Long, Option[(Double, Double)], Option[Long], Any)])

  /** A BUCKETIZE result carrying its bucket parameters — the reference
    * stores lastbucket/bucketspan/bucketcount on the GTS itself and the
    * fill words read them from there (fn/FILLPREVIOUS.java). */
  final case class BucketedFrame(frame: GtsFrame, lastbucket: Long,
      span: Long, count: Long)

  /** TYPEOF name of a stack value (fn/TYPEOF.java typeof). Shared by
    * TYPEOF and TDESCRIBE (the recursive variant). */
  private[script] def typeNameOf(v: Any): String = v match {
    case null => "NULL"
    case _: String => "STRING"
    case _: Long => "LONG"
    case _: Double => "DOUBLE"
    case _: java.math.BigDecimal => "BIGDECIMAL"
    case _: Boolean => "BOOLEAN"
    case _: Vector[_] => "LIST"
    case _: Map[_, _] => "MAP"
    case _: WsMacro => "MACRO"
    case _: Set[_] => "SET"
    case _: Array[Byte] => "BYTES"
    case _: WordsColl.WsMat => "MATRIX"
    case _: WordsColl.WsVec => "VECTOR"
    case _: java.util.regex.Pattern => "MATCHER"
    case _: GtsFrame | _: BucketedFrame | _: GtsBuilder => "GTS"
    case _: AggVal => "AGGREGATOR"
    case _: FilterVal => "FILTER"
    case _ => "FUNCTION"
  }

  /** Named aggregator usable as bucketizer/windowed-mapper/reducer —
    * the three families share implementations, as in the reference
    * (script/aggregator classes). */
  final case class AggVal(name: String, agg: ValueAgg)
  /** Pointwise value mapper (mapper.abs etc.). */
  final case class MapperCol(name: String, f: Column => Column)
  /** Whole-frame mapper reading columns beyond vdouble (mapper.tick,
    * the calendar mappers). */
  final case class MapperDf(name: String, f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
  /** Tick-aligned binary op for APPLY (script/op/Op*.java). */
  final case class OpVal(name: String, f: (Column, Column) => Column)
  /** Whole-series filter predicate over the per-series aggregate row
    * (last_v/min_v/max_v/size_v — see GtsFrame.filterSeries). */
  final case class FilterVal(name: String, pred: Column)

  private val aggByName: Map[String, ValueAgg] = Map(
    "sum" -> Sum, "mean" -> Mean, "min" -> Min, "max" -> Max,
    "count" -> CountAgg, "sd" -> Sd, "sd.pop" -> SdPop, "var" -> Var,
    "mad" -> Mad,
    "var.pop" -> VarPop, "median" -> Median, "rms" -> Rms,
    "first" -> First, "last" -> Last, "delta" -> Delta, "rate" -> Rate)

  object BucketizerName {
    def unapply(w: String): Option[AggVal] =
      if (w.startsWith("bucketizer.")) aggByName.get(w.stripPrefix("bucketizer."))
        .map(AggVal(w, _))
      else None
  }
  object ReducerName {
    def unapply(w: String): Option[AggVal] =
      if (w.startsWith("reducer.")) aggByName.get(w.stripPrefix("reducer."))
        .map(AggVal(w, _))
      else None
  }
  object MapperName {
    private val pointwise: Map[String, Column => Column] = Map(
      "abs" -> abs, "ceil" -> (v => ceil(v)), "floor" -> (v => floor(v)),
      "round" -> (v => round(v)), "sqrt" -> sqrt, "exp" -> exp, "ln" -> log,
      "tanh" -> tanh,
      "sigmoid" -> (v => lit(1.0) / (lit(1.0) + exp(-v))),
      "tolong" -> (_.cast(org.apache.spark.sql.types.LongType)),
      "todouble" -> (_.cast(org.apache.spark.sql.types.DoubleType)))
    def unapply(w: String): Option[Any] =
      if (!w.startsWith("mapper.")) None
      else {
        val n = w.stripPrefix("mapper.")
        aggByName.get(n).map(AggVal(w, _))
          .orElse(pointwise.get(n).map(MapperCol(w, _)))
      }
  }
  /** mapper.<cmp>.<coord> names (MapperTickEQ/GE/... families):
    * cmp ∈ eq/ne/gt/ge/lt/le, coord ∈ tick/lat/lon/elev. */
  object CoordMapperName {
    private val Pat = "^mapper\\.(eq|ne|gt|ge|lt|le)\\.(tick|lat|lon|elev)$".r
    def unapply(w: String): Option[(String, String)] = w match {
      case Pat(cmp, coord) =>
        Some((if (coord == "tick") "ts" else coord, cmp))
      case _ => None
    }
  }

  object OpName {
    private val ops: Map[String, (Column, Column) => Column] = Map(
      "add" -> (_ + _), "sub" -> (_ - _), "mul" -> (_ * _), "div" -> (_ / _),
      "eq" -> (_ === _), "ne" -> (_ =!= _), "gt" -> (_ > _), "ge" -> (_ >= _),
      "lt" -> (_ < _), "le" -> (_ <= _),
      "mask" -> ((v, _) => v), "negmask" -> ((v, _) => v))
    def unapply(w: String): Option[OpVal] =
      if (w.startsWith("op.")) ops.get(w.stripPrefix("op.")).map(OpVal(w, _))
      else None
  }
}
