package graft.script

/** Executor-side WarpScript interpreter for the MACRO* adapter words
  * (fn/MACROMAPPER.java family). The driver engine COMPILES whole
  * programs to Catalyst; a macro used as a mapper/reducer/bucketizer/
  * filter instead runs per window ON THE EXECUTORS, so the interpreter
  * here is deliberately self-contained and Serializable: plain token
  * vectors in, scalar stack out, no Spark, no driver state. It
  * re-derives the reference's scalar word semantics
  * (MemoryWarpScriptStack exec loop) for the word subset a window macro
  * can reach; unknown words throw, they never silently no-op.
  */
object ScalarEval extends Serializable {
  import WsToken._

  /** A per-series view given to MACROFILTER macros (the reference
    * passes real GeoTimeSerie instances; accessor words below read the
    * same surface). */
  final case class GtsLite(cls: String, labels: Map[String, String],
      ticks: Vector[Long], values: Vector[Any]) extends Serializable

  final case class Macro(tokens: Vector[WsToken]) extends Serializable

  final class EvalState extends Serializable {
    var stack: List[Any] = Nil
    val symbols = scala.collection.mutable.Map.empty[String, Any]
    def push(v: Any): Unit = stack = v :: stack
    def pop(): Any = stack match {
      case h :: t => stack = t; h
      case Nil => throw new IllegalStateException("macro stack underflow")
    }
    def popNum(): Double = pop() match {
      case l: Long => l.toDouble
      case d: Double => d
      case o => throw new IllegalArgumentException(s"expected number, got $o")
    }
    def popLong(): Long = pop() match {
      case l: Long => l
      case d: Double if d == d.toLong => d.toLong
      case o => throw new IllegalArgumentException(s"expected LONG, got $o")
    }
    def popBool(): Boolean = pop() match {
      case b: Boolean => b
      case o => throw new IllegalArgumentException(s"expected BOOLEAN, got $o")
    }
  }

  private final class BreakEx extends RuntimeException(null, null, false, false)
  private final class ContinueEx extends RuntimeException(null, null, false, false)

  /** Run `tokens` over an initial stack (head = top); returns the final
    * stack (head = top). */
  def run(tokens: Vector[WsToken], initial: List[Any]): List[Any] = {
    val st = new EvalState
    st.stack = initial
    exec(tokens, st)
    st.stack
  }

  def exec(tokens: Vector[WsToken], st: EvalState): Unit = {
    var i = 0
    while (i < tokens.length) {
      tokens(i) match {
        case WsStr(s) => st.push(s)
        case WsLong(l) => st.push(l)
        case WsDouble(d) => st.push(d)
        case WsBool(b) => st.push(b)
        case WsWord("<%") =>
          // collect the nested macro body
          var depth = 1; val body = Vector.newBuilder[WsToken]
          while (depth > 0) {
            i += 1
            tokens(i) match {
              case WsWord("<%") => depth += 1; body += tokens(i)
              case WsWord("%>") => depth -= 1; if (depth > 0) body += tokens(i)
              case t => body += t
            }
          }
          st.push(Macro(body.result()))
        case WsWord(w) => word(w, st)
      }
      i += 1
    }
  }

  private def num2(st: EvalState): (Any, Any) = { val b = st.pop(); (st.pop(), b) }

  private def arith(a: Any, b: Any, fl: (Long, Long) => Long,
      fd: (Double, Double) => Double): Any = (a, b) match {
    case (x: Long, y: Long) => fl(x, y)
    case (x: Long, y: Double) => fd(x.toDouble, y)
    case (x: Double, y: Long) => fd(x, y.toDouble)
    case (x: Double, y: Double) => fd(x, y)
    case o => throw new IllegalArgumentException(s"arith on $o")
  }

  /** EQ.compare for the executor subset: java-equals short circuit,
    * typed fast paths, exact BigDecimal comparison for mixed
    * long/double pairs — identical to WordsBinaryOps.refCompare so a
    * macro mapper's `==` agrees with the driver-side word. */
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => x.compareTo(y)
    case (x: Boolean, y: Boolean) => x.compareTo(y)
    case _ if a.asInstanceOf[AnyRef].equals(b.asInstanceOf[AnyRef]) => 0
    case (x: Double, y: Double) => x.compareTo(y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case _ =>
      def bd(v: Any): java.math.BigDecimal = v match {
        case d: Double => new java.math.BigDecimal(d)
        case l: Long => new java.math.BigDecimal(l)
        case o => throw new IllegalArgumentException(s"cannot compare $o")
      }
      bd(a).compareTo(bd(b))
  }

  private def isNaNv(x: Any) =
    x.isInstanceOf[Double] && x.asInstanceOf[Double].isNaN

  /** Comparison with the reference's per-operator NaN flags. */
  private def cmpNaN(a: Any, b: Any, op: Int => Boolean,
      oneNaN: Boolean, twoNaN: Boolean): Boolean =
    if (isNaNv(a) && isNaNv(b)) twoNaN
    else if (isNaNv(a) || isNaNv(b)) oneNaN
    else op(cmp(a, b))

  private def toD(v: Any): Double = v match {
    case l: Long => l.toDouble
    case d: Double => d
    case o => throw new IllegalArgumentException(s"expected number, got $o")
  }

  // scalastyle:off cyclomatic.complexity method.length
  private def word(w: String, st: EvalState): Unit = w match {
    case _ if w.startsWith("$") =>
      st.push(st.symbols.getOrElse(w.drop(1),
        throw new IllegalArgumentException(s"undefined symbol '${w.drop(1)}'")))
    case "STORE" => val n = st.pop().toString; st.symbols(n) = st.pop()
    case "LOAD" => st.push(st.symbols(st.pop().toString))
    case "EVAL" => st.pop() match {
      case Macro(ts) => exec(ts, st)
      case o => throw new IllegalArgumentException(s"EVAL on $o")
    }
    case "IFT" =>
      val m = st.pop().asInstanceOf[Macro]
      if (st.popBool()) exec(m.tokens, st)
    case "IFTE" =>
      val mf = st.pop().asInstanceOf[Macro]
      val mt = st.pop().asInstanceOf[Macro]
      if (st.popBool()) exec(mt.tokens, st) else exec(mf.tokens, st)
    case "FOREACH" =>
      val m = st.pop().asInstanceOf[Macro]
      val items: Iterable[() => Unit] = st.pop() match {
        case l: Vector[Any @unchecked] => l.map(v => () => st.push(v))
        case mp: Map[Any @unchecked, Any @unchecked] =>
          mp.map { case (k, v) => () => { st.push(k); st.push(v) } }
        case o => throw new IllegalArgumentException(s"FOREACH on $o")
      }
      try items.foreach { p =>
        p(); try exec(m.tokens, st) catch { case _: ContinueEx => }
      } catch { case _: BreakEx => }
    case "FOR" =>
      val m = st.pop().asInstanceOf[Macro]
      val to = st.popLong(); val from = st.popLong()
      var k = from
      try while (k <= to) {
        st.push(k)
        try exec(m.tokens, st) catch { case _: ContinueEx => }
        k += 1
      } catch { case _: BreakEx => }
    case "BREAK" => throw new BreakEx
    case "CONTINUE" => throw new ContinueEx

    // stack
    case "DUP" => val a = st.pop(); st.push(a); st.push(a)
    case "DROP" => st.pop()
    case "SWAP" => val b = st.pop(); val a = st.pop(); st.push(b); st.push(a)
    case "OVER" => val b = st.pop(); val a = st.pop(); st.push(a); st.push(b); st.push(a)
    case "ROT" =>
      val c = st.pop(); val b = st.pop(); val a = st.pop()
      st.push(b); st.push(c); st.push(a)
    case "DEPTH" => st.push(st.stack.length.toLong)
    case "CLEAR" => st.stack = Nil
    case "PICK" =>
      val n = st.popLong().toInt
      st.push(st.stack(n - 1))

    // arithmetic (binary/ADD.java promotion; '+' concatenates strings)
    case "+" => num2(st) match {
      case (x: String, y) => st.push(x + y)
      case (x, y: String) => st.push(x.toString + y)
      case (a, b) => st.push(arith(a, b, _ + _, _ + _))
    }
    case "-" => val (a, b) = num2(st); st.push(arith(a, b, _ - _, _ - _))
    case "*" => val (a, b) = num2(st); st.push(arith(a, b, _ * _, _ * _))
    // long/long stays long (binary/DIV.java:71), as in the driver engine
    case "/" => val (a, b) = num2(st); st.push(arith(a, b, _ / _, _ / _))
    case "%" => val (a, b) = num2(st); (a, b) match {
      case (x: Long, y: Long) => st.push(x % y)
      case _ => throw new IllegalArgumentException("% expects longs")
    }
    case "**" => val b = st.popNum(); val a = st.popNum(); st.push(math.pow(a, b))

    // comparison / logic — NaN flags per operator (EQ (false,true),
    // NE (true,false), LE/GE (false,true), LT/GT (false,false)) and
    // the exact EQ.compare via cmp
    case "==" => val (a, b) = num2(st)
      st.push(if (a.isInstanceOf[String] || a.isInstanceOf[Boolean])
        a == b else cmpNaN(a, b, _ == 0, oneNaN = false, twoNaN = true))
    case "!=" => val (a, b) = num2(st)
      st.push(if (a.isInstanceOf[String] || a.isInstanceOf[Boolean])
        a != b else cmpNaN(a, b, _ != 0, oneNaN = true, twoNaN = false))
    case "<" => val (a, b) = num2(st)
      st.push(cmpNaN(a, b, _ < 0, oneNaN = false, twoNaN = false))
    case "<=" => val (a, b) = num2(st)
      st.push(cmpNaN(a, b, _ <= 0, oneNaN = false, twoNaN = true))
    case ">" => val (a, b) = num2(st)
      st.push(cmpNaN(a, b, _ > 0, oneNaN = false, twoNaN = false))
    case ">=" => val (a, b) = num2(st)
      st.push(cmpNaN(a, b, _ >= 0, oneNaN = false, twoNaN = true))
    case "AND" | "&&" => val b = st.popBool(); st.push(st.popBool() && b)
    case "OR" | "||" => val b = st.popBool(); st.push(st.popBool() || b)
    case "NOT" | "!" => st.push(!st.popBool())

    // math
    case "ABS" => st.pop() match {
      case l: Long => st.push(math.abs(l))
      case d: Double => st.push(math.abs(d))
      case o => throw new IllegalArgumentException(s"ABS on $o")
    }
    case "SQRT" => st.push(math.sqrt(st.popNum()))
    case "CBRT" => st.push(math.cbrt(st.popNum()))
    case "EXP" => st.push(math.exp(st.popNum()))
    case "LN" => st.push(math.log(st.popNum()))
    // LOG is the NATURAL log in the reference (WarpScriptLib.java:3011
    // Math::log); LOG10 is the decimal one
    case "LOG" => st.push(math.log(st.popNum()))
    case "LOG10" => st.push(math.log10(st.popNum()))
    // FLOOR/CEIL return DOUBLEs (NumericalUnaryFunction, opL null);
    // ROUND is long-identity / Math.round (WarpScriptLib.java:3000)
    case "FLOOR" => st.push(math.floor(st.popNum()))
    case "CEIL" => st.push(math.ceil(st.popNum()))
    case "ROUND" => st.pop() match {
      case l: Long => st.push(l)
      case d: Double => st.push(math.round(d))
      case o => throw new IllegalArgumentException(s"ROUND on $o")
    }
    case "RINT" => st.push(math.rint(st.popNum()))
    case "SIN" => st.push(math.sin(st.popNum()))
    case "COS" => st.push(math.cos(st.popNum()))
    case "TAN" => st.push(math.tan(st.popNum()))
    case "ATAN" => st.push(math.atan(st.popNum()))
    case "TANH" => st.push(math.tanh(st.popNum()))
    case "MIN" => val (a, b) = num2(st); st.push(arith(a, b, math.min, math.min))
    case "MAX" => val (a, b) = num2(st); st.push(arith(a, b, math.max, math.max))
    case "TODOUBLE" => st.push(toD(st.pop()))
    case "TOLONG" => st.push(st.popLong())
    case "NaN" => st.push(Double.NaN)
    case "ISNaN" => st.push(st.pop() match {
      case d: Double => d.isNaN
      case _ => false
    })
    case "PI" | "pi" => st.push(math.Pi)
    case "e" => st.push(math.E)
    case "NULL" => st.push(null)
    case "ISNULL" => st.push(st.pop() == null)

    // lists / maps
    case "[" => st.push(ListMarker)
    case "]" =>
      var acc = List.empty[Any]
      var top = st.pop()
      while (top != ListMarker) { acc = top :: acc; top = st.pop() }
      st.push(acc.toVector)
    case "GET" =>
      val k = st.pop()
      st.pop() match {
        case v: Vector[Any @unchecked] =>
          val i0 = k.asInstanceOf[Long].toInt
          st.push(v(if (i0 < 0) v.length + i0 else i0))
        case m: Map[Any @unchecked, Any @unchecked] => st.push(m.getOrElse(k, null))
        case g: GtsLite => k.toString match { // map-style GTS access
          case "class" => st.push(g.cls)
          case o => throw new IllegalArgumentException(s"GET '$o' on GTS")
        }
        case o => throw new IllegalArgumentException(s"GET on $o")
      }
    case "SIZE" => st.pop() match {
      case v: Vector[_] => st.push(v.length.toLong)
      case m: Map[_, _] => st.push(m.size.toLong)
      case s: String => st.push(s.length.toLong)
      case g: GtsLite => st.push(g.ticks.length.toLong)
      case o => throw new IllegalArgumentException(s"SIZE on $o")
    }
    case "REVERSE" => st.push(st.pop().asInstanceOf[Vector[Any]].reverse)
    case "FLATTEN" =>
      def fl(v: Vector[Any]): Vector[Any] = v.flatMap {
        case i: Vector[Any @unchecked] => fl(i)
        case o => Vector(o)
      }
      st.push(fl(st.pop().asInstanceOf[Vector[Any]]))
    case "+!" =>
      val b = st.pop()
      st.push(st.pop().asInstanceOf[Vector[Any]] :+ b)
    case "->LIST" =>
      val n = st.popLong().toInt
      var acc = List.empty[Any]
      (0 until n).foreach(_ => acc = st.pop() :: acc)
      st.push(acc.toVector)
    case "LIST->" =>
      val v = st.pop().asInstanceOf[Vector[Any]]
      v.foreach(st.push)
      st.push(v.length.toLong)

    // GTS accessors for MACROFILTER (fn/NAME.java, LABELS, VALUES, TICKS)
    case "NAME" => st.push(st.pop().asInstanceOf[GtsLite].cls)
    case "LABELS" => st.push(st.pop().asInstanceOf[GtsLite].labels.asInstanceOf[Map[Any, Any]])
    case "VALUES" => st.push(st.pop().asInstanceOf[GtsLite].values)
    case "TICKS" => st.push(st.pop().asInstanceOf[GtsLite].ticks.map(_.asInstanceOf[Any]))
    case "FIRSTTICK" => st.push(st.pop().asInstanceOf[GtsLite].ticks.head)
    case "LASTTICK" => st.push(st.pop().asInstanceOf[GtsLite].ticks.last)

    case other => throw new IllegalArgumentException(
      s"word '$other' is not available inside an executor-side macro " +
        "(MACROMAPPER family interprets a scalar subset)")
  }
  // scalastyle:on cyclomatic.complexity method.length

  private object ListMarker extends Serializable

  /** Words this interpreter handles WITHOUT touching point data —
    * GROUPBY/FILTERBY use this to decide whether a keying macro can be
    * evaluated in one pass over collected series metadata (class +
    * labels only) instead of materializing each sub-series. VALUES/
    * TICKS/FIRSTTICK/LASTTICK/SIZE are excluded: on a metadata-only
    * GtsLite they would read an empty points vector and silently lie.
    */
  private val metadataSafeWords: Set[String] = Set(
    "IFT", "IFTE", "FOREACH", "FOR", "BREAK",
    "CONTINUE", "DUP", "DROP", "SWAP", "OVER", "ROT", "DEPTH", "CLEAR",
    "PICK", "+", "-", "*", "/", "%", "**", "==", "!=", "<", "<=", ">",
    ">=", "AND", "&&", "OR", "||", "NOT", "!", "ABS", "SQRT", "CBRT",
    "EXP", "LN", "LOG", "LOG10", "FLOOR", "CEIL", "ROUND", "RINT", "SIN", "COS",
    "TAN", "ATAN", "TANH", "MIN", "MAX", "TODOUBLE", "TOLONG", "NaN",
    "ISNaN", "PI", "pi", "e", "NULL", "ISNULL", "[", "]", "GET",
    "REVERSE", "FLATTEN", "+!", "->LIST", "LIST->", "NAME", "LABELS",
    "<%", "%>")

  // $var/LOAD/STORE/EVAL are deliberately NOT safe: they could reach
  // the calling engine's symbol scope, which this interpreter can't see
  def metadataSafe(tokens: Vector[WsToken]): Boolean = tokens.forall {
    case WsWord(w) => metadataSafeWords(w)
    case _ => true
  }
}
