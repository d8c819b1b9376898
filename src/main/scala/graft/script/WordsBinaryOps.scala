package graft.script

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{Gts, GtsType}
import graft.operators.GtsFrame

/** The binary operator family's non-scalar faces (binary/ADD.java,
  * SUB.java, MUL.java, DIV.java, MOD.java, BitwiseOperation.java,
  * SHIFTLEFT.java, SHIFTRIGHT.java):
  *
  *  - BigDecimal-exact number arithmetic (either operand BIGDECIMAL
  *    promotes the pair — add/subtract/multiply/divide/remainder on
  *    the exact decimals, TOBD.toBigDecimal coercion);
  *  - ADD's collection faces: `list x +` appends x (even another
  *    list), `set x +` adds, macro+macro concatenates (secure if
  *    either is);
  *  - the faithful matrix/vector faces (ADD: m+m, m+scalar both
  *    orders, v+v, v+scalar both orders; SUB: m-m, v-v only; MUL:
  *    m·m, m·scalar both orders, vᵀ·m preMultiply, m·v operate,
  *    v·scalar both orders — NO v·v dot; DIV: v/scalar only);
  *  - GTS×GTS: inner join on common ticks (GTSOpsHelper.applyBinaryOp
  *    — a tick-equality join in the frame model), result carries NO
  *    metadata and NO location/elevation, type LONG iff both LONG
  *    (ADD adds the STRING-concat face with STRING>DOUBLE>LONG
  *    precedence), bucketization merged when spans equal and
  *    lastbuckets congruent (handleBucketization);
  *  - GTS×scalar in either order: elementwise on the series with
  *    metadata, geo and bucket parameters retained (cloneEmpty copy),
  *    double face iff the scalar is a Double or the GTS is DOUBLE —
  *    a BIGDECIMAL scalar with a LONG GTS stays in LONG arithmetic
  *    via Number.longValue, exactly the reference's mix branch.
  *
  * These are stack-surface words (cold path): the per-point kernels
  * run as scala udfs to reproduce java.lang semantics (long division
  * truncation, overflow wrap, Double.toString rendering) bit-for-bit.
  */
private[script] object WordsBinaryOps {
  import WarpScriptEngine._

  private type JBD = java.math.BigDecimal

  private def isNum(x: Any) =
    x.isInstanceOf[Long] || x.isInstanceOf[Double] || x.isInstanceOf[JBD]
  private def isGts(x: Any) = x.isInstanceOf[GtsFrame] ||
    x.isInstanceOf[BucketedFrame] || x.isInstanceOf[GtsBuilder]
  private def toD(x: Any): Double = x match {
    case l: Long => l.toDouble; case d: Double => d
    case bd: JBD => bd.doubleValue
    case o => throw new IllegalArgumentException(s"not numeric: $o")
  }
  private def toL(x: Any): Long = x match {
    case l: Long => l; case d: Double => d.toLong
    case bd: JBD => bd.longValue
    case o => throw new IllegalArgumentException(s"not numeric: $o")
  }
  private def bd(x: Any): JBD = x match {
    case b: JBD => b
    case l: Long => java.math.BigDecimal.valueOf(l)
    case d: Double => java.math.BigDecimal.valueOf(d)
    case o => throw new IllegalArgumentException(s"not numeric: $o")
  }

  /** Java-rendering of a point value (GTSHelper.valueAtIndex
    * .toString() in ADD's string faces). */
  private val renderUdf = udf((t: Byte, l: java.lang.Long,
      d: java.lang.Double, s: String) =>
    if (t == GtsType.STRING) s
    else if (t == GtsType.LONG) String.valueOf(l)
    else String.valueOf(d))

  // ------------------------------------------------------------------
  // arithmetic: + - * / %
  // ------------------------------------------------------------------

  /** Dispatch the full reference face set for `+ - * / %`. Always
    * handles the word (throws the reference's type error otherwise). */
  def arith(w: String, st: State, en: WarpScriptEngine): Unit = {
    import WordsColl.{WsMat, WsVec}
    val op2 = st.pop(); val op1 = st.pop()

    def numNum(): Any =
      if (op1.isInstanceOf[JBD] || op2.isInstanceOf[JBD]) {
        val (a, b) = (bd(op1), bd(op2))
        w match {
          case "+" => a.add(b); case "-" => a.subtract(b)
          case "*" => a.multiply(b); case "/" => a.divide(b)
          case "%" => a.remainder(b)
        }
      } else if (op1.isInstanceOf[Double] || op2.isInstanceOf[Double]) {
        val (a, b) = (toD(op1), toD(op2))
        w match {
          case "+" => a + b; case "-" => a - b; case "*" => a * b
          case "/" => a / b; case "%" => a % b
        }
      } else {
        val (a, b) = (toL(op1), toL(op2))
        w match {
          case "+" => a + b; case "-" => a - b; case "*" => a * b
          case "/" => a / b; case "%" => a % b
        }
      }

    def ew(x: Array[Double], y: Array[Double], f: (Double, Double) => Double) = {
      require(x.length == y.length,
        s"dimension mismatch: ${x.length} vs ${y.length}")
      Array.tabulate(x.length)(i => f(x(i), y(i)))
    }
    def matMat(x: Array[Array[Double]], y: Array[Array[Double]]): Any = w match {
      case "+" => WsMat(x.zip(y).map { case (r, s) => ew(r, s, _ + _) })
      case "-" => WsMat(x.zip(y).map { case (r, s) => ew(r, s, _ - _) })
      case "*" =>
        val k = y.length
        require(x(0).length == k, s"inner dimension mismatch: ${x(0).length} vs $k")
        WsMat(Array.tabulate(x.length, y(0).length)((i, j) =>
          (0 until k).map(t => x(i)(t) * y(t)(j)).sum))
      case _ => fail()
    }
    def fail(): Nothing = throw new IllegalArgumentException(
      s"$w cannot operate on ${typeNameOf(op1)}, ${typeNameOf(op2)}")

    val out: Any = (op1, op2) match {
      case _ if isNum(op1) && isNum(op2) => numNum()
      case (a: String, b: String) if w == "+" => a + b
      // ADD list/set faces: the TOP operand is appended WHOLE —
      // [1 2] [3 4] + is [1 2 [3 4]] (ADD.java:88-99)
      case (l: Vector[Any @unchecked], x) if w == "+" => l :+ x
      case (s: Set[Any @unchecked], x) if w == "+" => s + x
      case (a: WsMacro, b: WsMacro) if w == "+" =>
        WsMacro(a.tokens ++ b.tokens, a.secure || b.secure,
          a.secureRecursive || b.secureRecursive)
      // matrix/vector faces — exactly the reference's per-op set
      case (WsMat(x), WsMat(y)) if w == "+" || w == "-" || w == "*" => matMat(x, y)
      case (WsMat(x), n) if isNum(n) && (w == "+" || w == "*") =>
        val k = toD(n)
        WsMat(x.map(_.map(v => if (w == "+") v + k else v * k)))
      case (n, WsMat(x)) if isNum(n) && (w == "+" || w == "*") =>
        val k = toD(n)
        WsMat(x.map(_.map(v => if (w == "+") v + k else v * k)))
      case (WsVec(x), WsVec(y)) if w == "+" => WsVec(ew(x, y, _ + _))
      case (WsVec(x), WsVec(y)) if w == "-" => WsVec(ew(x, y, _ - _))
      case (WsVec(x), WsMat(m)) if w == "*" => // vᵀ·M (preMultiply)
        require(m.length == x.length, s"dimension mismatch: ${m.length} vs ${x.length}")
        WsVec(Array.tabulate(m(0).length)(j => x.indices.map(i => x(i) * m(i)(j)).sum))
      case (WsMat(m), WsVec(x)) if w == "*" => // M·v (operate)
        WsVec(m.map(row => ew(row, x, _ * _).sum))
      case (WsVec(x), n) if isNum(n) && (w == "+" || w == "*" || w == "/") =>
        val k = toD(n)
        WsVec(x.map(v => w match {
          case "+" => v + k; case "*" => v * k; case "/" => v / k }))
      case (n, WsVec(x)) if isNum(n) && (w == "+" || w == "*") =>
        val k = toD(n)
        WsVec(x.map(v => if (w == "+") v + k else v * k))
      case _ if isGts(op1) && isGts(op2) && w != "%" =>
        gtsGts(w, op1, op2, en)
      case _ if (isGts(op1) && isNum(op2) && w != "%") ||
                (isNum(op1) && isGts(op2) && w != "%") =>
        gtsScalar(w, op1, op2, en)
      case _ if isGts(op1) && op2.isInstanceOf[String] && w == "+" =>
        gtsScalar(w, op1, op2, en)
      case _ if op1.isInstanceOf[String] && isGts(op2) && w == "+" =>
        gtsScalar(w, op1, op2, en)
      case _ => fail()
    }
    st.push(out)
  }

  // ------------------------------------------------------------------
  // bitwise: & | ^ << >> >>>
  // ------------------------------------------------------------------

  /** BitwiseOperation.java face set: two LONGs; a BIGDECIMAL/number
    * combination via exact BigIntegers; two LONG GTS (tick join); a
    * LONG GTS below a LONG mask on top. `<< >> >>>` share the faces
    * (SHIFTLEFT/SHIFTRIGHT extend BitwiseOperation). */
  def bitwise(w: String, st: State, en: WarpScriptEngine): Unit = {
    val op2 = st.pop(); val op1 = st.pop()
    def opL(a: Long, b: Long): Long = w match {
      case "&" => a & b; case "|" => a | b; case "^" => a ^ b
      case "<<" => a << b; case ">>" => a >> b; case ">>>" => a >>> b
    }
    def opBi(a: java.math.BigInteger, b: java.math.BigInteger): java.math.BigInteger = w match {
      case "&" => a.and(b); case "|" => a.or(b); case "^" => a.xor(b)
      case "<<" => a.shiftLeft(b.intValueExact)
      case ">>" | ">>>" => a.shiftRight(b.intValueExact)
    }
    def bi(x: Any): java.math.BigInteger = bd(x).toBigIntegerExact
    val err = s"$w can only operate on two LONG, or two LONG GTS, or " +
      "one LONG GTS and a LONG, or a BIGDECIMAL/LONG combination"
    (op1, op2) match {
      case (a: Long, b: Long) => st.push(opL(a, b))
      case _ if isNum(op1) && isNum(op2) &&
          (op1.isInstanceOf[JBD] || op2.isInstanceOf[JBD]) =>
        st.push(new java.math.BigDecimal(opBi(bi(op1), bi(op2))))
      case _ if isGts(op1) && isGts(op2) =>
        st.push(gtsGtsBitwise(opL, op1, op2, en, err))
      case (_, mask: Long) if isGts(op1) =>
        st.push(gtsMaskBitwise(opL, op1, mask, en, err))
      case _ => throw new IllegalArgumentException(err)
    }
  }

  // ------------------------------------------------------------------
  // comparisons: == != < <= > >= (binary/ComparisonOperation.java,
  // EQ.java, NE.java) — NaN flag semantics, exact EQ.compare (mixed
  // long/double pairs compare through exact BigDecimals, so
  // `10 10.0 ==` is true and big longs never lose precision), string
  // and unsigned-bytes orders, and the GTS FILTER faces: a comparison
  // on a GTS keeps the points where it holds (gts1's value and geo)
  // ------------------------------------------------------------------

  /** name → (int-comparator face, trueIfOneNaN, trueIfTwoNaN). */
  private val cmpSpecs: Map[String, (Int => Boolean, Boolean, Boolean)] = Map(
    "==" -> (((c: Int) => c == 0, false, true)),
    "!=" -> (((c: Int) => c != 0, true, false)),
    "<" -> (((c: Int) => c < 0, false, false)),
    ">" -> (((c: Int) => c > 0, false, false)),
    "<=" -> (((c: Int) => c <= 0, false, true)),
    ">=" -> (((c: Int) => c >= 0, false, true)))

  /** EQ.compare: equals short-circuit, typed fast paths, exact
    * BigDecimal comparison for mixed number types. */
  private def refCompare(a: Any, b: Any): Int =
    // JAVA equals, not Scala's == — BoxesRunTime's cooperative numeric
    // equality would make boxed Long(2^53+1) equal Double(2^53) and
    // skip the exact BigDecimal path the reference takes
    if (a.asInstanceOf[AnyRef].equals(b.asInstanceOf[AnyRef])) 0
    else (a, b) match {
      case (x: Double, y: Double) => x.compareTo(y)
      case (x: Long, y: Long) => java.lang.Long.compare(x, y)
      case _ =>
        def asBd(v: Any): JBD = v match {
          // new BigDecimal(double) — the EXACT binary expansion, as
          // EQ.compare uses (not valueOf)
          case d: Double => new java.math.BigDecimal(d)
          case l: Long => new java.math.BigDecimal(l)
          case x: JBD => x
          case o => throw new IllegalArgumentException(s"not numeric: $o")
        }
        asBd(a).compareTo(asBd(b))
    }

  private def isNaN(x: Any) =
    x.isInstanceOf[Double] && x.asInstanceOf[Double].isNaN
  private def cmpOperand(x: Any) =
    isNum(x) || x.isInstanceOf[String] || x.isInstanceOf[Boolean]

  /** EQ/NE apply (EQ.java:44-63): number/GTS combos go through the
    * comparison; GEOSHAPEs compare their cell sets; byte arrays
    * compare contents; everything else falls back to equals. */
  def equality(w: String, st: State, en: WarpScriptEngine): Unit = {
    val op2 = st.pop(); val op1 = st.pop()
    val viaComparison = (isNum(op1) && isNum(op2)) ||
      (isGts(op1) && isGts(op2)) ||
      (isGts(op1) && cmpOperand(op2)) || (isGts(op2) && cmpOperand(op1))
    if (viaComparison) { comparisonPair(w, op1, op2, st, en); return }
    val eq = (op1, op2) match {
      case (a: WordsGeo.WsGeo, b: WordsGeo.WsGeo) => a.cells == b.cells
      case (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.equals(a, b)
      case (null, x) => x == null
      case (a, b) => a == b
    }
    st.push(if (w == "==") eq else !eq)
  }

  /** LT/GT/LE/GE apply = ComparisonOperation.comparison directly. */
  def comparison(w: String, st: State, en: WarpScriptEngine): Unit = {
    val op2 = st.pop(); val op1 = st.pop()
    comparisonPair(w, op1, op2, st, en)
  }

  private def comparisonPair(w: String, op1: Any, op2: Any, st: State,
      en: WarpScriptEngine): Unit = {
    val (opI, oneNaN, twoNaN) = cmpSpecs(w)
    (op1, op2) match {
      case _ if isNaN(op1) && isNaN(op2) => st.push(twoNaN)
      case _ if isNaN(op1) && !isGts(op2) => st.push(oneNaN)
      case _ if isNaN(op2) && !isGts(op1) => st.push(oneNaN)
      case _ if isNum(op1) && isNum(op2) =>
        st.push(opI(refCompare(op1, op2)))
      case (a: String, b: String) => st.push(opI(a.compareTo(b)))
      case (a: Array[Byte], b: Array[Byte]) =>
        st.push(opI(java.util.Arrays.compareUnsigned(a, b)))
      case _ if isGts(op1) && isGts(op2) =>
        st.push(gtsGtsCompare(w, op1, op2, en))
      case _ if isGts(op1) && cmpOperand(op2) =>
        st.push(gtsScalarCompare(w, op1, op2, gtsLeft = true, en))
      case _ if isGts(op2) && cmpOperand(op1) =>
        st.push(gtsScalarCompare(w, op2, op1, gtsLeft = false, en))
      case _ => throw new IllegalArgumentException(
        s"$w can only operate on numbers, strings, byte arrays or GTS")
    }
  }

  /** GTS×GTS comparison: inner tick join, keep gts1's value AND geo
    * where the comparison holds (copyGts1Location=true), metadata-free
    * result, merged bucketization. */
  private def gtsGtsCompare(w: String, op1: Any, op2: Any,
      en: WarpScriptEngine): Any = {
    val (opI, oneNaN, twoNaN) = cmpSpecs(w)
    val fa = en.toFrame(op1).df; val fb = en.toFrame(op2).df
    val ta = gtsType(fa, w); val tb = gtsType(fb, w)
    if (ta.isEmpty || tb.isEmpty)
      return mergedBuckets(op1, op2, GtsFrame(bareGeoResult(
        fa.limit(0))), en)
    val bothStr = ta.contains(GtsType.STRING) && tb.contains(GtsType.STRING)
    def numT(t: Option[Byte]) =
      t.contains(GtsType.LONG) || t.contains(GtsType.DOUBLE)
    require(bothStr || (numT(ta) && numT(tb)),
      s"$w can only operate on two GTS with NUMBER or STRING values")
    val a = fa.select(col("ts"), col("lat"), col("lon"), col("elev"),
      col("vtype"), col("vlong"), col("vdouble"), col("vstring"))
    val b = fb.select(col("ts"), col("vtype").as("vtype_b"),
      col("vlong").as("vlong_b"), col("vdouble").as("vdouble_b"),
      col("vstring").as("vstring_b"))
    val keep =
      if (bothStr) udf((x: String, y: String) => opI(x.compareTo(y)))
        .apply(col("vstring"), col("vstring_b"))
      else udf((ta2: Byte, la: java.lang.Long, da: java.lang.Double,
          tb2: Byte, lb: java.lang.Long, db: java.lang.Double) => {
        val aNaN = ta2 == GtsType.DOUBLE && da.doubleValue.isNaN
        val bNaN = tb2 == GtsType.DOUBLE && db.doubleValue.isNaN
        if (aNaN && bNaN) twoNaN
        else if (aNaN || bNaN) oneNaN
        else {
          val va: Any = if (ta2 == GtsType.LONG) la.longValue else da.doubleValue
          val vb: Any = if (tb2 == GtsType.LONG) lb.longValue else db.doubleValue
          opI(refCompare(va, vb))
        }
      }).apply(col("vtype"), col("vlong"), col("vdouble"),
        col("vtype_b"), col("vlong_b"), col("vdouble_b"))
    val j = a.join(b, Seq("ts"), "inner").filter(keep)
    mergedBuckets(op1, op2, GtsFrame(bareGeoResult(j)), en)
  }

  /** A metadata-free result that KEEPS the per-point geo and typed
    * value slots already present in `j` (comparison results copy
    * gts1's location). */
  private def bareGeoResult(j: DataFrame): DataFrame =
    Gts.canonicalRehash(j.select(
      lit("").as("class"),
      typedLit(Map.empty[String, String]).as("labels"),
      lit(0L).as("gtsid"), col("ts"), col("lat"), col("lon"), col("elev"),
      col("vtype"), col("vlong"), col("vdouble"),
      lit(null).cast("boolean").as("vbool"), col("vstring"),
      lit(null).cast("binary").as("vbinary")))

  /** GTS vs scalar comparison: a FILTER over the series (metadata,
    * geo and bucket parameters kept). `gtsLeft` = the GTS was op1;
    * when false the comparison order flips (orderFactor −1). */
  private def gtsScalarCompare(w: String, g: Any, c: Any, gtsLeft: Boolean,
      en: WarpScriptEngine): Any = {
    val (opI, oneNaN, twoNaN) = cmpSpecs(w)
    val factor = if (gtsLeft) 1 else -1
    val f = en.toFrame(g).df
    val t = gtsType(f, w)
    val out: DataFrame = t match {
      case None => f // empty gts: cloneEmpty
      case Some(GtsType.STRING) =>
        require(c.isInstanceOf[String],
          s"$w: GTS values and the top operand must have the same type")
        val cs = c.asInstanceOf[String]
        val keep = udf((v: String) => opI(v.compareTo(cs) * factor))
        f.filter(keep(col("vstring")))
      case Some(GtsType.BOOLEAN) =>
        require(c.isInstanceOf[Boolean],
          s"$w: GTS values and the top operand must have the same type")
        val cb = c.asInstanceOf[Boolean]
        val keep = udf((v: Boolean) =>
          opI(java.lang.Boolean.compare(v, cb) * factor))
        f.filter(keep(col("vbool")))
      case Some(GtsType.DOUBLE) =>
        require(isNum(c), s"$w: GTS values and the top operand must " +
          "have the same type")
        if (isNaN(c)) {
          val keep = udf((v: Double) =>
            if (v.isNaN) twoNaN else oneNaN)
          f.filter(keep(col("vdouble")))
        } else {
          val keep = udf((v: Double) =>
            if (v.isNaN) oneNaN else opI(refCompare(v, c) * factor))
          f.filter(keep(col("vdouble")))
        }
      case Some(GtsType.LONG) =>
        require(isNum(c), s"$w: GTS values and the top operand must " +
          "have the same type")
        if (isNaN(c)) { if (oneNaN) f else f.limit(0) }
        else {
          val keep = udf((v: Long) => opI(refCompare(v, c) * factor))
          f.filter(keep(col("vlong")))
        }
      case _ => throw new IllegalArgumentException(
        s"$w cannot operate on this GTS type")
    }
    g match {
      case BucketedFrame(_, lb, sp, cc) => BucketedFrame(GtsFrame(out), lb, sp, cc)
      case _ => GtsFrame(out)
    }
  }

  // ------------------------------------------------------------------
  // AND/OR (binary/CondShortCircuit.java): two booleans, a LIST of
  // booleans/boolean-macros with short-circuit evaluation, or two
  // BOOLEAN GTS joined on common ticks
  // ------------------------------------------------------------------

  def condShortCircuit(w: String, st: State, en: WarpScriptEngine): Unit = {
    val trigger = w == "OR" || w == "||" // AND short-circuits on false
    st.pop() match {
      case l: Vector[Any @unchecked] =>
        for (raw <- l) {
          val v = raw match {
            case m: WsMacro => en.evalMacro(m, st); st.pop()
            case x => x
          }
          v match {
            case b: Boolean =>
              if (b == trigger) { st.push(trigger); return }
            case o => throw new IllegalArgumentException(
              s"$w list elements must be booleans or boolean macros, got $o")
          }
        }
        st.push(!trigger)
      case top =>
        val op1 = st.pop()
        (op1, top) match {
          case (a: Boolean, b: Boolean) =>
            st.push(if (trigger) a || b else a && b)
          case _ if isGts(op1) && isGts(top) =>
            val fa = en.toFrame(op1).df; val fb = en.toFrame(top).df
            val ta = gtsType(fa, w); val tb = gtsType(fb, w)
            def boolOk(t: Option[Byte]) =
              t.isEmpty || t.contains(GtsType.BOOLEAN)
            require(boolOk(ta) && boolOk(tb),
              s"$w can only operate on boolean values or boolean GTS")
            if (ta.isEmpty || tb.isEmpty) {
              st.push(mergedBuckets(op1, top,
                GtsFrame(bareBoolResult(fa.limit(0), lit(false))), en))
            } else {
              val a = fa.select(col("ts"), col("vbool").as("vbool_a"))
              val b = fb.select(col("ts"), col("vbool").as("vbool_b"))
              val j = a.join(b, Seq("ts"), "inner")
              val v = if (trigger) col("vbool_a") || col("vbool_b")
                      else col("vbool_a") && col("vbool_b")
              st.push(mergedBuckets(op1, top,
                GtsFrame(bareBoolResult(j, v)), en))
            }
          case (a, b) => throw new IllegalArgumentException(
            s"$w can only operate on two boolean values, two boolean " +
              s"GTS, or a list of booleans/macros — got $a, $b")
        }
    }
  }

  private[script] def isGtsOperand(x: Any): Boolean = isGts(x)

  /** APPEND's GTS face (fn/APPEND.java → GTSHelper.merge:4398): the
    * BASE (below) keeps its metadata; the top GTS's points are
    * appended to it, restamped with the base's identity. An empty top
    * returns the base unchanged; an empty base adopts the top's
    * points (under the base's metadata when the base is a literal
    * builder that still carries one). Types must match otherwise. */
  private[script] def gtsAppend(base: Any, add: Any,
      en: WarpScriptEngine): Any = {
    val fb = en.toFrame(base).df
    val fg = en.toFrame(add).df
    val tb = gtsType(fb, "APPEND"); val tg = gtsType(fg, "APPEND")
    if (tg.isEmpty) return base
    require(tb.isEmpty || tb == tg,
      "APPEND can only merge GTS of matching types")
    val valueCols = Seq("ts", "lat", "lon", "elev", "vtype", "vlong",
      "vdouble", "vbool", "vstring", "vbinary")
    val restamped: DataFrame =
      if (tb.isEmpty) base match {
        case b: GtsBuilder =>
          fg.select(Seq(lit(b.cls).as("class"), typedLit(b.labels).as("labels"),
            lit(0L).as("gtsid")) ++ valueCols.map(col): _*)
        case _ => fg // empty frame carries no metadata to keep
      } else {
        val m = fb.select(col("class"), col("labels")).head()
        fg.select(Seq(lit(m.getString(0)).as("class"),
          typedLit(m.getMap[String, String](1).toMap).as("labels"),
          lit(0L).as("gtsid")) ++ valueCols.map(col): _*)
      }
    GtsFrame(Gts.canonicalRehash(
      if (tb.isEmpty) restamped
      else fb.select(Seq(col("class"), col("labels"),
        lit(0L).as("gtsid")) ++ valueCols.map(col): _*)
        .unionByName(restamped)))
  }

  /** unary/NOT.java: a boolean, or a BOOLEAN GTS negated in place
    * (metadata, geo and bucket parameters kept). */
  def booleanNot(st: State, en: WarpScriptEngine): Unit = st.pop() match {
    case b: Boolean => st.push(!b)
    case g if isGts(g) =>
      val f = en.toFrame(g).df
      val t = gtsType(f, "NOT")
      require(t.isEmpty || t.contains(GtsType.BOOLEAN),
        "NOT can only operate on a boolean value or a boolean GTS")
      val out = f.withColumn("vbool", !col("vbool"))
      st.push(g match {
        case BucketedFrame(_, lb, sp, cc) =>
          BucketedFrame(GtsFrame(out), lb, sp, cc)
        case _ => GtsFrame(out)
      })
    case o => throw new IllegalArgumentException(
      s"NOT can only operate on a boolean value or a boolean GTS, got $o")
  }

  private def bareBoolResult(j: DataFrame, v: Column): DataFrame =
    Gts.canonicalRehash(j.select(
      lit("").as("class"),
      typedLit(Map.empty[String, String]).as("labels"),
      lit(0L).as("gtsid"), col("ts"),
      lit(null).cast("double").as("lat"),
      lit(null).cast("double").as("lon"),
      lit(null).cast("long").as("elev"),
      lit(GtsType.BOOLEAN).as("vtype"),
      lit(null).cast("long").as("vlong"),
      lit(null).cast("double").as("vdouble"),
      v.cast("boolean").as("vbool"),
      lit(null).cast("string").as("vstring"),
      lit(null).cast("binary").as("vbinary")))

  // ------------------------------------------------------------------
  // GTS faces
  // ------------------------------------------------------------------

  /** (#series, value types) of a frame in one action. */
  private def frameShape(df: DataFrame): (Long, Set[Byte]) = {
    val r = df.groupBy().agg(
      countDistinct(col("gtsid")).as("n"),
      collect_set(col("vtype")).as("ts")).head()
    (r.getLong(0), r.getSeq[Byte](1).toSet)
  }

  /** The single homogeneous type of a stack GTS operand (None when
    * empty — the reference's TYPE.UNDEFINED). */
  private def gtsType(df: DataFrame, w: String): Option[Byte] = {
    val (n, ts) = frameShape(df)
    require(n <= 1, s"$w operates on single GTS operands, got $n series")
    require(ts.size <= 1, s"$w cannot operate on a mixed-type GTS")
    ts.headOption
  }

  private def vAsDouble(p: String) =
    coalesce(col(s"vdouble$p"), col(s"vlong$p").cast("double"))

  /** Empty frame result with NO metadata (the reference's
    * `new GeoTimeSerie()` result in the GTS×GTS faces). */
  private def bareResult(j: DataFrame, vtype: Byte, vlong: Column,
      vdouble: Column, vstring: Column): DataFrame =
    Gts.canonicalRehash(j.select(
      lit("").as("class"),
      typedLit(Map.empty[String, String]).as("labels"),
      lit(0L).as("gtsid"),
      col("ts"),
      lit(null).cast("double").as("lat"),
      lit(null).cast("double").as("lon"),
      lit(null).cast("long").as("elev"),
      lit(vtype).as("vtype"),
      vlong.cast("long").as("vlong"),
      vdouble.cast("double").as("vdouble"),
      lit(null).cast("boolean").as("vbool"),
      vstring.cast("string").as("vstring"),
      lit(null).cast("binary").as("vbinary")))

  /** handleBucketization: merged bucket params when both operands are
    * bucketized with equal span and congruent lastbuckets. */
  private def mergedBuckets(op1: Any, op2: Any, result: GtsFrame,
      en: WarpScriptEngine): Any = (op1, op2) match {
    case (b1: BucketedFrame, b2: BucketedFrame)
        if b1.span == b2.span && b1.span > 0 &&
          b1.lastbucket % b1.span == b2.lastbucket % b2.span =>
      val c1 = en.toBucketed(b1); val c2 = en.toBucketed(b2)
      val lb = math.max(c1.lastbucket, c2.lastbucket)
      val first = math.min(c1.lastbucket - (c1.count - 1) * c1.span,
        c2.lastbucket - (c2.count - 1) * c2.span)
      BucketedFrame(result, lb, b1.span, (lb - first) / b1.span + 1)
    case _ => result
  }

  /** GTS×GTS arithmetic: inner tick join, metadata-free result. */
  private def gtsGts(w: String, op1: Any, op2: Any,
      en: WarpScriptEngine): Any = {
    val fa = en.toFrame(op1).df
    val fb = en.toFrame(op2).df
    val ta = gtsType(fa, w); val tb = gtsType(fb, w)
    require(!ta.contains(GtsType.BOOLEAN) && !tb.contains(GtsType.BOOLEAN),
      s"$w cannot operate on BOOLEAN Geo Time Series")
    if (w != "+") {
      def numOk(t: Option[Byte]) =
        t.isEmpty || t.contains(GtsType.LONG) || t.contains(GtsType.DOUBLE)
      require(numOk(ta) && numOk(tb),
        s"$w can only operate on numeric Geo Time Series")
    } else {
      require(!ta.contains(GtsType.BINARY) && !tb.contains(GtsType.BINARY),
        s"$w cannot operate on BINARY Geo Time Series")
    }
    val a = fa.select(col("ts"), col("vtype").as("vtype_a"),
      col("vlong").as("vlong_a"), col("vdouble").as("vdouble_a"),
      col("vstring").as("vstring_a"))
    val b = fb.select(col("ts"), col("vtype").as("vtype_b"),
      col("vlong").as("vlong_b"), col("vdouble").as("vdouble_b"),
      col("vstring").as("vstring_b"))
    val j = a.join(b, Seq("ts"), "inner")
    val isStr = w == "+" &&
      (ta.contains(GtsType.STRING) || tb.contains(GtsType.STRING))
    val bothLong = ta.contains(GtsType.LONG) && tb.contains(GtsType.LONG)
    val uL = udf((x: Long, y: Long) => w match {
      case "+" => x + y; case "-" => x - y; case "*" => x * y
      case "/" => x / y })
    val uD = udf((x: Double, y: Double) => w match {
      case "+" => x + y; case "-" => x - y; case "*" => x * y
      case "/" => x / y })
    val result: DataFrame =
      if (isStr) {
        val sa = renderUdf(col("vtype_a"), col("vlong_a"),
          col("vdouble_a"), col("vstring_a"))
        val sb = renderUdf(col("vtype_b"), col("vlong_b"),
          col("vdouble_b"), col("vstring_b"))
        bareResult(j, GtsType.STRING, lit(null), lit(null), concat(sa, sb))
      } else if (bothLong)
        bareResult(j, GtsType.LONG,
          uL(col("vlong_a"), col("vlong_b")), lit(null), lit(null))
      else
        bareResult(j, GtsType.DOUBLE, lit(null),
          uD(vAsDouble("_a"), vAsDouble("_b")), lit(null))
    mergedBuckets(op1, op2, GtsFrame(result), en)
  }

  /** GTS×scalar (either order): elementwise with metadata and geo
    * kept; ADD's string face concatenates in stack order. */
  private def gtsScalar(w: String, op1: Any, op2: Any,
      en: WarpScriptEngine): Any = {
    val gtsLeft = isGts(op1)
    val g = if (gtsLeft) op1 else op2
    val c = if (gtsLeft) op2 else op1
    val f = en.toFrame(g).df
    val t = gtsType(f, w)
    require(!t.contains(GtsType.BOOLEAN),
      s"$w cannot operate on BOOLEAN Geo Time Series")
    // ADD's mix face only admits String/Double/Long scalars — a
    // BIGDECIMAL falls through to its type-dispatch else and throws
    // (ADD.java:186-189); SUB/MUL/DIV take any Number via longValue
    require(w != "+" || c.isInstanceOf[String] || c.isInstanceOf[Double] ||
      c.isInstanceOf[Long],
      s"$w can only be used with String or numeric types with a GTS")
    val isStr = w == "+" &&
      (c.isInstanceOf[String] || t.contains(GtsType.STRING))
    if (!isStr) {
      require(!c.isInstanceOf[String] && !t.contains(GtsType.STRING) &&
        !t.contains(GtsType.BINARY),
        s"$w can only be used with String or numeric types with a GTS")
    }
    val keep = Seq("class", "labels", "gtsid", "ts", "lat", "lon", "elev")
      .map(col)
    val out: DataFrame =
      if (isStr) {
        val cs = String.valueOf(c)
        val vs = renderUdf(col("vtype"), col("vlong"), col("vdouble"),
          col("vstring"))
        val conc = if (gtsLeft) concat(vs, lit(cs)) else concat(lit(cs), vs)
        f.select(keep :+ lit(GtsType.STRING).as("vtype") :+
          lit(null).cast("long").as("vlong") :+
          lit(null).cast("double").as("vdouble") :+
          lit(null).cast("boolean").as("vbool") :+
          conc.as("vstring") :+
          lit(null).cast("binary").as("vbinary"): _*)
      } else if (c.isInstanceOf[Double] || t.contains(GtsType.DOUBLE)) {
        val k = toD(c)
        val uD = udf((x: Double) => w match {
          case "+" => if (gtsLeft) x + k else k + x
          case "-" => if (gtsLeft) x - k else k - x
          case "*" => if (gtsLeft) x * k else k * x
          case "/" => if (gtsLeft) x / k else k / x })
        f.select(keep :+ lit(GtsType.DOUBLE).as("vtype") :+
          lit(null).cast("long").as("vlong") :+
          uD(coalesce(col("vdouble"), col("vlong").cast("double")))
            .as("vdouble") :+
          lit(null).cast("boolean").as("vbool") :+
          lit(null).cast("string").as("vstring") :+
          lit(null).cast("binary").as("vbinary"): _*)
      } else {
        // LONG path — a BIGDECIMAL scalar truncates via longValue
        // (the reference mix branch tests `op instanceof Double` only)
        val k = toL(c)
        val uL = udf((x: Long) => w match {
          case "+" => if (gtsLeft) x + k else k + x
          case "-" => if (gtsLeft) x - k else k - x
          case "*" => if (gtsLeft) x * k else k * x
          case "/" => if (gtsLeft) x / k else k / x })
        f.select(keep :+ lit(GtsType.LONG).as("vtype") :+
          uL(col("vlong")).as("vlong") :+
          lit(null).cast("double").as("vdouble") :+
          lit(null).cast("boolean").as("vbool") :+
          lit(null).cast("string").as("vstring") :+
          lit(null).cast("binary").as("vbinary"): _*)
      }
    // cloneEmpty keeps bucket parameters: re-wrap a bucketized operand
    g match {
      case BucketedFrame(_, lb, sp, cc) => BucketedFrame(GtsFrame(out), lb, sp, cc)
      case _ => GtsFrame(out)
    }
  }

  /** GTS×GTS bitwise: both LONG (or empty) — tick join, bare result. */
  private def gtsGtsBitwise(opL: (Long, Long) => Long, op1: Any, op2: Any,
      en: WarpScriptEngine, err: String): Any = {
    val fa = en.toFrame(op1).df; val fb = en.toFrame(op2).df
    val ta = gtsType(fa, "bitwise"); val tb = gtsType(fb, "bitwise")
    if (ta.isEmpty || tb.isEmpty) {
      // one side empty: the reference returns an empty GTS
      require(ta.forall(_ == GtsType.LONG) && tb.forall(_ == GtsType.LONG), err)
      return GtsFrame(bareResult(
        fa.select(col("ts")).limit(0), GtsType.LONG,
        lit(null), lit(null), lit(null)))
    }
    require(ta.contains(GtsType.LONG) && tb.contains(GtsType.LONG), err)
    val a = fa.select(col("ts"), col("vlong").as("vlong_a"))
    val b = fb.select(col("ts"), col("vlong").as("vlong_b"))
    val uL = udf(opL)
    mergedBuckets(op1, op2, GtsFrame(bareResult(
      a.join(b, Seq("ts"), "inner"), GtsType.LONG,
      uL(col("vlong_a"), col("vlong_b")), lit(null), lit(null))), en)
  }

  /** LONG GTS below, LONG mask on top: elementwise with metadata and
    * geo kept (BitwiseOperation.java:74-90). */
  private def gtsMaskBitwise(opL: (Long, Long) => Long, op1: Any,
      mask: Long, en: WarpScriptEngine, err: String): Any = {
    val f = en.toFrame(op1).df
    val t = gtsType(f, "bitwise")
    if (t.isEmpty) return GtsFrame(f)
    require(t.contains(GtsType.LONG), err)
    val uL = udf((x: Long) => opL(x, mask))
    val out = f.withColumn("vlong", uL(col("vlong")))
    op1 match {
      case BucketedFrame(_, lb, sp, cc) => BucketedFrame(GtsFrame(out), lb, sp, cc)
      case _ => GtsFrame(out)
    }
  }
}
