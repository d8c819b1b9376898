package graft.script

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Clean-room Python-pickle codec: protocol-2 core opcodes plus the
  * protocol-3 BINBYTES pair for byte arrays (the pickle opcode registry
  * is public, documented in CPython's `Lib/pickletools.py`).
  *
  * Backs the `->PICKLE` / `PICKLE->` words. The reference delegates to
  * the razorvine pickle library (script/functions/TOPICKLE.java:64-67,
  * PICKLETO.java:46-49) and pickles a GTS as a map of
  * classname/labels/attributes/timestamps/values(+locations/elevations)
  * (continuum/gts/GTSPickler.java:52-105); this codec emits/parses the
  * opcodes directly — no external pickle dependency — and the GTS→map
  * shaping lives with the word (WordsExt5), not here.
  *
  * Encoding is deterministic: map keys are emitted in sorted order and
  * no memo opcodes are written (legal pickle — memoization is an
  * optimization for shared/self-referential structure, which WarpScript
  * stack values cannot express).
  */
object PickleCodec {

  // ------------------------------------------------------------ pickling

  def pickle(o: Any): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0x80); out.write(3) // PROTO 3 (BINBYTES needs >=3)
    save(o, out)
    out.write('.') // STOP
    out.toByteArray
  }

  private def save(o: Any, out: ByteArrayOutputStream): Unit = o match {
    case null => out.write('N')
    case b: Boolean => out.write(if (b) 0x88 else 0x89) // NEWTRUE/NEWFALSE
    case i: Int => saveLong(i.toLong, out)
    case l: Long => saveLong(l, out)
    case b: Byte => saveLong(b.toLong, out)
    case s: Short => saveLong(s.toLong, out)
    case f: Float => saveDouble(f.toDouble, out)
    case d: Double => saveDouble(d, out)
    case d: java.math.BigDecimal => saveDouble(d.doubleValue, out)
    case d: BigDecimal => saveDouble(d.doubleValue, out)
    case s: String =>
      val b = s.getBytes(UTF_8)
      out.write('X'); writeLE4(b.length, out); out.write(b, 0, b.length)
    case b: Array[Byte] =>
      if (b.length < 256) { out.write('C'); out.write(b.length) } // SHORT_BINBYTES
      else { out.write('B'); writeLE4(b.length, out) }            // BINBYTES
      out.write(b, 0, b.length)
    case seq: Seq[_] =>
      out.write(']') // EMPTY_LIST
      if (seq.nonEmpty) {
        out.write('(') // MARK
        seq.foreach(save(_, out))
        out.write('e') // APPENDS
      }
    case m: collection.Map[_, _] =>
      out.write('}') // EMPTY_DICT
      if (m.nonEmpty) {
        out.write('(') // MARK
        // sorted keys: deterministic bytes regardless of hash-map order
        m.toSeq.sortBy(_._1.toString).foreach { case (k, v) =>
          save(k, out); save(v, out)
        }
        out.write('u') // SETITEMS
      }
    case other => throw new IllegalArgumentException(
      s"->PICKLE: unpicklable type ${other.getClass.getSimpleName}")
  }

  private def saveLong(l: Long, out: ByteArrayOutputStream): Unit = {
    if (l >= 0 && l <= 0xff) { out.write('K'); out.write(l.toInt) }            // BININT1
    else if (l >= 0 && l <= 0xffff) { out.write('M'); writeLE2(l.toInt, out) } // BININT2
    else if (l >= Int.MinValue && l <= Int.MaxValue) {
      out.write('J'); writeLE4(l.toInt, out)                                   // BININT
    } else {
      // LONG1: minimal little-endian two's complement
      val bytes = collection.mutable.ArrayBuffer.empty[Byte]
      var v = l
      var done = false
      while (!done) {
        bytes += (v & 0xff).toByte
        val signBit = (v & 0x80) != 0
        v >>= 8
        done = (v == 0 && !signBit) || (v == -1 && signBit)
      }
      out.write(0x8a); out.write(bytes.length)
      bytes.foreach(b => out.write(b & 0xff))
    }
  }

  private def saveDouble(d: Double, out: ByteArrayOutputStream): Unit = {
    out.write('G') // BINFLOAT: 8-byte big-endian IEEE-754
    val bits = java.lang.Double.doubleToLongBits(d)
    var i = 56
    while (i >= 0) { out.write(((bits >>> i) & 0xff).toInt); i -= 8 }
  }

  private def writeLE2(v: Int, out: ByteArrayOutputStream): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }

  private def writeLE4(v: Int, out: ByteArrayOutputStream): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  // ---------------------------------------------------------- unpickling

  private object Mark // sentinel pushed by the MARK opcode

  def unpickle(data: Array[Byte]): Any = {
    var pos = 0
    def u1(): Int = { val v = data(pos) & 0xff; pos += 1; v }
    def take(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(data, pos, pos + n); pos += n; a
    }
    def le2(): Int = u1() | (u1() << 8)
    def le4(): Int = u1() | (u1() << 8) | (u1() << 16) | (u1() << 24)
    def le8(): Long = {
      var v = 0L; var i = 0
      while (i < 64) { v |= (u1().toLong << i); i += 8 }; v
    }
    def longFromLE(b: Array[Byte]): Long = {
      if (b.isEmpty) return 0L
      var v = if ((b(b.length - 1) & 0x80) != 0) -1L else 0L
      var i = b.length - 1
      while (i >= 0) { v = (v << 8) | (b(i) & 0xff); i -= 1 }
      v
    }

    val stack = collection.mutable.ArrayBuffer.empty[Any]
    val memo = collection.mutable.HashMap.empty[Int, Any]
    def push(v: Any): Unit = stack += v
    def pop(): Any = { val v = stack.last; stack.dropRightInPlace(1); v }
    def popToMark(): Vector[Any] = {
      val i = stack.lastIndexOf(Mark)
      require(i >= 0, "PICKLE->: no MARK on stack")
      val items = stack.slice(i + 1, stack.length).toVector
      stack.takeInPlace(i)
      items
    }

    while (pos < data.length) {
      (u1(): @annotation.switch) match {
        case 0x80 => u1() // PROTO n
        case 0x95 => pos += 8 // FRAME (protocol 4): length hint, ignorable
        case '.' => return if (stack.isEmpty) null else stack.last // STOP
        case 'N' => push(null)
        case 0x88 => push(true) // NEWTRUE
        case 0x89 => push(false) // NEWFALSE
        case 'K' => push(u1().toLong) // BININT1
        case 'M' => push(le2().toLong) // BININT2
        case 'J' => push(le4().toLong) // BININT (signed)
        case 0x8a => push(longFromLE(take(u1()))) // LONG1
        case 0x8b => push(longFromLE(take(le4()))) // LONG4
        case 'G' => // BINFLOAT big-endian
          var bits = 0L; var i = 0
          while (i < 8) { bits = (bits << 8) | u1(); i += 1 }
          push(java.lang.Double.longBitsToDouble(bits))
        case 'X' => push(new String(take(le4()), UTF_8)) // BINUNICODE
        case 0x8c => push(new String(take(u1()), UTF_8)) // SHORT_BINUNICODE
        case 0x8d => push(new String(take(le8().toInt), UTF_8)) // BINUNICODE8
        case 'B' => push(take(le4())) // BINBYTES
        case 'C' => push(take(u1())) // SHORT_BINBYTES
        case 0x8e => push(take(le8().toInt)) // BINBYTES8
        case ']' => push(Vector.empty[Any]) // EMPTY_LIST
        case '}' => push(Map.empty[Any, Any]) // EMPTY_DICT
        case ')' => push(Vector.empty[Any]) // EMPTY_TUPLE → list (no tuple type)
        case '(' => push(Mark)
        case 'a' => // APPEND
          val v = pop()
          push(pop().asInstanceOf[Vector[Any]] :+ v)
        case 'e' => // APPENDS
          val items = popToMark()
          push(pop().asInstanceOf[Vector[Any]] ++ items)
        case 'l' => push(popToMark()) // LIST
        case 't' => push(popToMark()) // TUPLE → list
        case 0x85 => push(Vector(pop())) // TUPLE1
        case 0x86 => { val b = pop(); val a = pop(); push(Vector(a, b)) }
        case 0x87 => { val c = pop(); val b = pop(); val a = pop(); push(Vector(a, b, c)) }
        case 's' => // SETITEM
          val v = pop(); val k = pop()
          push(pop().asInstanceOf[Map[Any, Any]] + (k -> v))
        case 'u' => // SETITEMS
          val items = popToMark()
          var m = pop().asInstanceOf[Map[Any, Any]]
          items.grouped(2).foreach { kv => m += (kv(0) -> kv(1)) }
          push(m)
        case 'd' => // DICT
          val items = popToMark()
          push(items.grouped(2).map(kv => kv(0) -> kv(1)).toMap)
        case 'q' => memo(u1()) = stack.last // BINPUT
        case 'r' => memo(le4()) = stack.last // LONG_BINPUT
        case 0x94 => memo(memo.size) = stack.last // MEMOIZE
        case 'h' => push(memo(u1())) // BINGET
        case 'j' => push(memo(le4())) // LONG_BINGET
        case '0' => pop() // POP
        case '2' => push(stack.last) // DUP
        case op => throw new IllegalArgumentException(
          f"PICKLE->: unsupported opcode 0x$op%02x at ${pos - 1}")
      }
    }
    throw new IllegalArgumentException("PICKLE->: missing STOP opcode")
  }
}
