package graft.script

/** Third extension registry: quaternion words (fn/TOQUATERNION.java
  * family — packed 4x16-bit unit quaternions on the stack, reusing
  * [[graft.functions.Quaternions]] which carries the exact pack
  * arithmetic in driver/Column/SQL twin forms).
  */
private[script] object WordsExt3 {
  import WarpScriptEngine._
  import graft.functions.Quaternions

  def eval(w: String, st: State, en: WarpScriptEngine): Boolean = {
    w match {
      // ---- quaternions (fn/TOQUATERNION.java:97-111 packing) ----
      // w x y z ->Q : normalize, quantize each component to 16 bits
      case "->Q" =>
        val z = st.popNum(); val y = st.popNum()
        val x = st.popNum(); val q = st.popNum()
        st.push(Quaternions.toQuaternion(q, x, y, z))
      // Q-> : unpack to w x y z doubles (QUATERNIONTO.java pushes
      // w, x, y, z in that order so z ends on top)
      case "Q->" =>
        val e = Quaternions.fromQuaternion(st.popLong())
        st.push(e(0)); st.push(e(1)); st.push(e(2)); st.push(e(3))
      case "QCONJUGATE" => st.push(Quaternions.conjugate(st.popLong()))
      // q r QMULTIPLY : Hamilton product, operand order per
      // QMULTIPLY.java:54-57 (r popped first)
      case "QMULTIPLY" =>
        val r = st.popLong(); val q = st.popLong()
        st.push(Quaternions.multiply(q, r))
      case "QDIVIDE" =>
        val r = st.popLong(); val q = st.popLong()
        st.push(Quaternions.divide(q, r))
      // x y z q QROTATE : rotate the vector, push x' y' z'
      // (QROTATE.java:35-62)
      case "QROTATE" =>
        val q = st.popLong()
        val z = st.popNum(); val y = st.popNum(); val x = st.popNum()
        val (a, b, c) = Quaternions.rotate(x, y, z, q)
        st.push(a); st.push(b); st.push(c)
      // q QROTATION : axis x y z + angle in degrees
      // (QROTATION.java:35-63)
      case "QROTATION" =>
        val (x, y, z, angle) = Quaternions.rotation(st.popLong())
        st.push(x); st.push(y); st.push(z); st.push(angle)
      // x y z angle ROTATIONQ : axis+angle (degrees) → quaternion
      // (ROTATIONQ.java:34-90: normalize axis, half-angle cos/sin)
      case "ROTATIONQ" =>
        val angle = st.popNum()
        val z0 = st.popNum(); val y0 = st.popNum(); val x0 = st.popNum()
        val norm = math.sqrt(x0 * x0 + y0 * y0 + z0 * z0)
        val (x, y, z) =
          if (norm != 0.0) (x0 / norm, y0 / norm, z0 / norm) else (x0, y0, z0)
        val cos = math.cos(math.toRadians(angle / 2.0))
        val sin = math.sin(math.toRadians(angle / 2.0))
        st.push(Quaternions.toQuaternion(cos, x * sin, y * sin, z * sin))

      // ---- HULLSHAPE (fn/shape/HULLSHAPE.java): the smallest tensor
      // shape able to contain a ragged nested list — element i is the
      // largest list size at nesting depth i
      case "HULLSHAPE" =>
        st.push(hullShape(st.pop() match {
          case v: Vector[Any @unchecked] => v
          case o => throw new IllegalArgumentException(s"HULLSHAPE expects a LIST, got $o")
        }))

      case _ => return false
    }
    true
  }

  private def hullShape(list: Vector[Any]): Vector[Long] = {
    val nested = list.collect { case v: Vector[Any @unchecked] => hullShape(v) }
    val hull = nested.foldLeft(Vector.empty[Long]) { (a, b) =>
      val (s, t) = if (a.length < b.length) (a, b) else (b, a)
      s.zip(t).map { case (x, y) => math.max(x, y) } ++ t.drop(s.length)
    }
    list.length.toLong +: hull
  }
}
