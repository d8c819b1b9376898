package graft.script

import java.awt.geom.{AffineTransform, Ellipse2D, Line2D, Path2D, Rectangle2D, RoundRectangle2D}

import scala.collection.mutable

/** A loaded 2D vector shape (reference `PloadShape`,
  * script/processing/shape/PloadShape.java:39-55: pops an SVG XML
  * STRING and builds Processing's `PShapeJava2D`). This is an
  * independent parser of the same documented SVG subset Processing
  * renders in 2D — rect / circle / ellipse / line / polygon / polyline
  * / path (M L H V C S Q T A Z and relative forms) / nested `g`
  * groups with inherited presentation attributes and `transform`
  * lists — flattened at load time into device-space AWT geometry with
  * each node carrying its own fill/stroke (Processing PShape's
  * default style mode).
  */
final case class WsShape(nodes: Vector[WsShape.Node],
                         width: Double, height: Double)

object WsShape {

  /** One drawable leaf: geometry + the SVG styles it renders with. */
  final case class Node(shape: java.awt.Shape, fill: Option[Int],
                        stroke: Option[Int], strokeWidth: Double)

  private final case class Style(fill: Option[Int], stroke: Option[Int],
                                 strokeWidth: Double, opacity: Double)

  def fromSvg(xml: String): WsShape = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(false)
    // the string came off the stack, not the network: no external entities
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder()
      .parse(new org.xml.sax.InputSource(new java.io.StringReader(xml)))
    val root = doc.getDocumentElement
    require(root.getTagName == "svg", s"not an SVG document: <${root.getTagName}>")

    val viewBox = Option(root.getAttribute("viewBox")).filter(_.nonEmpty)
      .map(_.trim.split("[\\s,]+").map(_.toDouble))
    val wAttr = num(root.getAttribute("width"))
    val hAttr = num(root.getAttribute("height"))
    val (w, h) = (viewBox, wAttr, hAttr) match {
      case (_, Some(wv), Some(hv)) => (wv, hv)
      case (Some(Array(_, _, vw, vh)), _, _) => (vw, vh)
      case _ => (100.0, 100.0)
    }
    // map the viewBox user space onto the declared width/height
    val rootTx = new AffineTransform()
    viewBox.foreach { case Array(minx, miny, vw, vh) =>
      rootTx.scale(w / vw, h / vh)
      rootTx.translate(-minx, -miny)
    }

    val out = Vector.newBuilder[Node]
    // SVG initial values: fill=black, stroke=none, stroke-width=1
    walk(root, Style(Some(0xff000000), None, 1.0, 1.0), rootTx, out)
    WsShape(out.result(), w, h)
  }

  // ------------------------------------------------------------ traversal

  private def walk(e: org.w3c.dom.Element, inherited: Style,
                   tx: AffineTransform,
                   out: mutable.Builder[Node, Vector[Node]]): Unit = {
    val style = styleOf(e, inherited)
    val myTx = new AffineTransform(tx)
    Option(e.getAttribute("transform")).filter(_.nonEmpty)
      .foreach(t => myTx.concatenate(parseTransform(t)))

    def emit(s: java.awt.Shape): Unit =
      out += Node(myTx.createTransformedShape(s),
        style.fill.map(applyOpacity(_, style.opacity)),
        style.stroke.map(applyOpacity(_, style.opacity)),
        style.strokeWidth * scaleOf(myTx))

    def a(name: String, dflt: Double = 0.0): Double =
      num(e.getAttribute(name)).getOrElse(dflt)

    e.getTagName match {
      case "svg" | "g" =>
        val kids = e.getChildNodes
        var i = 0
        while (i < kids.getLength) {
          kids.item(i) match {
            case k: org.w3c.dom.Element => walk(k, style, myTx, out)
            case _ => ()
          }
          i += 1
        }
      case "rect" =>
        val (rx, ry) = (a("rx"), a("ry"))
        if (rx > 0 || ry > 0) {
          val r1 = if (rx > 0) rx else ry
          val r2 = if (ry > 0) ry else rx
          emit(new RoundRectangle2D.Double(
            a("x"), a("y"), a("width"), a("height"), 2 * r1, 2 * r2))
        } else emit(new Rectangle2D.Double(a("x"), a("y"), a("width"), a("height")))
      case "circle" =>
        val r = a("r")
        emit(new Ellipse2D.Double(a("cx") - r, a("cy") - r, 2 * r, 2 * r))
      case "ellipse" =>
        val (rx, ry) = (a("rx"), a("ry"))
        emit(new Ellipse2D.Double(a("cx") - rx, a("cy") - ry, 2 * rx, 2 * ry))
      case "line" =>
        emit(new Line2D.Double(a("x1"), a("y1"), a("x2"), a("y2")))
      case "polygon" | "polyline" =>
        val pts = Option(e.getAttribute("points")).getOrElse("")
          .trim.split("[\\s,]+").filter(_.nonEmpty).map(_.toDouble)
        if (pts.length >= 4) {
          val p = new Path2D.Double()
          p.moveTo(pts(0), pts(1))
          var i = 2
          while (i + 1 < pts.length) { p.lineTo(pts(i), pts(i + 1)); i += 2 }
          if (e.getTagName == "polygon") p.closePath()
          emit(p)
        }
      case "path" =>
        Option(e.getAttribute("d")).filter(_.nonEmpty)
          .foreach(d => emit(parsePath(d)))
      case _ => () // defs/title/desc/metadata/unsupported: skipped
    }
  }

  /** Uniform scale factor of a transform (geometric mean of the axes) —
    * how a scalar stroke-width maps through it. */
  private def scaleOf(t: AffineTransform): Double =
    math.sqrt(math.abs(t.getDeterminant))

  // ------------------------------------------------------------ styles

  private def styleOf(e: org.w3c.dom.Element, inh: Style): Style = {
    val css: Map[String, String] =
      Option(e.getAttribute("style")).filter(_.nonEmpty)
        .map(_.split(";").flatMap { kv =>
          val i = kv.indexOf(':')
          if (i < 0) None else Some(kv.substring(0, i).trim -> kv.substring(i + 1).trim)
        }.toMap).getOrElse(Map.empty)
    def attr(name: String): Option[String] =
      css.get(name).orElse(Option(e.getAttribute(name)).filter(_.nonEmpty))
    def paint(name: String, dflt: Option[Int]): Option[Int] =
      attr(name) match {
        case None => dflt
        case Some("none") => None
        case Some(v) => Some(parseColor(v))
      }
    val fillA = num2(attr("fill-opacity")).getOrElse(1.0)
    val strokeA = num2(attr("stroke-opacity")).getOrElse(1.0)
    Style(
      paint("fill", inh.fill).map(applyOpacity(_, fillA)),
      paint("stroke", inh.stroke).map(applyOpacity(_, strokeA)),
      num2(attr("stroke-width")).getOrElse(inh.strokeWidth),
      inh.opacity * num2(attr("opacity")).getOrElse(1.0))
  }

  private def applyOpacity(argb: Int, o: Double): Int =
    if (o >= 1.0) argb
    else {
      val a = math.round(((argb >>> 24) & 0xff) * math.max(0.0, o)).toInt
      (a << 24) | (argb & 0xffffff)
    }

  private val NamedColors = Map(
    "black" -> 0x000000, "white" -> 0xffffff, "red" -> 0xff0000,
    "green" -> 0x008000, "blue" -> 0x0000ff, "yellow" -> 0xffff00,
    "cyan" -> 0x00ffff, "magenta" -> 0xff00ff, "gray" -> 0x808080,
    "grey" -> 0x808080, "orange" -> 0xffa500, "purple" -> 0x800080,
    "brown" -> 0xa52a2a, "pink" -> 0xffc0cb, "lime" -> 0x00ff00,
    "navy" -> 0x000080, "teal" -> 0x008080, "silver" -> 0xc0c0c0,
    "maroon" -> 0x800000, "olive" -> 0x808000, "aqua" -> 0x00ffff,
    "fuchsia" -> 0xff00ff)

  private def parseColor(s: String): Int = {
    val v = s.trim.toLowerCase
    if (v.startsWith("#") && v.length == 4) {
      val Array(r, g, b) = v.drop(1).toArray.map(c => Integer.parseInt(s"$c$c", 16))
      0xff000000 | (r << 16) | (g << 8) | b
    } else if (v.startsWith("#") && v.length == 7)
      0xff000000 | Integer.parseInt(v.drop(1), 16)
    else if (v.startsWith("rgb(") && v.endsWith(")")) {
      val Array(r, g, b) = v.substring(4, v.length - 1).split(",").map(_.trim.toInt)
      0xff000000 | (r << 16) | (g << 8) | b
    } else NamedColors.get(v).map(0xff000000 | _).getOrElse(
      throw new IllegalArgumentException(s"unsupported SVG color '$s'"))
  }

  private def num(s: String): Option[Double] =
    Option(s).map(_.trim).filter(_.nonEmpty)
      .map(v => v.replaceAll("(px|pt|mm|cm|in)$", "").toDouble)

  private def num2(s: Option[String]): Option[Double] = s.flatMap(v => num(v))

  // ------------------------------------------------------------ transform

  private val TxCall = "([a-zA-Z]+)\\s*\\(([^)]*)\\)".r

  private def parseTransform(t: String): AffineTransform = {
    val out = new AffineTransform()
    TxCall.findAllMatchIn(t).foreach { m =>
      val args = m.group(2).split("[\\s,]+").filter(_.nonEmpty).map(_.toDouble)
      m.group(1) match {
        case "translate" => out.translate(args(0), if (args.length > 1) args(1) else 0.0)
        case "scale" => out.scale(args(0), if (args.length > 1) args(1) else args(0))
        case "rotate" =>
          if (args.length >= 3)
            out.rotate(math.toRadians(args(0)), args(1), args(2))
          else out.rotate(math.toRadians(args(0)))
        case "skewX" => out.shear(math.tan(math.toRadians(args(0))), 0.0)
        case "skewY" => out.shear(0.0, math.tan(math.toRadians(args(0))))
        case "matrix" => out.concatenate(new AffineTransform(
          args(0), args(1), args(2), args(3), args(4), args(5)))
        case other => throw new IllegalArgumentException(
          s"unsupported SVG transform '$other'")
      }
    }
    out
  }

  // ------------------------------------------------------------ path data

  private val PathTok = "[MmLlHhVvCcSsQqTtAaZz]|[-+]?(?:\\d*\\.\\d+|\\d+\\.?)(?:[eE][-+]?\\d+)?".r

  /** SVG 1.1 §8.3 path grammar over the full command set; arcs are
    * converted endpoint→center (spec appendix F.6.5) and emitted as
    * ≤90° cubic Bézier segments (the standard approximation, error
    * < 0.03% of radius). */
  private def parsePath(d: String): Path2D.Double = {
    val toks = PathTok.findAllIn(d).toVector
    val p = new Path2D.Double()
    var i = 0
    var cx = 0.0; var cy = 0.0 // current point
    var sx = 0.0; var sy = 0.0 // subpath start
    var lastCmd = ' '
    var lcx = 0.0; var lcy = 0.0 // last control point (for S/T)
    def next(): Double = { val v = toks(i).toDouble; i += 1; v }
    while (i < toks.length) {
      val cmd0 = if (toks(i).length == 1 && toks(i).head.isLetter) {
        val c = toks(i).head; i += 1; c
      } else if (lastCmd == 'M') 'L' // implicit lineto after moveto
      else if (lastCmd == 'm') 'l'
      else if (lastCmd == 'Z' || lastCmd == 'z' || lastCmd == ' ')
        // Z consumes no operands: a numeric token here would otherwise
        // repeat closePath forever
        throw new IllegalArgumentException(
          s"path data: unexpected number '${toks(i)}' after '$lastCmd'")
      else lastCmd
      val rel = cmd0.isLower
      val cmd = cmd0.toUpper
      def rx0 = if (rel) cx else 0.0
      def ry0 = if (rel) cy else 0.0
      cmd match {
        case 'M' =>
          cx = next() + rx0; cy = next() + ry0
          p.moveTo(cx, cy); sx = cx; sy = cy
        case 'L' =>
          cx = next() + rx0; cy = next() + ry0; p.lineTo(cx, cy)
        case 'H' => cx = next() + rx0; p.lineTo(cx, cy)
        case 'V' => cy = next() + ry0; p.lineTo(cx, cy)
        case 'C' =>
          val x1 = next() + rx0; val y1 = next() + ry0
          val x2 = next() + rx0; val y2 = next() + ry0
          val x = next() + rx0; val y = next() + ry0
          p.curveTo(x1, y1, x2, y2, x, y)
          lcx = x2; lcy = y2; cx = x; cy = y
        case 'S' =>
          val x1 = if ("CcSs".indexOf(lastCmd) >= 0) 2 * cx - lcx else cx
          val y1 = if ("CcSs".indexOf(lastCmd) >= 0) 2 * cy - lcy else cy
          val x2 = next() + rx0; val y2 = next() + ry0
          val x = next() + rx0; val y = next() + ry0
          p.curveTo(x1, y1, x2, y2, x, y)
          lcx = x2; lcy = y2; cx = x; cy = y
        case 'Q' =>
          val x1 = next() + rx0; val y1 = next() + ry0
          val x = next() + rx0; val y = next() + ry0
          p.quadTo(x1, y1, x, y)
          lcx = x1; lcy = y1; cx = x; cy = y
        case 'T' =>
          val x1 = if ("QqTt".indexOf(lastCmd) >= 0) 2 * cx - lcx else cx
          val y1 = if ("QqTt".indexOf(lastCmd) >= 0) 2 * cy - lcy else cy
          val x = next() + rx0; val y = next() + ry0
          p.quadTo(x1, y1, x, y)
          lcx = x1; lcy = y1; cx = x; cy = y
        case 'A' =>
          val arx = math.abs(next()); val ary = math.abs(next())
          val phi = math.toRadians(next())
          val largeArc = next() != 0.0; val sweep = next() != 0.0
          val x = next() + rx0; val y = next() + ry0
          arcToBeziers(p, cx, cy, arx, ary, phi, largeArc, sweep, x, y)
          cx = x; cy = y
        case 'Z' =>
          p.closePath(); cx = sx; cy = sy
        case other =>
          throw new IllegalArgumentException(s"bad path command '$other'")
      }
      lastCmd = cmd0
    }
    p
  }

  /** Endpoint → center arc parameterization (SVG 1.1 F.6.5) and cubic
    * Bézier emission in ≤π/2 slices. */
  private def arcToBeziers(p: Path2D.Double, x1: Double, y1: Double,
      rx0: Double, ry0: Double, phi: Double, largeArc: Boolean,
      sweep: Boolean, x2: Double, y2: Double): Unit = {
    if (rx0 == 0.0 || ry0 == 0.0 || (x1 == x2 && y1 == y2)) {
      p.lineTo(x2, y2); return
    }
    val (cosP, sinP) = (math.cos(phi), math.sin(phi))
    // F.6.5.1: midpoint in the rotated frame
    val dx2 = (x1 - x2) / 2.0; val dy2 = (y1 - y2) / 2.0
    val x1p = cosP * dx2 + sinP * dy2
    val y1p = -sinP * dx2 + cosP * dy2
    // F.6.6: scale radii up if the endpoints don't fit
    val lam = (x1p * x1p) / (rx0 * rx0) + (y1p * y1p) / (ry0 * ry0)
    val (rx, ry) = if (lam > 1) {
      val s = math.sqrt(lam); (rx0 * s, ry0 * s)
    } else (rx0, ry0)
    // F.6.5.2: center in the rotated frame
    val num = rx * rx * ry * ry - rx * rx * y1p * y1p - ry * ry * x1p * x1p
    val den = rx * rx * y1p * y1p + ry * ry * x1p * x1p
    val co = (if (largeArc != sweep) 1.0 else -1.0) *
      math.sqrt(math.max(0.0, num / den))
    val cxp = co * rx * y1p / ry
    val cyp = -co * ry * x1p / rx
    // F.6.5.3: center in the original frame
    val cx = cosP * cxp - sinP * cyp + (x1 + x2) / 2.0
    val cy = sinP * cxp + cosP * cyp + (y1 + y2) / 2.0
    // F.6.5.5/6: start angle and sweep extent
    def ang(ux: Double, uy: Double, vx: Double, vy: Double): Double = {
      val d = math.sqrt((ux * ux + uy * uy) * (vx * vx + vy * vy))
      val sign = if (ux * vy - uy * vx < 0) -1.0 else 1.0
      sign * math.acos(math.max(-1.0, math.min(1.0, (ux * vx + uy * vy) / d)))
    }
    val th1 = ang(1, 0, (x1p - cxp) / rx, (y1p - cyp) / ry)
    var dth = ang((x1p - cxp) / rx, (y1p - cyp) / ry,
      (-x1p - cxp) / rx, (-y1p - cyp) / ry)
    if (!sweep && dth > 0) dth -= 2 * math.Pi
    if (sweep && dth < 0) dth += 2 * math.Pi
    // emit in ≤π/2 slices, each as one cubic
    val nSeg = math.max(1, math.ceil(math.abs(dth) / (math.Pi / 2)).toInt)
    val delta = dth / nSeg
    val alpha = 4.0 / 3.0 * math.tan(delta / 4.0)
    var th = th1
    var px = x1; var py = y1
    var seg = 0
    while (seg < nSeg) {
      val th2 = th + delta
      def pt(t: Double): (Double, Double) = {
        val ex = rx * math.cos(t); val ey = ry * math.sin(t)
        (cosP * ex - sinP * ey + cx, sinP * ex + cosP * ey + cy)
      }
      def deriv(t: Double): (Double, Double) = {
        val ex = -rx * math.sin(t); val ey = ry * math.cos(t)
        (cosP * ex - sinP * ey, sinP * ex + cosP * ey)
      }
      val (qx, qy) = pt(th2)
      val (d1x, d1y) = deriv(th)
      val (d2x, d2y) = deriv(th2)
      p.curveTo(px + alpha * d1x, py + alpha * d1y,
        qx - alpha * d2x, qy - alpha * d2y, qx, qy)
      px = qx; py = qy; th = th2; seg += 1
    }
  }
}
