package graft.script

import java.awt.{BasicStroke, Color, RenderingHints}
import java.awt.geom.{AffineTransform, Arc2D, Ellipse2D, Line2D, Path2D, Rectangle2D}
import java.awt.image.BufferedImage

/** Clean-room 2D canvas backing the Processing (`P*`) rendering words.
  *
  * The reference delegates to the Processing library's PGraphicsJava2D
  * (script/processing/rendering/PGraphics.java:47-50 and the ~100 P*
  * words under script/processing/); this is an independent
  * implementation of the same drawing model — Processing's publicly
  * documented semantics (processing.org reference): fill+stroke state,
  * CORNER rect mode / CENTER ellipse mode defaults, ARGB color ints,
  * y-down coordinates, radian angles, matrix and style stacks — over
  * `java.awt.Graphics2D` on a `BufferedImage`.
  *
  * Rendering is deliberately antialias-OFF so pixel output is
  * deterministic (the oracle rows probe exact pixels); Processing
  * defaults to smooth(), so outlines differ from the reference at the
  * subpixel level while the geometry semantics match.
  */
final class WsCanvas(val width: Int, val height: Int) {
  WsCanvas.headless()
  require(width > 0 && height > 0, "PGraphics: width/height must be > 0")
  require(width.toLong * height <= WsCanvas.MaxPixels,
    s"PGraphics: ${width}x$height exceeds the ${WsCanvas.MaxPixels}-pixel cap")

  val image = new BufferedImage(width, height, BufferedImage.TYPE_INT_ARGB)
  private val g = image.createGraphics()
  g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
    RenderingHints.VALUE_ANTIALIAS_OFF)
  g.setRenderingHint(RenderingHints.KEY_STROKE_CONTROL,
    RenderingHints.VALUE_STROKE_PURE)

  // ---- style state (Processing defaults: white fill, black stroke)
  var fillColor: Option[Int] = Some(0xffffffff)
  var strokeColor: Option[Int] = Some(0xff000000)
  var strokeW: Double = 1.0
  // PstrokeCap/PstrokeJoin (processing/shape/PstrokeCap.java): AWT
  // defaults match the 1-arg BasicStroke previously used here
  // (CAP_SQUARE, JOIN_MITER); Processing names map SQUARE→butt,
  // PROJECT→square, ROUND→round.
  var strokeCap: Int = BasicStroke.CAP_SQUARE
  var strokeJoin: Int = BasicStroke.JOIN_MITER
  private def strokeObj: BasicStroke =
    new BasicStroke(strokeW.toFloat, strokeCap, strokeJoin)
  var rectMode: String = "CORNER"
  var ellipseMode: String = "CENTER"
  var textSize: Double = 12.0
  private final case class Style(fill: Option[Int], stroke: Option[Int],
    sw: Double, rm: String, em: String, ts: Double, tnt: Option[Int],
    im: String, ct: Double)
  private var styleStack: List[Style] = Nil
  private var matrixStack: List[AffineTransform] = Nil
  // open shape under construction (beginShape/vertex/endShape)
  private var shape: Option[Path2D.Double] = None
  private var shapeStarted = false

  private def awt(argb: Int) = new Color(argb, true)

  // ---- colorMode (processing.org colorMode: RGB or HSB with
  // per-channel ranges; color args scale by their range)
  var colorModeName: String = "RGB"
  var colorMax: (Double, Double, Double, Double) = (255.0, 255.0, 255.0, 255.0)

  /** The color(...) overload ladder under the active mode: gray |
    * gray,a | c1,c2,c3 | c1,c2,c3,a. A 1-arg value with alpha bits set
    * is already a packed ARGB color. */
  def makeColor(args: Seq[Double]): Int = {
    val (m1, m2, m3, mA) = colorMax
    def unit(v: Double, m: Double) = math.max(0.0, math.min(1.0, v / m))
    def c255(v: Double, m: Double) = math.round(unit(v, m) * 255).toInt
    def packed(v: Double): Option[Int] = {
      val l = v.toLong
      if (v == l.toDouble && (l & 0xff000000L) != 0) Some((l & 0xffffffffL).toInt)
      else None
    }
    def tri(c1: Double, c2: Double, c3: Double, a: Int): Int =
      if (colorModeName == "HSB")
        (a << 24) | (Color.HSBtoRGB(unit(c1, m1).toFloat,
          unit(c2, m2).toFloat, unit(c3, m3).toFloat) & 0xffffff)
      else
        (a << 24) | (c255(c1, m1) << 16) | (c255(c2, m2) << 8) | c255(c3, m3)
    args match {
      case Seq(g) => packed(g).getOrElse {
        val v = c255(g, if (colorModeName == "HSB") m3 else m1)
        0xff000000 | (v << 16) | (v << 8) | v
      }
      case Seq(g, a) =>
        val al = c255(a, mA)
        packed(g).map(p => (al << 24) | (p & 0xffffff)).getOrElse {
          val v = c255(g, if (colorModeName == "HSB") m3 else m1)
          (al << 24) | (v << 16) | (v << 8) | v
        }
      case Seq(c1, c2, c3) => tri(c1, c2, c3, 255)
      case Seq(c1, c2, c3, a) => tri(c1, c2, c3, c255(a, mA))
      case other => throw new IllegalArgumentException(s"color args: $other")
    }
  }

  private def doFillStroke(s: java.awt.Shape): Unit = {
    fillColor.foreach { c => g.setColor(awt(c)); g.fill(s) }
    strokeColor.foreach { c =>
      g.setColor(awt(c))
      g.setStroke(strokeObj)
      g.draw(s)
    }
  }

  // Pshape placement mode (processing/shape/PshapeMode.java:47-53)
  var shapeMode: String = "CORNER"

  /** Render a loaded [[WsShape]] under an extra placement transform;
    * every node draws with ITS OWN SVG fill/stroke (Processing
    * PShape's default style mode) and SVG stroke defaults (butt cap,
    * miter join, SVG 1.1 §11.4). */
  def drawWsShape(sh: WsShape, tx: AffineTransform): Unit = {
    val saved = g.getTransform
    val savedStroke = g.getStroke
    g.transform(tx)
    sh.nodes.foreach { n =>
      n.fill.foreach { c => g.setColor(awt(c)); g.fill(n.shape) }
      n.stroke.foreach { c =>
        g.setColor(awt(c))
        g.setStroke(new BasicStroke(n.strokeWidth.toFloat,
          BasicStroke.CAP_BUTT, BasicStroke.JOIN_MITER))
        g.draw(n.shape)
      }
    }
    g.setStroke(savedStroke)
    g.setTransform(saved)
  }

  // -------------------------------------------------------------- color

  def background(argb: Int): Unit = {
    val saved = g.getTransform
    g.setTransform(new AffineTransform())
    g.setComposite(java.awt.AlphaComposite.Src)
    g.setColor(awt(argb))
    g.fillRect(0, 0, width, height)
    g.setComposite(java.awt.AlphaComposite.SrcOver)
    g.setTransform(saved)
  }

  def clear(): Unit = background(0x00000000)

  // -------------------------------------------------------------- shapes

  def point(x: Double, y: Double): Unit =
    strokeColor.foreach { c =>
      g.setColor(awt(c))
      g.setStroke(strokeObj)
      g.draw(new Line2D.Double(x, y, x, y))
    }

  def line(x1: Double, y1: Double, x2: Double, y2: Double): Unit =
    strokeColor.foreach { c =>
      g.setColor(awt(c))
      g.setStroke(strokeObj)
      g.draw(new Line2D.Double(x1, y1, x2, y2))
    }

  /** (x, y, w, h) resolved per the active mode — CORNER (default),
    * CORNERS, CENTER or RADIUS (processing.org rectMode/ellipseMode). */
  private def box(a: Double, b: Double, c: Double, d: Double,
                  mode: String): (Double, Double, Double, Double) =
    mode match {
      case "CORNERS" => (math.min(a, c), math.min(b, d),
        math.abs(c - a), math.abs(d - b))
      case "CENTER" => (a - c / 2, b - d / 2, c, d)
      case "RADIUS" => (a - c, b - d, c * 2, d * 2)
      case _ => (a, b, c, d) // CORNER
    }

  def rect(a: Double, b: Double, c: Double, d: Double): Unit = {
    val (x, y, w, h) = box(a, b, c, d, rectMode)
    doFillStroke(new Rectangle2D.Double(x, y, w, h))
  }

  def ellipse(a: Double, b: Double, c: Double, d: Double): Unit = {
    val (x, y, w, h) = box(a, b, c, d, ellipseMode)
    doFillStroke(new Ellipse2D.Double(x, y, w, h))
  }

  /** Angles in radians, measured clockwise on screen from 3 o'clock
    * (Processing convention with y down); Arc2D wants counterclockwise
    * degrees, hence the sign flips. Modes: OPEN (fill as chord, stroke
    * open), CHORD, PIE. */
  def arc(a: Double, b: Double, c: Double, d: Double,
          start: Double, stop: Double, mode: String = "OPEN"): Unit = {
    val (x, y, w, h) = box(a, b, c, d, ellipseMode)
    val startDeg = -math.toDegrees(start)
    val extentDeg = -math.toDegrees(stop - start)
    val t = mode match {
      case "PIE" => Arc2D.PIE
      case "CHORD" => Arc2D.CHORD
      case _ => Arc2D.OPEN
    }
    val fillType = if (t == Arc2D.OPEN) Arc2D.CHORD else t
    fillColor.foreach { col =>
      g.setColor(awt(col))
      g.fill(new Arc2D.Double(x, y, w, h, startDeg, extentDeg, fillType))
    }
    strokeColor.foreach { col =>
      g.setColor(awt(col))
      g.setStroke(strokeObj)
      g.draw(new Arc2D.Double(x, y, w, h, startDeg, extentDeg, t))
    }
  }

  def triangle(x1: Double, y1: Double, x2: Double, y2: Double,
               x3: Double, y3: Double): Unit =
    polygon(Seq((x1, y1), (x2, y2), (x3, y3)), close = true)

  def quad(x1: Double, y1: Double, x2: Double, y2: Double,
           x3: Double, y3: Double, x4: Double, y4: Double): Unit =
    polygon(Seq((x1, y1), (x2, y2), (x3, y3), (x4, y4)), close = true)

  private def polygon(pts: Seq[(Double, Double)], close: Boolean): Unit = {
    val p = new Path2D.Double(Path2D.WIND_EVEN_ODD)
    p.moveTo(pts.head._1, pts.head._2)
    pts.tail.foreach { case (x, y) => p.lineTo(x, y) }
    if (close) p.closePath()
    doFillStroke(p)
  }

  // ---- beginShape / vertex / endShape (polygon + contours)

  def beginShape(): Unit = {
    shape = Some(new Path2D.Double(Path2D.WIND_EVEN_ODD))
    shapeStarted = false
    curvePts = Nil
  }

  def vertex(x: Double, y: Double): Unit = shape.foreach { p =>
    if (shapeStarted) p.lineTo(x, y) else { p.moveTo(x, y); shapeStarted = true }
  }

  def beginContour(): Unit = { shapeStarted = false }
  def endContour(): Unit = shape.foreach(_.closePath())

  def endShape(close: Boolean): Unit = {
    shape.foreach { p =>
      if (close) p.closePath()
      if (close) doFillStroke(p)
      else { // open shape: fill the implied region, stroke the open path
        fillColor.foreach { c => g.setColor(awt(c)); g.fill(p) }
        strokeColor.foreach { c =>
          g.setColor(awt(c))
          g.setStroke(strokeObj)
          g.draw(p)
        }
      }
    }
    shape = None
  }

  // ---- bezier / curve (Catmull-Rom with Processing's tightness basis)

  var curveTightnessV: Double = 0.0
  private var curvePts: List[(Double, Double)] = Nil

  def bezier(x1: Double, y1: Double, cx1: Double, cy1: Double,
             cx2: Double, cy2: Double, x2: Double, y2: Double): Unit = {
    val p = new Path2D.Double()
    p.moveTo(x1, y1)
    p.curveTo(cx1, cy1, cx2, cy2, x2, y2)
    doFillStroke(p)
  }

  def bezierVertex(cx1: Double, cy1: Double, cx2: Double, cy2: Double,
                   x: Double, y: Double): Unit =
    shape.foreach(_.curveTo(cx1, cy1, cx2, cy2, x, y))

  def quadraticVertex(cx: Double, cy: Double, x: Double, y: Double): Unit =
    shape.foreach(_.quadTo(cx, cy, x, y))

  /** Catmull-Rom segment from p2 to p3 (p1/p4 are neighbors), converted
    * to the equivalent cubic bezier with tangent scale s = (1−tightness)/2
    * (Processing's curve basis): c1 = p2 + s(p3−p1)/3, c2 = p3 − s(p4−p2)/3. */
  private def catmullToBezier(p1: (Double, Double), p2: (Double, Double),
      p3: (Double, Double), p4: (Double, Double)): (Double, Double, Double, Double) = {
    val s = (1.0 - curveTightnessV) / 2.0
    (p2._1 + s * (p3._1 - p1._1) / 3.0, p2._2 + s * (p3._2 - p1._2) / 3.0,
     p3._1 - s * (p4._1 - p2._1) / 3.0, p3._2 - s * (p4._2 - p2._2) / 3.0)
  }

  def curve(x1: Double, y1: Double, x2: Double, y2: Double,
            x3: Double, y3: Double, x4: Double, y4: Double): Unit = {
    val (c1x, c1y, c2x, c2y) =
      catmullToBezier((x1, y1), (x2, y2), (x3, y3), (x4, y4))
    val p = new Path2D.Double()
    p.moveTo(x2, y2)
    p.curveTo(c1x, c1y, c2x, c2y, x3, y3)
    doFillStroke(p)
  }

  def curveVertex(x: Double, y: Double): Unit = shape.foreach { p =>
    curvePts = curvePts :+ ((x, y))
    if (curvePts.length >= 4) {
      val Seq(p1, p2, p3, p4) = curvePts.takeRight(4)
      if (!shapeStarted) { p.moveTo(p2._1, p2._2); shapeStarted = true }
      val (c1x, c1y, c2x, c2y) = catmullToBezier(p1, p2, p3, p4)
      p.curveTo(c1x, c1y, c2x, c2y, p3._1, p3._2)
    }
  }

  // ---------------------------------------------------------- transforms

  def translate(dx: Double, dy: Double): Unit = g.translate(dx, dy)
  def rotate(theta: Double): Unit = g.rotate(theta)
  def scale(sx: Double, sy: Double): Unit = g.scale(sx, sy)
  def shearX(a: Double): Unit = g.shear(math.tan(a), 0)
  def shearY(a: Double): Unit = g.shear(0, math.tan(a))
  def pushMatrix(): Unit = matrixStack ::= g.getTransform
  def popMatrix(): Unit = matrixStack match {
    case m :: rest => g.setTransform(m); matrixStack = rest
    case Nil => throw new IllegalStateException("PpopMatrix: empty matrix stack")
  }
  def resetMatrix(): Unit = g.setTransform(new AffineTransform())

  def pushStyle(): Unit = styleStack ::= Style(fillColor, strokeColor,
    strokeW, rectMode, ellipseMode, textSize, tint, imageMode, curveTightnessV)
  def popStyle(): Unit = styleStack match {
    case s :: rest =>
      fillColor = s.fill; strokeColor = s.stroke; strokeW = s.sw
      rectMode = s.rm; ellipseMode = s.em; textSize = s.ts
      tint = s.tnt; imageMode = s.im; curveTightnessV = s.ct
      styleStack = rest
    case Nil => throw new IllegalStateException("PpopStyle: empty style stack")
  }

  // -------------------------------------------------------------- pixels

  def get(x: Int, y: Int): Int =
    if (x < 0 || y < 0 || x >= width || y >= height) 0
    else image.getRGB(x, y)

  def set(x: Int, y: Int, argb: Int): Unit =
    if (x >= 0 && y >= 0 && x < width && y < height) image.setRGB(x, y, argb)

  def pixels(): Vector[Long] = {
    val out = Vector.newBuilder[Long]
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { out += (image.getRGB(x, y).toLong & 0xffffffffL); x += 1 }
      y += 1
    }
    out.result()
  }

  def setPixels(px: Seq[Long]): Unit = {
    require(px.length == width * height,
      s"PupdatePixels: expected ${width * height} pixels, got ${px.length}")
    var i = 0
    px.foreach { p =>
      image.setRGB(i % width, i / width, (p & 0xffffffffL).toInt); i += 1
    }
  }

  /** A detached copy (PtoImage / no-arg Pget), or a sub-rectangle. */
  def copy(x: Int = 0, y: Int = 0, w: Int = -1, h: Int = -1): WsCanvas = {
    val cw = if (w < 0) width else w
    val ch = if (h < 0) height else h
    val out = new WsCanvas(cw, ch)
    var yy = 0
    while (yy < ch) {
      var xx = 0
      while (xx < cw) { out.image.setRGB(xx, yy, get(x + xx, y + yy)); xx += 1 }
      yy += 1
    }
    out
  }

  /** Blit another canvas at (x, y) under the active imageMode,
    * optionally scaled to (w, h) — nearest-neighbor when scaling so
    * pixels stay deterministic; a set tint multiplies each channel. */
  def drawImage(src: WsCanvas, x: Double, y: Double,
                w: Double = -1, h: Double = -1): Unit = {
    val dw = if (w < 0) src.width.toDouble else w
    val dh = if (h < 0) src.height.toDouble else h
    val (bx, by, bw, bh) = box(x, y, dw, dh, imageMode)
    val pixels = tint match {
      case None => src.image
      case Some(t) =>
        val out = new BufferedImage(src.width, src.height,
          BufferedImage.TYPE_INT_ARGB)
        def m(c: Int, f: Int) = c * f / 255
        var yy = 0
        while (yy < src.height) {
          var xx = 0
          while (xx < src.width) {
            val p = src.image.getRGB(xx, yy)
            out.setRGB(xx, yy,
              (m((p >>> 24) & 0xff, (t >>> 24) & 0xff) << 24) |
              (m((p >> 16) & 0xff, (t >> 16) & 0xff) << 16) |
              (m((p >> 8) & 0xff, (t >> 8) & 0xff) << 8) |
              m(p & 0xff, t & 0xff))
            xx += 1
          }
          yy += 1
        }
        out
    }
    val saved = g.getRenderingHint(RenderingHints.KEY_INTERPOLATION)
    g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
      RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
    g.drawImage(pixels, new AffineTransform(
      bw / src.width, 0, 0, bh / src.height, bx, by), null)
    if (saved != null) g.setRenderingHint(RenderingHints.KEY_INTERPOLATION, saved)
  }

  /** Nearest-neighbor resize (Presize). */
  def resized(w: Int, h: Int): WsCanvas = {
    val out = new WsCanvas(w, h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out.image.setRGB(x, y,
          image.getRGB(x * width / w, y * height / h))
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- pixel filters (PImage.filter semantics; GRAY uses the standard
  // fixed-point luma (77r + 151g + 28b) >> 8)

  var tint: Option[Int] = None
  var imageMode: String = "CORNER"

  def filter(kind: String, param: Double): Unit = {
    def each(f: Int => Int): Unit = {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { image.setRGB(x, y, f(image.getRGB(x, y))); x += 1 }
        y += 1
      }
    }
    kind match {
      case "GRAY" => each { p =>
        val lum = (77 * ((p >> 16) & 0xff) + 151 * ((p >> 8) & 0xff) +
          28 * (p & 0xff)) >> 8
        (p & 0xff000000) | (lum << 16) | (lum << 8) | lum
      }
      case "INVERT" => each { p =>
        (p & 0xff000000) | (~p & 0x00ffffff)
      }
      case "OPAQUE" => each(_ | 0xff000000)
      case "THRESHOLD" =>
        val thr = (if (param.isNaN) 0.5 else param) * 255.0
        each { p =>
          val mx = math.max((p >> 16) & 0xff, math.max((p >> 8) & 0xff, p & 0xff))
          if (mx >= thr) (p & 0xff000000) | 0xffffff else p & 0xff000000
        }
      case "POSTERIZE" =>
        val n = param.toInt
        require(n >= 2, "Pfilter POSTERIZE: levels must be >= 2")
        def post(c: Int) = ((c * n) >> 8) * 255 / (n - 1)
        each { p =>
          (p & 0xff000000) | (post((p >> 16) & 0xff) << 16) |
            (post((p >> 8) & 0xff) << 8) | post(p & 0xff)
        }
      case other => throw new UnsupportedOperationException(
        s"Pfilter: kind '$other' not supported (BLUR/ERODE/DILATE omitted)")
    }
  }

  /** Global blend mode (processing/rendering/PblendMode.java: BLEND/
    * ADD/SUBTRACT/DARKEST/LIGHTEST/DIFFERENCE/EXCLUSION/MULTIPLY/
    * SCREEN/REPLACE) — every SUBSEQUENT draw composites with the
    * Processing per-channel formula via a custom java.awt.Composite.
    * The source channel scales by its coverage (src alpha) first, the
    * formula then runs per channel — at full alpha this is exactly the
    * [[blendRegion]] table. */
  def setBlendMode(mode: String): Unit = mode match {
    case "BLEND" => g.setComposite(java.awt.AlphaComposite.SrcOver)
    case "REPLACE" => g.setComposite(java.awt.AlphaComposite.Src)
    case "ADD" | "SUBTRACT" | "DARKEST" | "LIGHTEST" | "DIFFERENCE" |
         "EXCLUSION" | "MULTIPLY" | "SCREEN" =>
      g.setComposite(new WsCanvas.PComposite(mode))
    case other => throw new IllegalArgumentException(
      "PblendMode: invalid mode, should be 'BLEND', 'ADD', 'SUBTRACT', " +
        "'DARKEST', 'LIGHTEST', 'DIFFERENCE', 'EXCLUSION', 'MULTIPLY', " +
        "'SCREEN', or 'REPLACE'. Got '" + other + "'")
  }

  /** Region blend (Pblend): Processing's per-channel blend formulas
    * (publicly documented per mode on processing.org/reference/blend_)
    * over a nearest-neighbor scaled source region. */
  def blendRegion(src: WsCanvas, sx: Int, sy: Int, sw: Int, sh: Int,
                  dx: Int, dy: Int, dw: Int, dh: Int, mode: String): Unit = {
    val snap = src.copy(sx, sy, sw, sh)
    def f(d: Int, s: Int): Int = mode match {
      case "BLEND" => s
      case "ADD" => math.min(d + s, 255)
      case "SUBTRACT" => math.max(d - s, 0)
      case "DARKEST" => math.min(d, s)
      case "LIGHTEST" => math.max(d, s)
      case "DIFFERENCE" => math.abs(d - s)
      case "EXCLUSION" => d + s - 2 * d * s / 255
      case "MULTIPLY" => d * s / 255
      case "SCREEN" => 255 - (255 - d) * (255 - s) / 255
      case "OVERLAY" =>
        if (d < 128) 2 * d * s / 255 else 255 - 2 * (255 - d) * (255 - s) / 255
      case "HARD_LIGHT" =>
        if (s < 128) 2 * d * s / 255 else 255 - 2 * (255 - d) * (255 - s) / 255
      case "DODGE" =>
        if (s == 255) 255 else math.min(255, d * 255 / (255 - s))
      case "BURN" =>
        if (s == 0) 0 else 255 - math.min(255, (255 - d) * 255 / s)
      case other => throw new UnsupportedOperationException(
        s"Pblend: mode '$other' not supported")
    }
    var y = 0
    while (y < dh) {
      var x = 0
      while (x < dw) {
        val s = snap.get(x * sw / dw, y * sh / dh)
        val d = get(dx + x, dy + y)
        set(dx + x, dy + y, (d & 0xff000000) |
          (f((d >> 16) & 0xff, (s >> 16) & 0xff) << 16) |
          (f((d >> 8) & 0xff, (s >> 8) & 0xff) << 8) |
          f(d & 0xff, s & 0xff))
        x += 1
      }
      y += 1
    }
  }

  /** Alpha mask (PImage.mask contract): this image's alpha channel
    * becomes the mask's blue channel; sizes must match. */
  def maskWith(mask: WsCanvas): Unit = {
    require(mask.width == width && mask.height == height,
      "Pmask expects the two images to be of the same size")
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = image.getRGB(x, y)
        image.setRGB(x, y, ((mask.get(x, y) & 0xff) << 24) | (p & 0xffffff))
        x += 1
      }
      y += 1
    }
  }

  /** Region copy (Pcopy): nearest-neighbor from src (or this) into this. */
  def copyRegion(src: WsCanvas, sx: Int, sy: Int, sw: Int, sh: Int,
                 dx: Int, dy: Int, dw: Int, dh: Int): Unit = {
    val snap = // self-copy must read pre-copy pixels
      if (src eq this) src.copy(sx, sy, sw, sh)
      else src.copy(sx, sy, sw, sh)
    var y = 0
    while (y < dh) {
      var x = 0
      while (x < dw) {
        set(dx + x, dy + y, snap.get(x * sw / dw, y * sh / dh))
        x += 1
      }
      y += 1
    }
  }

  // ---------------------------------------------------------- typography

  var textAlignH: String = "LEFT" // LEFT | CENTER | RIGHT
  var textLeadingV: Double = -1 // <0 → 1.25 × textSize (Processing default)
  private var face: java.awt.Font = null

  /** PcreateFont: resolve a logical/system font at a size. */
  def createFont(name: String, size: Double): java.awt.Font =
    new java.awt.Font(name, java.awt.Font.PLAIN, math.round(size).toInt)

  def setFont(f: java.awt.Font): Unit = { face = f; textSize = f.getSize.toDouble }

  private def activeFont: java.awt.Font = {
    val base = if (face != null) face else g.getFont
    base.deriveFont(textSize.toFloat)
  }

  def text(s: String, x: Double, y: Double): Unit =
    fillColor.foreach { c =>
      g.setColor(awt(c))
      g.setFont(activeFont)
      val dx = textAlignH match {
        case "CENTER" => -g.getFontMetrics.stringWidth(s) / 2.0
        case "RIGHT" => -g.getFontMetrics.stringWidth(s).toDouble
        case _ => 0.0
      }
      g.drawString(s, (x + dx).toFloat, y.toFloat)
    }

  def textWidth(s: String): Double = {
    g.setFont(activeFont)
    g.getFontMetrics.stringWidth(s).toDouble
  }

  def textAscent(): Double = {
    g.setFont(activeFont); g.getFontMetrics.getAscent.toDouble
  }

  def textDescent(): Double = {
    g.setFont(activeFont); g.getFontMetrics.getDescent.toDouble
  }

  def textLeading: Double =
    if (textLeadingV >= 0) textLeadingV else textSize * 1.25

  // ---- clipping (Pclip/PnoClip): a rect clip under the active
  // transform; subsequent draws are limited to it
  def clip(x: Double, y: Double, w: Double, h: Double): Unit =
    g.setClip(new Rectangle2D.Double(x, y, w, h))

  def noClip(): Unit = g.setClip(null)

  // ------------------------------------------------------------ encoding

  /** Base64 data URL, the Pencode contract
    * (script/processing/Pencode.java: PNG default). */
  def encode(format: String = "png"): String = {
    val bos = new java.io.ByteArrayOutputStream()
    val img =
      if (format == "png") image
      else { // JPEG: no alpha channel
        val rgb = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
        val gg = rgb.createGraphics(); gg.drawImage(image, 0, 0, null); gg.dispose()
        rgb
      }
    javax.imageio.ImageIO.write(img, format, bos)
    s"data:image/$format;base64," +
      java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
  }
}

object WsCanvas {
  /** Reference default pixel cap (WarpScriptStack ATTRIBUTE_MAX_PIXELS). */
  val MaxPixels: Long = 1000000L

  /** Per-channel blend formulas (processing.org/reference/blend_.html)
    * shared by [[WsCanvas.blendRegion]] and the global-blendMode
    * composite. */
  private[script] def blendChannel(mode: String, d: Int, s: Int): Int =
    mode match {
      case "ADD" => math.min(d + s, 255)
      case "SUBTRACT" => math.max(d - s, 0)
      case "DARKEST" => math.min(d, s)
      case "LIGHTEST" => math.max(d, s)
      case "DIFFERENCE" => math.abs(d - s)
      case "EXCLUSION" => d + s - 2 * d * s / 255
      case "MULTIPLY" => d * s / 255
      case "SCREEN" => 255 - (255 - d) * (255 - s) / 255
      case other => throw new IllegalArgumentException(s"blend mode $other")
    }

  /** java.awt.Composite applying a Processing blend formula per channel
    * for every draw (PblendMode); source channels scale by coverage
    * (src alpha) first, destination alpha is kept. */
  private[script] final class PComposite(mode: String)
      extends java.awt.Composite {
    def createContext(srcCM: java.awt.image.ColorModel,
        dstCM: java.awt.image.ColorModel,
        hints: java.awt.RenderingHints): java.awt.CompositeContext =
      new java.awt.CompositeContext {
        def dispose(): Unit = ()
        def compose(src: java.awt.image.Raster,
            dstIn: java.awt.image.Raster,
            dstOut: java.awt.image.WritableRaster): Unit = {
          val w = math.min(src.getWidth, dstIn.getWidth)
          val h = math.min(src.getHeight, dstIn.getHeight)
          val sp = new Array[Int](4)
          val dp = new Array[Int](4)
          val sb = src.getNumBands
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              src.getPixel(x, y, sp)
              dstIn.getPixel(x, y, dp)
              val sa = if (sb >= 4) sp(3) else 255
              var i = 0
              while (i < 3) {
                val sv = sp(i) * sa / 255
                dp(i) = blendChannel(mode, dp(i), sv)
                i += 1
              }
              dstOut.setPixel(x, y, dp)
              x += 1
            }
            y += 1
          }
        }
      }
  }

  private def headless(): Unit =
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")

  /** Processing color packing: values clamped to 0-255, ARGB int. */
  def color(r: Double, gr: Double, b: Double, a: Double = 255): Int = {
    def c(v: Double) = math.max(0, math.min(255, math.round(v).toInt))
    (c(a) << 24) | (c(r) << 16) | (c(gr) << 8) | c(b)
  }

  /** Decode image bytes (Pdecode) via ImageIO into a canvas. */
  def decode(bytes: Array[Byte]): WsCanvas = {
    headless()
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "Pdecode: unsupported or corrupt image bytes")
    val out = new WsCanvas(img.getWidth, img.getHeight)
    val gg = out.image.createGraphics()
    gg.drawImage(img, 0, 0, null)
    gg.dispose()
    out
  }
}
