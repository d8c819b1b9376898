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
  var rectMode: String = "CORNER"
  var ellipseMode: String = "CENTER"
  var textSize: Double = 12.0
  private var styleStack: List[(Option[Int], Option[Int], Double, String, String, Double)] = Nil
  private var matrixStack: List[AffineTransform] = Nil
  // open shape under construction (beginShape/vertex/endShape)
  private var shape: Option[Path2D.Double] = None
  private var shapeStarted = false

  private def awt(argb: Int) = new Color(argb, true)

  private def doFillStroke(s: java.awt.Shape): Unit = {
    fillColor.foreach { c => g.setColor(awt(c)); g.fill(s) }
    strokeColor.foreach { c =>
      g.setColor(awt(c))
      g.setStroke(new BasicStroke(strokeW.toFloat))
      g.draw(s)
    }
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
      g.setStroke(new BasicStroke(strokeW.toFloat))
      g.draw(new Line2D.Double(x, y, x, y))
    }

  def line(x1: Double, y1: Double, x2: Double, y2: Double): Unit =
    strokeColor.foreach { c =>
      g.setColor(awt(c))
      g.setStroke(new BasicStroke(strokeW.toFloat))
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
      g.setStroke(new BasicStroke(strokeW.toFloat))
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
          g.setStroke(new BasicStroke(strokeW.toFloat))
          g.draw(p)
        }
      }
    }
    shape = None
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

  def pushStyle(): Unit = styleStack ::=
    ((fillColor, strokeColor, strokeW, rectMode, ellipseMode, textSize))
  def popStyle(): Unit = styleStack match {
    case (f, s, w, rm, em, ts) :: rest =>
      fillColor = f; strokeColor = s; strokeW = w
      rectMode = rm; ellipseMode = em; textSize = ts
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

  /** Blit another canvas at (x, y), optionally scaled to (w, h) —
    * nearest-neighbor when scaling so pixels stay deterministic. */
  def drawImage(src: WsCanvas, x: Double, y: Double,
                w: Double = -1, h: Double = -1): Unit = {
    val dw = if (w < 0) src.width.toDouble else w
    val dh = if (h < 0) src.height.toDouble else h
    val saved = g.getRenderingHint(RenderingHints.KEY_INTERPOLATION)
    g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
      RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
    g.drawImage(src.image, new AffineTransform(
      dw / src.width, 0, 0, dh / src.height, x, y), null)
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

  // ---------------------------------------------------------- typography

  def text(s: String, x: Double, y: Double): Unit =
    fillColor.foreach { c =>
      g.setColor(awt(c))
      g.setFont(g.getFont.deriveFont(textSize.toFloat))
      g.drawString(s, x.toFloat, y.toFloat)
    }

  def textWidth(s: String): Double = {
    g.setFont(g.getFont.deriveFont(textSize.toFloat))
    g.getFontMetrics.stringWidth(s).toDouble
  }

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
