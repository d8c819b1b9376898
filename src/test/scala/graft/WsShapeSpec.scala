package graft

import graft.script.{WarpScriptEngine, WsShape}

/** PloadShape/Pshape/PshapeMode/Psize: the SVG-subset shape loader and
  * its placement modes, probed with exact pixels (AA off). */
class WsShapeSpec extends SparkSpec {

  private def eng = new WarpScriptEngine(
    fetch = (_, _, _, _) => throw new UnsupportedOperationException,
    nowTs = 0L, session = Some(spark))

  private def run1(p: String): Any = eng.run(p).head

  // double-quoted XML attrs: the program embeds this in a '…' literal
  private val svgRect =
    "<svg width=\"10\" height=\"10\">" +
      "<rect x=\"2\" y=\"2\" width=\"6\" height=\"6\" fill=\"#ff0000\"/></svg>"

  test("SVG parse: elements, styles, inheritance, transforms") {
    val sh = WsShape.fromSvg(
      """<svg width="20" height="10">
        |<g fill="blue" transform="translate(10,0)">
        |  <rect x="0" y="0" width="5" height="5"/>
        |  <circle cx="2" cy="2" r="2" fill="none" stroke="red" stroke-width="2"/>
        |</g>
        |<path d="M 1 1 L 4 1 L 4 4 Z" fill="#0f0"/>
        |</svg>""".stripMargin)
    assert(sh.width == 20.0 && sh.height == 10.0)
    assert(sh.nodes.length == 3)
    val Seq(rect, circ, tri) = sh.nodes.toSeq
    assert(rect.fill.contains(0xff0000ff)) // inherited blue
    assert(rect.stroke.isEmpty) // SVG default: no stroke
    assert(circ.fill.isEmpty && circ.stroke.contains(0xffff0000))
    assert(circ.strokeWidth == 2.0)
    assert(tri.fill.contains(0xff00ff00)) // #0f0 shorthand
    // the group translate moved the rect to x∈[10,15]
    val b = rect.shape.getBounds2D
    assert(b.getMinX == 10.0 && b.getMaxX == 15.0)
  }

  test("SVG path arcs: a full circle via two A segments covers its center") {
    val sh = WsShape.fromSvg(
      "<svg width='20' height='20'><path fill='black' " +
        "d='M 10 2 A 8 8 0 1 1 10 18 A 8 8 0 1 1 10 2 Z'/></svg>")
    val area = new java.awt.geom.Area(sh.nodes.head.shape)
    assert(area.contains(10.0, 10.0))
    assert(!area.contains(1.0, 1.0))
    // arc endpoints land exactly on the path
    val b = sh.nodes.head.shape.getBounds2D
    assert(math.abs(b.getMinY - 2.0) < 1e-6 && math.abs(b.getMaxY - 18.0) < 1e-6)
  }

  test("viewBox scales user space onto the declared size") {
    val sh = WsShape.fromSvg(
      "<svg width='100' height='100' viewBox='0 0 10 10'>" +
        "<rect x='1' y='1' width='2' height='2'/></svg>")
    val b = sh.nodes.head.shape.getBounds2D
    assert(b.getMinX == 10.0 && b.getWidth == 20.0)
  }

  test("Pshape draws at position, fits into box, honors PshapeMode") {
    // natural placement at (5, 5): the rect interior lands at (8, 8)
    val px = run1(s"""20 20 '2D' PGraphics 0 0 0 Pbackground
      |'$svgRect' PloadShape 5 5 Pshape 8 8 Pget""".stripMargin)
    assert(px == 0xffff0000L)
    // fit into (0,0,20,20): the 2..8 square scales to 4..16
    val px2 = run1(s"""20 20 '2D' PGraphics 0 0 0 Pbackground
      |'$svgRect' PloadShape 0 0 20 20 Pshape 10 10 Pget""".stripMargin)
    assert(px2 == 0xffff0000L)
    val px3 = run1(s"""20 20 '2D' PGraphics 0 0 0 Pbackground
      |'$svgRect' PloadShape 0 0 20 20 Pshape 2 2 Pget""".stripMargin)
    assert(px3 == 0xff000000L) // outside the scaled rect
    // CENTER mode: (10,10,10,10) box centers the shape at (10,10)
    val px4 = run1(s"""20 20 '2D' PGraphics 0 0 0 Pbackground
      |'CENTER' PshapeMode '$svgRect' PloadShape 10 10 10 10 Pshape
      |10 10 Pget""".stripMargin)
    assert(px4 == 0xffff0000L)
  }

  test("path data with a stray number after Z errors instead of looping") {
    val ex = intercept[IllegalArgumentException](
      WsShape.fromSvg("<svg width=\"10\" height=\"10\">" +
        "<path d=\"M 0 0 L 5 5 Z 3\"/></svg>"))
    assert(ex.getMessage.contains("unexpected number"))
  }

  test("Psize pushes width then height; 3D words still fail loud") {
    val e = eng
    val st = e.run("17 11 '2D' PGraphics Psize")
    assert(st.take(2) == List(11L, 17L)) // top = height
    val ex = intercept[Exception](e.run("10 10 '2D' PGraphics 5 Pbox"))
    assert(ex.getMessage.contains("2D"))
  }
}
