package graft

import graft.script.WarpScriptEngine

/** Processing rendering words over the clean-room java.awt canvas
  * (WsCanvas/WordsProcessing): deterministic pixel probes — AA is off,
  * so interior pixels of fills are exact. */
class WsProcessingSpec extends SparkSpec {

  private def eng = new WarpScriptEngine(
    fetch = (_, _, _, _) => throw new UnsupportedOperationException,
    nowTs = 0L, session = Some(spark))

  private def run1(p: String): Any = eng.run(p).head

  test("Pcolor packs ARGB and the channel extractors invert it") {
    val e = eng
    assert(e.run("10 10 '2D' PGraphics 255 0 0 Pcolor").head ==
      0xffff0000L)
    assert(e.run("10 10 '2D' PGraphics 1 2 3 4 Pcolor").head ==
      0x04010203L) // args r=1 g=2 b=3 a=4 -> packed a|r|g|b
    assert(run1("10 10 '2D' PGraphics 128 Pcolor") == 0xff808080L)
    assert(run1("10 10 '2D' PGraphics 255 128 64 32 Pcolor Pred") == 255.0)
    assert(run1("10 10 '2D' PGraphics 255 128 64 32 Pcolor Pgreen") == 128.0)
    assert(run1("10 10 '2D' PGraphics 255 128 64 32 Pcolor Pblue") == 64.0)
    assert(run1("10 10 '2D' PGraphics 255 128 64 32 Pcolor Palpha") == 32.0)
    // lerpColor midpoint of black and white opaque (colors must be
    // stored — an inline chain would feed c1 into Pcolor's gray+alpha
    // overload via the until-canvas argument scan, as in the reference)
    assert(run1("""10 10 '2D' PGraphics 0 Pcolor 'c1' STORE 255 Pcolor
      |'c2' STORE $c1 $c2 0.5 PlerpColor""".stripMargin) == 0xff808080L)
  }

  test("background + rect fill: interior pixels exact, exterior untouched") {
    val px = run1("""40 30 '2D' PGraphics 200 200 200 Pbackground
      |255 0 0 Pfill PnoStroke 10 5 8 6 Prect 12 7 Pget""".stripMargin)
    assert(px == 0xffff0000L)
    val out = run1("""40 30 '2D' PGraphics 200 200 200 Pbackground
      |255 0 0 Pfill PnoStroke 10 5 8 6 Prect 2 2 Pget""".stripMargin)
    assert(out == 0xffc8c8c8L)
  }

  test("rectMode CENTER and matrix push/translate/pop") {
    // CENTER: rect(20,15,10,10) spans x 15..25, y 10..20
    assert(run1("""40 30 '2D' PGraphics 'CENTER' PrectMode
      |0 255 0 Pfill PnoStroke 20 15 10 10 Prect 20 15 Pget""".stripMargin)
      == 0xff00ff00L)
    // translate moves the rect; popMatrix restores
    assert(run1("""40 30 '2D' PGraphics PnoStroke 0 0 255 Pfill
      |PpushMatrix 10 10 Ptranslate 0 0 5 5 Prect PpopMatrix
      |12 12 Pget""".stripMargin) == 0xff0000ffL)
    assert(run1("""40 30 '2D' PGraphics 0 Pbackground PnoStroke
      |0 0 255 Pfill PpushMatrix 10 10 Ptranslate PpopMatrix
      |0 0 5 5 Prect 12 12 Pget""".stripMargin) == 0xff000000L)
  }

  test("triangle and begin/vertex/endShape fill their centroids") {
    assert(run1("""40 40 '2D' PGraphics PnoStroke 255 255 0 Pfill
      |5 5 35 5 20 35 Ptriangle 20 15 Pget""".stripMargin) == 0xffffff00L)
    assert(run1("""40 40 '2D' PGraphics PnoStroke 0 255 255 Pfill
      |PbeginShape 5 5 Pvertex 35 5 Pvertex 35 35 Pvertex 5 35 Pvertex
      |'CLOSE' PendShape 20 20 Pget""".stripMargin) == 0xff00ffffL)
  }

  test("ellipse (CENTER mode default) covers its center") {
    assert(run1("""40 40 '2D' PGraphics 0 Pbackground PnoStroke
      |255 0 255 Pfill 20 20 16 10 Pellipse 20 20 Pget""".stripMargin)
      == 0xffff00ffL)
    assert(run1("""40 40 '2D' PGraphics 0 Pbackground PnoStroke
      |255 0 255 Pfill 20 20 16 10 Pellipse 1 1 Pget""".stripMargin)
      == 0xff000000L)
  }

  test("Pset/Pget roundtrip and Ppixels inventory") {
    assert(run1("10 10 '2D' PGraphics 3 4 0xffdeadbe Pset 3 4 Pget")
      == 0xffdeadbeL)
    val pxs = run1("""4 3 '2D' PGraphics 255 0 0 Pbackground Ppixels""")
      .asInstanceOf[Vector[Any]]
    assert(pxs.length == 12 && pxs.forall(_ == 0xffff0000L))
  }

  test("Pencode emits a PNG data URL that Pdecode round-trips") {
    val url = run1("""8 6 '2D' PGraphics 0 128 255 Pbackground
      |Pencode""".stripMargin).asInstanceOf[String]
    assert(url.startsWith("data:image/png;base64,"))
    // decoded image blitted at (3,3) — probe inside it
    val rt = run1(s"'$url' Pdecode 'img' STORE 20 20 '2D' PGraphics " +
      "0 Pbackground $img 3 3 Pimage 4 4 Pget")
    assert(rt == 0xff0080ffL)
  }

  test("Presize nearest-neighbor keeps solid colors solid") {
    val px = run1("""4 4 '2D' PGraphics 10 200 30 Pbackground PtoImage
      |8 8 Presize 'img' STORE 40 40 '2D' PGraphics
      |$img 0 0 Pimage 7 7 Pget""".stripMargin)
    assert(px == 0xff0ac81eL)
  }

  test("P-math scalars match Processing semantics") {
    val e = eng
    def v(p: String) = e.run(s"10 10 '2D' PGraphics $p").head
    assert(v("5 0 10 Pconstrain") == 5.0)
    assert(v("15 0 10 Pconstrain") == 10.0)
    assert(v("0 0 3 4 Pdist") == 5.0)
    assert(v("0 10 0.25 Plerp") == 2.5)
    assert(v("3 4 Pmag") == 5.0)
    assert(v("5 0 10 0 100 Pmap") == 50.0)
    assert(v("5 0 10 Pnorm") == 0.5)
  }

  test("style stack isolates fill changes") {
    assert(run1("""20 20 '2D' PGraphics PnoStroke 255 0 0 Pfill
      |PpushStyle 0 255 0 Pfill PpopStyle 0 0 10 10 Prect
      |5 5 Pget""".stripMargin) == 0xffff0000L)
  }

  test("bezier/curve scalar words match the closed forms") {
    val e = eng
    def v(p: String) = e.run(s"10 10 '2D' PGraphics $p").head.asInstanceOf[Double]
    // bezierPoint endpoints and midpoint of (0, 30, 70, 100)
    assert(v("0 30 70 100 0.0 PbezierPoint") == 0.0)
    assert(v("0 30 70 100 1.0 PbezierPoint") == 100.0)
    assert(v("0 30 70 100 0.5 PbezierPoint") == 50.0) // symmetric controls
    // tangent at t=0 is 3(b-a)
    assert(v("0 30 70 100 0.0 PbezierTangent") == 90.0)
    // curvePoint hits its segment endpoints (through-points b and c)
    assert(v("0 10 20 30 0.0 PcurvePoint") == 10.0)
    assert(v("0 10 20 30 1.0 PcurvePoint") == 20.0)
    // uniform spacing -> constant tangent s*(c-a)*... = 10 at midpoint
    assert(v("0 10 20 30 0.5 PcurvePoint") == 15.0)
  }

  test("bezier fill covers the region between curve and chord closure") {
    // convex bezier bulging downward from (5,5) to (35,5): interior
    // probe near the chord must be filled
    assert(run1("""40 40 '2D' PGraphics 0 Pbackground PnoStroke
      |255 0 0 Pfill 5 5 15 30 25 30 35 5 Pbezier
      |20 10 Pget""".stripMargin) == 0xffff0000L)
  }

  test("Pfilter INVERT/GRAY/THRESHOLD are exact pixel transforms") {
    assert(run1("""4 4 '2D' PGraphics 10 20 30 Pbackground
      |'INVERT' Pfilter 1 1 Pget""".stripMargin) == 0xfff5ebe1L)
    // GRAY of (100, 150, 200): (77*100+151*150+28*200)>>8 = 35950>>8 = 140
    assert(run1("""4 4 '2D' PGraphics 100 150 200 Pbackground
      |'GRAY' Pfilter 1 1 Pget""".stripMargin) == 0xff8c8c8cL)
    assert(run1("""4 4 '2D' PGraphics 100 150 200 Pbackground
      |'THRESHOLD' Pfilter 1 1 Pget""".stripMargin) == 0xffffffffL)
    assert(run1("""4 4 '2D' PGraphics 100 100 100 Pbackground
      |'THRESHOLD' 0.5 Pfilter 1 1 Pget""".stripMargin) == 0xff000000L)
  }

  test("Ptint halves channels on blit; Pcopy moves a region") {
    val px = run1("""4 4 '2D' PGraphics 200 100 50 Pbackground PtoImage
      |'img' STORE 8 8 '2D' PGraphics 0 Pbackground
      |127 127 127 Ptint $img 0 0 Pimage 2 2 Pget""".stripMargin)
    // 200*127/255=99, 100*127/255=49, 50*127/255=24
    assert(px == 0xff633118L)
    val cp = run1("""8 8 '2D' PGraphics 0 Pbackground
      |255 0 0 Pfill PnoStroke 0 0 2 2 Prect
      |0 0 2 2 6 6 2 2 Pcopy 7 7 Pget""".stripMargin)
    assert(cp == 0xffff0000L)
  }

  test("curveVertex draws through its control points") {
    // 6 curve vertices: segments pass through the middle points;
    // probe a pixel ON the through-point (20,20) with fat stroke
    assert(run1("""40 40 '2D' PGraphics 0 Pbackground PnoFill
      |255 255 255 Pstroke 3 PstrokeWeight PbeginShape
      |5 35 PcurveVertex 5 35 PcurveVertex 20 20 PcurveVertex
      |35 35 PcurveVertex 35 35 PcurveVertex PendShape
      |20 20 Pget""".stripMargin) == 0xffffffffL)
  }

  test("Pblend per-channel formulas are exact") {
    // dst (100,100,100); src region from own canvas after rect:
    // blend a white rect region onto a gray region with MULTIPLY
    val px = run1("""8 8 '2D' PGraphics 100 100 100 Pbackground
      |PnoStroke 255 200 50 Pfill 0 0 4 4 Prect
      |0 0 4 4 4 4 4 4 'MULTIPLY' Pblend 5 5 Pget""".stripMargin)
    // (100*255/255, 100*200/255=78, 100*50/255=19)
    assert(px == 0xff644e13L)
    val add = run1("""8 8 '2D' PGraphics 100 100 100 Pbackground
      |PnoStroke 200 200 200 Pfill 0 0 4 4 Prect
      |0 0 4 4 4 4 4 4 'ADD' Pblend 5 5 Pget""".stripMargin)
    assert(add == 0xffffffffL) // 100+200 clamps to 255
  }

  test("Pmask takes alpha from the mask's blue channel") {
    val a = run1("""4 4 '2D' PGraphics 255 0 0 Pbackground PtoImage
      |'img' STORE 4 4 '2D' PGraphics 0 0 99 Pbackground PtoImage
      |'m' STORE $img $m Pmask Pencode Pdecode 'rt' STORE
      |8 8 '2D' PGraphics $rt 0 0 Pimage 1 1 Pget Palpha""".stripMargin)
    // PNG round-trip preserves the masked alpha = 99... but the blit
    // composites; probe the decoded image alpha via Pget on a canvas
    // that started transparent: src-over of a=99 red on a=0 -> a=99
    assert(a == 99.0)
  }

  test("PcolorMode HSB and scaled RGB ranges") {
    // HSB 0,255,255 -> pure red
    assert(run1("""10 10 '2D' PGraphics 'HSB' PcolorMode
      |0 255 255 Pcolor""".stripMargin) == 0xffff0000L)
    // HSB hue=1/3 max=1.0 -> green
    assert(run1("""10 10 '2D' PGraphics 'HSB' 1.0 PcolorMode
      |0.33333333333333337 1.0 1.0 Pcolor""".stripMargin) == 0xff00ff00L)
    // RGB with max 100: 100,0,0 -> red
    assert(run1("""10 10 '2D' PGraphics 'RGB' 100 PcolorMode
      |100 0 0 Pcolor""".stripMargin) == 0xffff0000L)
  }

  test("Pclip restricts draws; PnoClip lifts it") {
    val px = run1("""20 20 '2D' PGraphics 0 Pbackground PnoStroke
      |255 0 0 Pfill 0 0 5 5 Pclip 0 0 20 20 Prect
      |PnoClip 10 10 Pget""".stripMargin)
    assert(px == 0xff000000L) // outside the clip: untouched
    val in = run1("""20 20 '2D' PGraphics 0 Pbackground PnoStroke
      |255 0 0 Pfill 0 0 5 5 Pclip 0 0 20 20 Prect
      |PnoClip 2 2 Pget""".stripMargin)
    assert(in == 0xffff0000L)
  }

  test("text metrics and fonts are live values") {
    val e = eng
    val asc = e.run("40 20 '2D' PGraphics 12 PtextSize PtextAscent")
      .head.asInstanceOf[Double]
    assert(asc > 0)
    val wA = e.run("40 20 '2D' PGraphics 'Mono' 10 PcreateFont 'f' STORE " +
      "$f PtextFont 'abc' PtextWidth").head.asInstanceOf[Double]
    assert(wA > 0)
    assert(e.run("40 20 '2D' PGraphics 10 PtextSize PtextLeading")
      .head == 12.5)
  }

  test("CALL round-trips through a real subprocess") {
    val dir = java.nio.file.Files.createTempDirectory("graft-call-")
    val script = dir.resolve("upper.sh")
    java.nio.file.Files.writeString(script,
      "#!/bin/sh\necho 1\nwhile read line; do echo \"OK%20$line\"; done\n")
    script.toFile.setExecutable(true)
    System.setProperty("graft.call.directory", dir.toString)
    try {
      val out = eng.run("'hello' 'upper.sh' CALL")
      // we send URL-encoded 'hello'; script replies OK%20hello →
      // decoded 'OK hello'
      assert(out.head == "OK hello")
      // second call reuses the SAME live process
      assert(eng.run("'two' 'upper.sh' CALL 'one' 'upper.sh' CALL")
        .reverse == List("OK two", "OK one"))
    } finally System.clearProperty("graft.call.directory")
  }

  test("CALL surfaces subprogram errors (space-prefixed line)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-call-")
    val script = dir.resolve("fail.sh")
    java.nio.file.Files.writeString(script,
      "#!/bin/sh\necho 1\nwhile read line; do echo \" boom%21\"; done\n")
    script.toFile.setExecutable(true)
    System.setProperty("graft.call.directory", dir.toString)
    try {
      val ex = intercept[Exception](eng.run("'x' 'fail.sh' CALL"))
      assert(ex.getMessage.contains("boom!"))
    } finally System.clearProperty("graft.call.directory")
  }

  test("3D surface and unimplemented words fail loud") {
    intercept[Exception](run1("10 10 '3D' PGraphics"))
    intercept[Exception](run1("10 10 '2D' PGraphics 1 2 3 PbezierVertex"))
  }

  test("PblendMode: global composite applies the Processing formulas " +
    "to subsequent draws (rendering/PblendMode.java)") {
    // 100-gray background; ADD a 100-red rect: interior = (200,100,100)
    val add = run1("""20 20 '2D' PGraphics 100 100 100 Pbackground
      |'ADD' PblendMode 100 0 0 Pfill PnoStroke 5 5 10 10 Prect
      |8 8 Pget""".stripMargin)
    assert(add == 0xffc86464L, f"ADD got ${add.asInstanceOf[Long]}%x")
    // MULTIPLY a 128-gray rect over 200-gray: 200*128/255 = 100
    val mul = run1("""20 20 '2D' PGraphics 200 200 200 Pbackground
      |'MULTIPLY' PblendMode 128 Pfill PnoStroke 5 5 10 10 Prect
      |8 8 Pget""".stripMargin)
    assert(mul == 0xff646464L, f"MULTIPLY got ${mul.asInstanceOf[Long]}%x")
    // SUBTRACT then back to BLEND: the second rect paints over
    val back = run1("""20 20 '2D' PGraphics 200 200 200 Pbackground
      |'SUBTRACT' PblendMode 50 50 50 Pfill PnoStroke 0 0 20 20 Prect
      |'BLEND' PblendMode 10 20 30 Pfill 5 5 10 10 Prect
      |8 8 Pget""".stripMargin)
    assert(back == 0xff0a141eL, f"BLEND-restore got ${back.asInstanceOf[Long]}%x")
    // outside the second rect the SUBTRACT result remains: 200-50=150
    val sub = run1("""20 20 '2D' PGraphics 200 200 200 Pbackground
      |'SUBTRACT' PblendMode 50 50 50 Pfill PnoStroke 0 0 20 20 Prect
      |1 1 Pget""".stripMargin)
    assert(sub == 0xff969696L, f"SUBTRACT got ${sub.asInstanceOf[Long]}%x")
    intercept[Exception](run1(
      "10 10 '2D' PGraphics 'NOPE' PblendMode"))
  }
}
