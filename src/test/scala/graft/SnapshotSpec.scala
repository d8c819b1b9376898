package graft

import org.apache.spark.sql.functions._

import graft.sources.{GtsCodec, Snapshot}
import graft.operators.SeasonalOps

/** SNAPSHOT literal rendering + classical decomposition laws. */
class SnapshotSpec extends SparkSpec {

  test("scalar literals render per the reference grammar") {
    assert(Snapshot.render(null) == "NULL ")
    assert(Snapshot.render(42L) == "42 ")
    assert(Snapshot.render(1.5) == "1.5 ")
    assert(Snapshot.render(true) == "true " && Snapshot.render(false) == "false ")
    assert(Snapshot.render("a b/c") == "'a%20b%2Fc' ")
  }

  test("collections recurse with list/map delimiters") {
    assert(Snapshot.render(Seq(1L, 2L)) == "[ 1 2 ] ")
    assert(Snapshot.render(Map("k" -> 1L)) == "{ 'k' 1 } ")
    assert(Snapshot.render(Seq(Seq("x"))) == "[ [ 'x' ] ] ")
  }

  test("GTS snapshot is an UNWRAP statement whose blob round-trips") {
    val pts = gtsOf(("m", "u", 10L, 1.5), ("m", "u", 20L, 2.5))
    val snap = Snapshot.gtsSnapshots(pts).select("snapshot").head().getString(0)
    assert(snap.startsWith("'") && snap.endsWith("' UNWRAP "))
    val b64 = snap.stripPrefix("'").stripSuffix("' UNWRAP ")
    val blob = java.util.Base64.getDecoder.decode(b64)
    val decoded = GtsCodec.decode(blob)
    assert(decoded.map(p => (p.ts, p.vdouble.get)).sortBy(_._1) ==
      Seq((10L, 1.5), (20L, 2.5)))
  }

  test("long-series snapshot re-parses through the distributed g73 path") {
    // 500 points → multi-KB blob, forcing any MIME chunking of base64
    val pts = gtsOf((0 until 500).map(i => ("m", "u", i * 10L, i * 1.5)): _*)
    val snaps = Snapshot.gtsSnapshots(pts)
    val parsed = snaps.select(col("class"), col("labels"),
      unbase64(translate(regexp_extract(col("snapshot"),
        "(?s)^'([A-Za-z0-9+/=\\s]*)' UNWRAP $", 1), "\r\n", "")).as("blob"))
    val back = GtsCodec.unwrap(parsed).select("ts", "vdouble").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(back.toSeq == (0 until 500).map(i => (i * 10L, i * 1.5)))
  }

  test("codec decode fails fast on truncated or garbage blobs") {
    intercept[IllegalArgumentException](GtsCodec.decode(Array[Byte]()))
    intercept[IllegalArgumentException](
      GtsCodec.decode(Array.fill[Byte](8)(0x80.toByte)))
  }

  test("classical decomposition: linear ramp has zero seasonal and residual") {
    val pts = (0 until 40).map(i => ("m", "u", i * 10L, i.toDouble))
    val out = SeasonalOps.classicalDecompose(gtsOf(pts: _*), 10L, 4, 2)
      .select(col("ts"), col("vdouble"), col("trend"), col("seasonal"), col("resid"))
      .collect()
    assert(out.length == 40 - 4) // 2 edge rows dropped each side
    out.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(1)) < 1e-9) // trend = v
      assert(math.abs(r.getDouble(3)) < 1e-9)
      assert(math.abs(r.getDouble(4)) < 1e-9)
    }
  }

  test("classical decomposition recovers a pure periodic signal") {
    // period 5, trend window 5 (halfTrend 2): MA of a zero-mean periodic
    // signal is exactly 0, so seasonal = signal, resid = 0
    val cyc = Seq(2.0, -1.0, 3.0, -4.0, 0.0)
    val pts = (0 until 50).map(i => ("m", "u", i * 10L, cyc(i % 5)))
    val out = SeasonalOps.classicalDecompose(gtsOf(pts: _*), 10L, 5, 2)
      .select(col("ts"), col("vdouble"), col("trend"), col("seasonal"), col("resid"))
      .collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(2)) < 1e-9)                 // trend 0
      assert(math.abs(r.getDouble(3) - r.getDouble(1)) < 1e-9) // seasonal = v
      assert(math.abs(r.getDouble(4)) < 1e-9)                  // resid 0
    }
  }
}
