package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.propBoolean

import graft.functions.GeoFunctions
import graft.operators.GtsFrame
import graft.operators.GtsFrame._

/** Round-6 algebraic laws for the aggregator-variant surface:
  * Column-vs-scalar equivalence of the new codegen'd geo expressions
  * (hhcodeCol ≡ toHHCode bit-for-bit; loxodromicCol ≡ the scalar
  * rhumb-line kernel), null-variant REDUCE containment/counting laws,
  * and entropy range bounds. Spark-backed properties run one batched
  * DataFrame evaluation per law (not per sample). */
class PropertySpec3 extends SparkSpec {

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val genLat = Gen.chooseNum(-90.0, 90.0)
  private val genLon = Gen.chooseNum(-180.0, 180.0)

  test("hhcodeCol equals the scalar toHHCode bit-for-bit (batched)") {
    val s = spark
    val samples = (for {
      lat <- Gen.listOfN(300, genLat).sample.get
      } yield lat).zip(Gen.listOfN(300, genLon).sample.get) ++
      // corner cases the generator may miss
      Seq((-90.0, -180.0), (90.0, 180.0), (0.0, 0.0), (-90.0, 179.999999),
        (89.999999, -0.000001))
    val df = s.createDataFrame(samples).toDF("lat", "lon")
      .withColumn("hh", GeoFunctions.hhcodeCol(col("lat"), col("lon")))
    val rows = df.collect()
    rows.foreach { r =>
      val expect = GeoFunctions.toHHCode(r.getDouble(0), r.getDouble(1))
      assert(r.getLong(2) == expect,
        s"hhcode mismatch at (${r.getDouble(0)}, ${r.getDouble(1)})")
    }
  }

  test("loxodromicCol equals the scalar rhumb kernel to 1e-9 relative (batched)") {
    val lats = Gen.listOfN(300, genLat).sample.get
    val lons = Gen.listOfN(300, genLon).sample.get
    val pairs = lats.zip(lons).sliding(2).collect {
      case Seq((la1, lo1), (la2, lo2)) => (la1, lo1, la2, lo2)
    }.toSeq ++ Seq(
      (0.0, 0.0, 0.0, 0.0),        // identical points
      (-90.0, 0.0, 0.0, 10.0),     // south pole start (try_divide path)
      (0.0, 10.0, -90.0, 0.0),     // south pole end (log(0) path)
      (10.0, 179.0, 10.0, -179.0)) // date-line wrap
    val df = spark.createDataFrame(pairs).toDF("la1", "lo1", "la2", "lo2")
      .withColumn("d", GtsFrame.loxodromicCol(col("la1"), col("lo1"),
        col("la2"), col("lo2")))
    df.collect().foreach { r =>
      val (la1, lo1, la2, lo2) =
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val expect = scalarLoxo(la1, lo1, la2, lo2)
      val got = r.getDouble(4)
      val tol = math.max(1e-4, math.abs(expect) * 1e-9)
      assert(math.abs(got - expect) <= tol,
        s"rhumb mismatch at ($la1,$lo1)->($la2,$lo2): $got vs $expect")
    }
  }

  /** Scalar twin with the reference's IEEE limit behavior (WordsExt4.
    * loxodromic is private; this re-derivation matches its ops and
    * extends the pole limits the Column version encodes). */
  private def scalarLoxo(lat1: Double, lon1: Double,
      lat2: Double, lon2: Double): Double = {
    val toRad = math.Pi / 180.0
    val phi1 = lat1 * toRad; val phi2 = lat2 * toRad
    val dphi = phi2 - phi1
    val ratio = math.tan(math.Pi / 4 + phi2 / 2) / math.tan(math.Pi / 4 + phi1 / 2)
    val dpsi = math.log(ratio)
    val q =
      if (ratio.isInfinite || ratio == 0.0 || dpsi.isInfinite) 0.0
      else if (math.abs(dpsi) > 1e-12) dphi / dpsi
      else math.cos(phi1)
    var dlon = (lon2 - lon1) * toRad
    if (math.abs(dlon) > math.Pi)
      dlon = if (dlon > 0) dlon - 2 * math.Pi else dlon + 2 * math.Pi
    6378137.0 * math.sqrt(dphi * dphi + q * q * dlon * dlon)
  }

  test("REDUCE null-variant laws: forbid ⊆ exclude; counting identities") {
    val s = spark
    // random sparse two-series alignment
    val genPts = Gen.listOfN(40, Gen.zip(
      Gen.chooseNum(1L, 12L), Gen.oneOf("a", "b"), Gen.chooseNum(-5.0, 5.0)))
    check(Prop.forAll(genPts) { pts =>
      val rows = pts.distinctBy(p => (p._1, p._2)).map { case (t, h, v) =>
        ("m", Map("u" -> "1", "h" -> h), 0L, t,
          Option.empty[Double], Option.empty[Double], Option.empty[Long], v)
      }
      rows.nonEmpty ==> {
        val df = s.createDataFrame(rows).toDF(
          "class", "labels", "gtsid", "ts", "lat", "lon", "elev", "v")
          .withColumn("vdouble", col("v")).drop("v")
          .withColumn("gtsid", xxhash64(col("class"),
            col("labels").getItem("h")))
        val f = GtsFrame(df)
        val nSeries = pts.map(_._2).distinct.size
        val excl = f.reduce(Sum, Seq("u")).collect()
          .map(r => r.getLong(1) -> r.getDouble(2)).toMap
        val forb = f.reduce(Sum, Seq("u"), forbidNulls = true).collect()
          .map(r => r.getLong(1) -> r.getDouble(2)).toMap
        val cnt = f.reduce(CountAgg, Seq("u"), includeNullsCount = true)
          .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
        val present = pts.distinctBy(p => (p._1, p._2))
          .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
        // forbid ticks = exactly those with every series present
        forb.keySet == present.filter(_._2 == nSeries).keySet &&
          // forbid values agree with exclude on surviving ticks
          forb.forall { case (t, v) => excl(t) == v } &&
          // include-nulls count is the partition's series count everywhere
          cnt.values.forall(_ == nSeries.toLong) &&
          cnt.keySet == excl.keySet
      }
    }, n = 12) // each sample runs 3 Spark jobs
  }

  test("entropy is in [0,1] and hits the extremes") {
    val s = spark
    import s.implicits._
    def entropyOf(vals: Seq[Double]): Double = {
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("ts", "vdouble")
      df.agg(GtsFrame.Entropy(false).column(col("vdouble"), col("ts"))).head().getDouble(0)
    }
    assert(entropyOf(Seq(5.0)) == 0.0)                 // single symbol
    assert(math.abs(entropyOf(Seq(3.0, 3.0)) - 1.0) < 1e-12) // uniform = max
    val h = entropyOf(Seq(1.0, 2.0, 3.0, 10.0))
    assert(h > 0.0 && h < 1.0)
  }
}
