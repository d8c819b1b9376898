package graft

import graft.model.GtsType
import graft.sources.{LineProtocol, Selector}
import graft.functions.GeoFunctions

/** FIXTURES.md §2/§3 parser cases, pinned to GTSHelper.parse:2876-3193
  * and MetadataSelectorMatcher.java:42-110 semantics. */
class LineProtocolSpec extends SparkSpec {
  import LineProtocol._

  private val NOW = 1700000000000000L

  test("full line with labels, double value") {
    val (p, _) = parseLine(None,
      "1440000000000000// temp.sensor{room=kitchen,building=A} 22.5", NOW)
    assert(p.cls === "temp.sensor")
    assert(p.labels === Map("room" -> "kitchen", "building" -> "A"))
    assert(p.ts === 1440000000000000L)
    assert(p.vtype === GtsType.DOUBLE && p.vdouble === Some(22.5))
    assert(p.lat.isEmpty && p.elev.isEmpty)
  }

  test("long vs double discrimination (22 vs 22.5)") {
    val (l, _) = parseLine(None, "1// m{} 22", NOW)
    assert(l.vtype === GtsType.LONG && l.vlong === Some(22L))
    val (d, _) = parseLine(None, "1// m{} 22.5", NOW)
    assert(d.vtype === GtsType.DOUBLE && d.vdouble === Some(22.5))
  }

  test("location, elevation, boolean value") {
    val (p, _) = parseLine(None, "1440000000000000/48.0:-4.5/120000 gps.pos{vehicle=v42} true", NOW)
    assert(p.lat === Some(48.0) && p.lon === Some(-4.5))
    assert(p.elev === Some(120000L))
    assert(p.vtype === GtsType.BOOLEAN && p.vbool === Some(true))
    val (t, _) = parseLine(None, "1// m{} T", NOW)
    assert(t.vbool === Some(true))
    val (f, _) = parseLine(None, "1// m{} F", NOW)
    assert(f.vbool === Some(false))
  }

  test("= continuation inherits class+labels (GTSHelper.parse:2882)") {
    val batch = parseBatch(Iterator(
      "1440000000000000// temp.sensor{room=kitchen} 22.5",
      "=1440000001000000// 23.0"), NOW).toList
    assert(batch.length === 2)
    assert(batch(1).cls === "temp.sensor")
    assert(batch(1).labels === Map("room" -> "kitchen"))
    assert(batch(1).vdouble === Some(23.0))
  }

  test("empty ts = now; T-relative ts (GTSHelper.parse:2905)") {
    val (n, _) = parseLine(None, "// m{} 1", NOW)
    assert(n.ts === NOW)
    val (r, _) = parseLine(None, "T-5000000// boot.delta{} -3", NOW)
    assert(r.ts === NOW - 5000000L)
    assert(r.vlong === Some(-3L))
  }

  test("attributes block and URL-encoded string value") {
    val (p, _) = parseLine(None,
      "/48.0:-4.5/ temp.sensor{room=lab}{owner=alice} 'hello%20world'", NOW)
    assert(p.attributes === Map("owner" -> "alice"))
    assert(p.vstring === Some("hello world"))
    assert(p.ts === NOW)
  }

  test("quoted string, b64 and hex binary values") {
    val (q, _) = parseLine(None, "1// note{} \"quoted string\"", NOW)
    assert(q.vstring === Some("quoted string"))
    val (b, _) = parseLine(None, "1// blob{} b64:aGVsbG8=", NOW)
    assert(b.vtype === GtsType.BINARY)
    assert(new String(b.vbinary.get) === "hello")
    val (h, _) = parseLine(None, "1// blob{} hex:68690a", NOW)
    assert(new String(h.vbinary.get) === "hi\n")
  }

  test("maxpast/maxfuture rejection (GTSHelper.parse:2920-2932)") {
    val pts = parseBatch(Iterator(
      "100// m{} 1", "200// m{} 2", "300// m{} 3"),
      NOW, maxpast = Some(150L), maxfuture = Some(250L)).toList
    assert(pts.map(_.ts) === List(200L))
  }

  test("malformed lines are dropped, batch continues") {
    val pts = parseBatch(Iterator(
      "garbage", "1// ok{} 1", "", "# comment", "2// ok{} 2"), NOW).toList
    assert(pts.map(_.vlong.get) === List(1L, 2L))
  }

  test("hhcode round-trips to cell center") {
    val hh = GeoFunctions.toHHCode(48.0, -4.5)
    val (la, lo) = GeoFunctions.fromHHCode(hh)
    assert(math.abs(la - 48.0) < 1e-7)
    assert(math.abs(lo + 4.5) < 1e-7)
    val (p, _) = parseLine(None, s"1/$hh/ m{} 1", NOW)
    assert(math.abs(p.lat.get - 48.0) < 1e-7)
  }

  test("single-request ingest resolves continuations across the payload") {
    import spark.implicits._
    val lines = Seq(
      "1440000000000000// temp.sensor{room=kitchen} 22.5",
      "=1440000001000000// 23.0",
      "1440000002000000// temp.sensor{room=lab} 20.0").toDF("value")
    val out = LineProtocol.ingest(lines, NOW, singleBatch = true)
    assert(out.count() === 3)
    assert(out.select("gtsid").distinct().count() === 2)
    assert(out.schema.fieldNames.toSeq === graft.model.Gts.columns)
  }

  test("default ingest parses splits in parallel under the full-line-per-split contract") {
    import spark.implicits._
    // two splits, each starting with a full line; continuations stay
    // within their split
    val split1 = Seq(
      "1440000000000000// temp.sensor{room=kitchen} 22.5",
      "=1440000001000000// 23.0")
    val split2 = Seq(
      "1440000002000000// temp.sensor{room=lab} 20.0",
      "=1440000003000000// 21.0")
    val lines = spark.sparkContext.makeRDD(Seq(split1, split2), 2)
      .flatMap(identity).toDF("value")
    assert(lines.rdd.getNumPartitions === 2)
    val out = LineProtocol.ingest(lines, NOW) // default: per-split batches
    assert(out.count() === 4)
    assert(out.select("gtsid").distinct().count() === 2)
  }

  // ---- selector fixtures (FIXTURES.md §3) ----

  test("selector parse: exact, regex, mixed, attributes") {
    val s1 = Selector.parse("temp.sensor{room=kitchen}")
    assert(s1.classExact === Some("temp.sensor"))
    assert(s1.labelExact === Map("room" -> "kitchen"))
    val s2 = Selector.parse("~temp\\..*{}")
    assert(s2.classRegex === Some("temp\\..*"))
    val s3 = Selector.parse("temp.sensor{room~kit.*,building=A}")
    assert(s3.labelRegex === Map("room" -> "kit.*"))
    assert(s3.labelExact === Map("building" -> "A"))
    val s4 = Selector.parse("~.*{}")
    assert(s4.classRegex === Some(".*"))
    val s5 = Selector.parse("temp.sensor{room=kitchen}{owner=alice}")
    assert(s5.attrExact === Map("owner" -> "alice"))
  }

  test("selector predicate filters the long table") {
    import spark.implicits._
    val lines = Seq(
      "1// temp.kitchen{room=kitchen} 1",
      "2// temp.lab{room=lab} 2",
      "3// humidity.lab{room=lab} 3").toDF("value")
    val pts = LineProtocol.ingest(lines, NOW)
    assert(pts.filter(Selector.parse("~temp\\..*{}").predicate).count() === 2)
    assert(pts.filter(Selector.parse("~.*{room=lab}").predicate).count() === 2)
    assert(pts.filter(Selector.parse("~.*{room~k.*}").predicate).count() === 1)
  }
}
