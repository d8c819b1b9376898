package graft

import org.apache.spark.sql.functions._

import graft.sources.IlpConverter

class IlpSpec extends SparkSpec {

  test("ILP line maps each field to measurement.field{tags} (ILPTO.java)") {
    val pts = IlpConverter.parseLine(
      "cpu,host=h1,region=eu usage=0.64,count=42i,ok=t,note=\"hi there\" 1700000000123456789",
      0L)
    assert(pts.length === 4)
    val byCls = pts.map(p => p.cls -> p).toMap
    assert(byCls("cpu.usage").vdouble === Some(0.64))
    assert(byCls("cpu.count").vlong === Some(42L))
    assert(byCls("cpu.ok").vbool === Some(true))
    assert(byCls("cpu.note").vstring === Some("hi there"))
    assert(pts.forall(_.labels === Map("host" -> "h1", "region" -> "eu")))
    assert(pts.forall(_.ts === 1700000000123456L)) // ns → µs
  }

  test("escapes and missing timestamp") {
    val pts = IlpConverter.parseLine(
      """disk\ io,path=/var\,log free=1i""", 999L)
    assert(pts.head.cls === "disk io.free")
    assert(pts.head.labels === Map("path" -> "/var,log"))
    assert(pts.head.ts === 999L)
  }

  test("distributed ILP ingest produces canonical GTS rows") {
    import spark.implicits._
    val lines = Seq(
      "cpu,host=a usage=0.5 1700000000000000000",
      "cpu,host=b usage=0.7,temp=55i 1700000001000000000",
      "garbage line without fields",
      "mem,host=a used=12.5 1700000002000000000").toDF("value")
    val out = IlpConverter.ingest(lines, 0L)
    assert(out.count() === 4) // 1 + 2 + 0 + 1 fields
    assert(out.select("class").distinct().count() === 3) // cpu.usage, cpu.temp, mem.used
    assert(out.filter(col("vlong") === 55L).count() === 1)
    assert(out.schema.fieldNames.toSeq === graft.model.Gts.columns)
  }
}
