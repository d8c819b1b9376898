package graft

import org.apache.spark.sql.functions._
import graft.model.Gts
import graft.multimodal.MultimodalOps
import graft.operators.MetaOps
import graft.sources.{Formats, LineProtocol}

/** META/DELETE/FIND surface, fetch output formats (incl. line-protocol
  * round-trip), multimodal plumbing. */
class SurfaceOpsSpec extends SparkSpec {

  private def pts = gtsOf(
    ("temp.a", "u1", 100L, 1.5), ("temp.a", "u1", 200L, 2.5),
    ("temp.b", "u2", 150L, 3.5), ("hum.a", "u1", 120L, 4.5))

  test("find by selector over metadata") {
    val meta = Gts.metaTable(pts)
    val found = MetaOps.find(meta, "~temp\\..*{}")
    assert(found.count() === 2)
    assert(MetaOps.find(meta, "~.*{user=u1}").count() === 2)
  }

  test("delete by selector + range keeps out-of-range and other series") {
    val meta = Gts.metaTable(pts)
    val kept = MetaOps.deleteBySelector(pts, meta, "temp.a{}", 90L, 150L)
    // temp.a@100 deleted; temp.a@200 out of range kept; others kept
    assert(kept.count() === 3)
    assert(kept.filter(col("class") === "temp.a").count() === 1)
  }

  test("meta attribute upsert with delta-remove semantics") {
    import spark.implicits._
    val meta = Gts.metaTable(pts)
    val someId = meta.filter(col("class") === "temp.a").select("gtsid").head().getLong(0)
    val up1 = Seq((someId, Map("owner" -> "alice", "dc" -> "eu")))
      .toDF("gtsid", "attributes")
    val m1 = MetaOps.setAttributes(meta, up1)
    val got = m1.filter(col("gtsid") === someId)
      .select("attributes").head().getMap[String, String](0)
    assert(got === Map("owner" -> "alice", "dc" -> "eu"))
    // empty value removes the key (fn/META.java delta mode)
    val up2 = Seq((someId, Map("owner" -> ""))).toDF("gtsid", "attributes")
    val m2 = MetaOps.setAttributes(m1, up2)
    val got2 = m2.filter(col("gtsid") === someId)
      .select("attributes").head().getMap[String, String](0)
    assert(got2 === Map("dc" -> "eu"))
  }

  test("gts line format round-trips through the parser") {
    val lines = Formats.toGtsLines(pts)
    val back = LineProtocol.ingest(lines, 0L)
    assert(back.count() === 4)
    val orig = pts.select("class", "ts", "vdouble").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val rt = back.select("class", "ts", "vdouble").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rt === orig)
  }

  test("tsv/json/fulltsv formats project without loss of points") {
    assert(Formats.toTsv(pts).count() === 4)
    assert(Formats.toFullTsv(pts).columns.toSeq ===
      Seq("class", "labels", "ts", "lat", "lon", "elev", "value"))
    val j = Formats.toJsonRows(pts).head().getString(0)
    assert(j.contains("\"c\":\"") && j.contains("\"t\":"))
  }

  test("multimodal: features, resize, frame sampling plumbing") {
    import spark.implicits._
    val docs = Seq((1L, "hello world", "s"), (2L, "a" * 100, "s"))
      .toDF("doc_id", "text", "source")
    val media = MultimodalOps.mediaFromDocuments(docs)
    assert(media.schema("media").dataType.typeName === "binary")
    val feats = MultimodalOps.extractFeatures(media).collect()
    assert(feats.length === 2)
    val f1 = feats.find(_.getLong(0) == 1L).get
    assert(f1.getLong(4) === 11L) // n_bytes of "hello world"
    assert(f1.getInt(1) >= 0 && f1.getInt(1) < 640)
    val rs = MultimodalOps.resize(media, 8, 4).collect()
    assert(rs.forall(_.getAs[Array[Byte]]("media").length <= 32))
    val frames = MultimodalOps.sampleFrames(media, 10, 2)
      .filter(col("media_id") === 2L).collect()
    assert(frames.length === 5) // 100 bytes / 10 per frame, stride 2
  }
}
