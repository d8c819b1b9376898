package graft

import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps

/** Real-WAV audio feature path: the payloads must be valid RIFF/WAVE
  * streams and the decoded per-frame aggregates must equal the sample
  * formula computed directly (never through the codec). */
class MultimodalAudioSpec extends SparkSpec {

  private def docs(n: Int) = {
    val s = spark
    import s.implicits._
    (0L until n.toLong).toDF("doc_id")
  }

  private def formula(id: Long): Array[Int] = {
    val k = (id % 7 + 1).toInt
    val n = (800 + (id % 5) * 160).toInt
    Array.tabulate(n)(i => (((i + 1).toLong * k) % 2048 - 1024).toInt)
  }

  test("wavMediaFromDocuments emits valid RIFF/WAVE 16-bit mono PCM") {
    val rows = MultimodalOps.wavMediaFromDocuments(docs(3)).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val b = r.getAs[Array[Byte]]("media")
      assert(new String(b.take(4), "US-ASCII") == "RIFF")
      assert(new String(b.slice(8, 12), "US-ASCII") == "WAVE")
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      val fmt = in.getFormat
      assert(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        fmt.getSampleRate == 16000f)
      in.close()
    }
  }

  test("audioFeatures equals the sample formula computed codec-free") {
    val out = MultimodalOps.audioFeatures(
        MultimodalOps.wavMediaFromDocuments(docs(10)), 160)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for (id <- 0L until 10L) {
      val xs = formula(id)
      val frames = xs.grouped(160).toArray
      assert(out.count(_._1._1 == id) == frames.length)
      frames.zipWithIndex.foreach { case (f, fi) =>
        val sumsq = f.map(x => x.toLong * x).sum
        val zc = f.sliding(2).count(p => p.length == 2 && p(0) * p(1) < 0)
        assert(out((id, fi)) == ((f.length.toLong, sumsq, zc.toLong)),
          s"id=$id frame=$fi")
      }
    }
  }

  test("frame cadence: doc 0 gets 5 frames of 160, doc 4 gets 9") {
    val out = MultimodalOps.audioFeatures(
        MultimodalOps.wavMediaFromDocuments(docs(5)), 160)
      .groupBy(col("media_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 5L && out(4L) == 9L)
  }
}
