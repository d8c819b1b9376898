package graft

import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps

/** Perceptual-hash near-dup (m09): the engine computes the hash from
  * REAL decoded PNG bytes; these tests replay it straight from the
  * pixel formula (no codec), so a match proves the whole
  * encode→decode→sample→DCT chain is content-faithful. */
class PHashSpec extends SparkSpec {

  /** From-scratch replay: pixel formula → NN 32×32 → gray → integer
    * DCT → lower-median threshold. Shares no code with the engine. */
  private def replayHash(id: Long, flip: Boolean): Long = {
    val w = 16 + (id % 32).toInt
    val h = 16 + ((7 * id) % 32).toInt
    def gray(x32: Int, y32: Int): Long = {
      val x = x32 * w / 32
      val y = y32 * h / 32
      val s0 = id * 131071L + x * 31L + y * 977L + 7L
      val v = ((s0 * s0 * 2654435761L + s0) & 0xFFFFFFL).toInt
      val b = (v & 0xFF) ^ (if (flip) 4 else 0)
      ((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + b
    }
    val cq = Array.tabulate(8, 32)((u, x) =>
      math.floor(math.cos(math.Pi * (2 * x + 1) * u / 64.0) * 16384.0 + 0.5)
        .toLong)
    val coef = for (u <- 0 until 8; v <- 0 until 8) yield
      (for (y <- 0 until 32; x <- 0 until 32)
        yield gray(x, y) * cq(u)(x) * cq(v)(y)).sum
    val med = coef.sorted.apply(31)
    coef.zipWithIndex.foldLeft(0L) { case (acc, (c, i)) =>
      if (c > med) acc | (1L << i) else acc }
  }

  private def docs(ids: Long*) = {
    import spark.implicits._
    ids.map(i => (i, s"text$i")).toDF("doc_id", "text")
  }

  test("pHash64 over real codec bytes equals the formula replay") {
    val ids = Seq(0L, 3L, 17L, 40L, 111L)
    val got = MultimodalOps.pHash64(
        MultimodalOps.pngMediaFromDocuments(docs(ids: _*)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(got(id) == replayHash(id, flip = false), s"id $id")
    }
  }

  test("clones flip few bits; unrelated images differ widely") {
    val ids = (0L until 40L)
    val media = MultimodalOps.pngMediaFromDocuments(docs(ids: _*))
      .unionByName(MultimodalOps.pngMediaClones(docs(ids: _*), 10, 1000L))
    val got = MultimodalOps.pHash64(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // clone hashes are codec-faithful, and the perturbation produces
    // BOTH exact matches and genuine nonzero-hamming near-dups (ids
    // pinned from the full integer replay: 0/10 → 2 bits, 20/30 → 0)
    Seq(0L, 10L, 20L, 30L).foreach { id =>
      assert(got(id + 1000L) == replayHash(id, flip = true))
    }
    assert(ham(got(0L), got(1000L)) == 2)
    assert(ham(got(10L), got(1010L)) == 2)
    assert(ham(got(20L), got(1020L)) == 0)
    assert(ham(got(30L), got(1030L)) == 0)
    // id 130's clone sits at hamming 4 — just past the radius, the
    // boundary case the banded join must consistently drop
    assert(java.lang.Long.bitCount(
      replayHash(130L, flip = false) ^ replayHash(130L, flip = true)) == 4)
    // distinct base images are far apart (the nonlinear pattern works)
    val dists = for (a <- ids; b <- ids if a < b)
      yield ham(got(a), got(b))
    assert(dists.min > 3, s"base images collide: min hamming ${dists.min}")
  }
}
