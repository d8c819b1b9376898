package graft

import org.apache.spark.sql.functions._

import graft.text.{TextOps, TextOps3}

/** DSIR data selection (t40): independent replay of the hashed-bucket
  * importance weight on a tiny fixture, plus ranking/limit semantics.
  * The DuckDB oracle covers the full corpus; these pin the arithmetic
  * against a from-scratch Scala replay (own hash fold, own ln). */
class DsirSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  /** From-scratch replay: md5-based 60-bit hash, add-1 bucket models,
    * dyadic-quantized ln — shares NO code with the engine path. */
  private def replay(rows: Seq[(Long, String, String)], buckets: Int)
      : Map[Long, Double] = {
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var acc = 0L
      for (i <- 0 until 8) acc = (acc << 8) | (d(i) & 0xFFL)
      acc >>> 4
    }
    def lnq(n: Long): Double =
      math.floor(math.log(n.toDouble) * 1048576.0 + 0.5) / 1048576.0
    val words = rows.flatMap { case (id, t, lang) =>
      t.split(" ").map(w => (id, lang == "en", (h60(w) % buckets).toInt)) }
    val nr = words.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nt = words.filter(_._2).groupBy(_._3).view
      .mapValues(_.size.toLong).toMap
    val totr = words.size.toLong
    val tott = words.count(_._2).toLong
    val lr = nr.keys.map { b =>
      b -> (lnq(nt.getOrElse(b, 0L) + 1) - lnq(tott + buckets)
        - lnq(nr(b) + 1) + lnq(totr + buckets))
    }.toMap
    words.groupBy(_._1).view.mapValues { ws =>
      val s = ws.groupBy(_._3).map { case (b, g) => g.size * lr(b) }.sum
      math.BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }.toMap
  }

  test("dsirSelect matches an independent replay of the weight") {
    val rows = Seq(
      (0L, "alpha beta gamma alpha", "en"),
      (1L, "alpha beta beta", "en"),
      (2L, "delta epsilon zeta", "fr"),
      (3L, "alpha beta gamma", "fr"),   // looks like the target
      (4L, "delta delta epsilon", "de") // looks away from it
    )
    val exp = replay(rows, 64)
    val got = TextOps3.dsirSelect(docs(rows: _*), col("lang") === "en",
        64, 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (id, s) => assert(s == exp(id), s"doc $id") }
    // the target-shaped non-target doc outranks the target-averse one
    assert(got(3L) > got(4L))
  }

  test("dsirSelect keeps exactly k rows with a deterministic cut") {
    val rows = (0L until 20L).map(i =>
      (i, if (i < 10) "alpha beta" else "delta epsilon",
        if (i < 5) "en" else "fr"))
    val got = TextOps3.dsirSelect(docs(rows: _*), col("lang") === "en",
      64, 12).collect()
    assert(got.length == 12)
    // ties broken by doc_id: the 10 alpha-beta docs all tie at the top
    // score, then the two smallest delta-epsilon ids fill the cut
    val ids = got.map(_.getAs[Long]("doc_id")).toSet
    assert((0L until 10L).forall(ids.contains) &&
      ids.contains(10L) && ids.contains(11L))
  }

  test("dsirSelect plan: B-row model broadcast back, top-k as TakeOrdered") {
    val rows = (0L until 30L).map(i => (i, s"w$i alpha", "en"))
    val df = TextOps3.dsirSelect(docs(rows: _*), col("lang") === "en",
      64, 5)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), "global sort leaked")
    assert(p.contains("BroadcastHashJoin"), "lr join not broadcast")
    assert(!p.contains("CartesianProduct"))
  }
}
