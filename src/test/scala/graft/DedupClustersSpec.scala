package graft

import org.apache.spark.sql.functions._

import graft.text.DedupClusters

class DedupClustersSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toSeq.toDF("src", "dst")
  }

  private def clusters(pairs: (Long, Long)*): Map[Long, Long] =
    DedupClusters.connectedComponents(edges(pairs: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star graph collapses to the hub's min id") {
    val cc = clusters(5L -> 1L, 5L -> 2L, 5L -> 3L)
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("chain propagates the min label across the full diameter") {
    // 9-8, 8-7, ..., 2-1: diameter 8 forces multiple propagation rounds
    val cc = clusters((1L to 8L).map(i => (i + 1) -> i): _*)
    assert(cc == (1L to 9L).map(_ -> 1L).toMap)
  }

  test("disjoint components keep separate min labels") {
    val cc = clusters(2L -> 4L, 10L -> 20L, 20L -> 30L)
    assert(cc == Map(2L -> 2L, 4L -> 2L, 10L -> 10L, 20L -> 10L, 30L -> 10L))
  }

  test("clusterSummary drops singleton components") {
    val cc = DedupClusters.connectedComponents(edges(1L -> 2L, 1L -> 3L, 7L -> 8L))
    val sizes = DedupClusters.clusterSummary(cc)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(1L -> 3L, 7L -> 2L))
  }
  test("random graphs: labels match a reference union-find (50 cases)") {
    val rnd = new scala.util.Random(42)
    for (case_ <- 1 to 50) {
      val n = 2 + rnd.nextInt(25)
      val m = 1 + rnd.nextInt(40)
      val es = Seq.fill(m) {
        val a = rnd.nextInt(n).toLong; var b = rnd.nextInt(n).toLong
        if (a == b) b = (b + 1) % n
        if (a < b) (a, b) else (b, a)
      }.distinct
      // reference: union-find over the same edges
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = es.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
      // min-reachable id == union-find root when unions keep the min
      val got = clusters(es: _*)
      assert(got == expected, s"case $case_ edges=$es")
    }
  }

}
