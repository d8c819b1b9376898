package graft

import graft.text.{EmbeddingLSH, IvfIndex}

/** SemDeDup (cluster-scoped embedding near-dup pruning): planted
  * near-dup triple co-clusters, the greedy keep-farthest-from-centroid
  * rule drops exactly the two prototypical members; orthogonal
  * singleton cells are untouched. */
class SemDeDupSpec extends SparkSpec {

  private def vec(parts: (Int, Float)*): Seq[Float] = {
    val a = Array.fill(EmbeddingLSH.Dims)(0.0f)
    parts.foreach { case (i, x) => a(i) = x }
    a.toSeq
  }

  private def fixture = {
    val s = spark
    import s.implicits._
    // seeds 0..7: vec 0 on axis 0, vecs 1..7 on axes 1..7 (pairwise
    // cos 0 — below any τ); 8 and 9 are near-copies of 0 (cos ≈ 1)
    val rows = (0L, vec(0 -> 1.0f)) +:
      (1 to 7).map(i => (i.toLong, vec(i -> 1.0f))) :+
      (8L, vec(0 -> 0.99f, 8 -> 0.05f)) :+
      (9L, vec(0 -> 0.98f, 9 -> 0.08f))
    rows.toDF("vec_id", "embedding")
  }

  test("drops exactly the two lower-priority members of the planted triple") {
    val dropped = IvfIndex.semDeDup(fixture, 49L, 400L).collect()
      .map(r => r.getLong(0)).toSet
    assert(dropped.size == 2)
    assert(dropped.subsetOf(Set(0L, 8L, 9L))) // singleton cells untouched
  }

  test("deterministic across runs and keeps the survivor stable") {
    val a = IvfIndex.semDeDup(fixture, 49L, 400L).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = IvfIndex.semDeDup(fixture, 49L, 400L).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b)
    // all three live in seed-0's cell
    assert(a.forall(_._2 == 0))
  }

  test("a τ above the planted similarity drops nothing") {
    // cos(0,8) ≈ 0.999 — τ² = 9999/10000 (τ ≈ 0.99995) excludes it
    val none = IvfIndex.semDeDup(fixture, 9999L, 10000L).collect()
    assert(none.isEmpty)
  }
}
