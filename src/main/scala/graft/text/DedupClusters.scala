package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Connected components over a near-duplicate pair graph — the step
  * that turns pairwise matches (MinHash/SimHash verify output) into
  * dedup CLUSTERS with one canonical survivor per component.
  *
  * Algorithm: iterative min-label propagation (the dataframe form of
  * large-star/small-star, Kiveris et al. 2014): every node starts as
  * its own label; each round joins labels across edges (both
  * directions) and keeps the minimum seen; stops when a round changes
  * nothing. Rounds ≤ ⌈log₂ diameter⌉ for star-collapsing variants and
  * ≤ diameter for plain propagation — near-dup graphs are
  * overwhelmingly tiny stars/cliques, so a handful of rounds settles
  * 100 TB-scale graphs. Each round is two shuffles (join on node,
  * groupBy min); the driver only reads a one-row convergence count.
  * Determinism: labels are mins over a fixed id set — no order
  * dependence anywhere.
  *
  * Lineage: each round references the previous labels frame TWICE
  * (propagation join + convergence check), so the logical plan would
  * grow 2^rounds without truncation — `localCheckpoint` cuts it to a
  * materialized RDD per round (persist alone does NOT shrink the
  * plan). On a real cluster use reliable `checkpoint` to an HDFS dir
  * instead so executor loss can't drop a round's labels.
  */
object DedupClusters {

  /** `edges`: (src, dst) undirected pairs. Returns (doc_id, cluster)
    * for every endpoint, cluster = min doc_id reachable. */
  def connectedComponents(edges: DataFrame, maxIters: Int = 30): DataFrame = {
    // both directions; the input's (ida < idb) pairs and their flips are
    // disjoint, so no distinct is needed (it would be a full extra shuffle)
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    // seed with the 1-hop minimum instead of the identity: near-dup
    // components are overwhelmingly cliques/stars, where min(id,
    // neighbors) is ALREADY the fixpoint — typical runs then need one
    // confirming round instead of two propagation rounds
    var labels = sym.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("__m"))
      .select(col("id"), least(col("id"), col("__m")).as("lbl"))
      .localCheckpoint(true)
    // labels only ever decrease, so the (exact, overflow-proof) decimal
    // label sum is strictly monotone: unchanged sum == converged. One
    // cheap agg over the just-checkpointed frame replaces a
    // join-and-compare against the previous round.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("lbl").cast(DecimalType(38, 0)))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      // candidate label per node: min of own label and neighbors'
      val viaEdges = sym.join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("lbl", "nlbl"), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nlbl")).as("elbl"))
      val next = labels.join(viaEdges, Seq("id"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("elbl"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
      val newSum = labelSum(next)
      labels = next
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      it += 1
    }
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster"))
  }

  /** Cluster summary: component size and the canonical survivor (min
    * id — the standard keep-first dedup policy). */
  def clusterSummary(cc: DataFrame): DataFrame =
    cc.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2) // singletons are not dup clusters
}
