package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (companion to [[ScaleProbe]]): measure the embedding
  * near-dup operators on a replicated embeddings dir with an explicit
  * IVF cell count — the K ∝ N knob SemDeDup's 100 TB story depends
  * on. Prints one wall-time line per configuration; results recorded
  * in SCALE.md. Reads only.
  *
  * Usage: runMain graft.AnnScaleProbe <embsDir> <k> [<k2> ...]
  */
object AnnScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val ks = args.drop(1).map(_.toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = embs.count()
    ks.foreach { k =>
      val t0 = System.nanoTime()
      val dropped = graft.text.IvfIndex.semDeDup(embs, 49L, 400L, k).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[annscale] n=$n k=$k dropped=$dropped wall=$dt%.2f s")
    }
    spark.stop()
  }
}
