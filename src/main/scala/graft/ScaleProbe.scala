package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Gts
import graft.operators.GtsFrame
import graft.operators.GtsFrame._

/** Dev tool: extend the measured scaling trend one decade past the
  * largest on-disk SF by replicating the sf0.1 events frame ×10 IN
  * MEMORY (series-dimension replication: each replica gets fresh user
  * labels, so series count ×10 at identical per-series length — the
  * shape a 100 TB corpus actually has). Probes the heavy operator
  * families directly at 1×/10×/100× and prints wall times with
  * per-decade ratios; results recorded in SCALE.md. Reads only; never
  * writes testdata.
  *
  * Usage: runMain graft.ScaleProbe [sfDir]
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // driver heap comes from the launching JVM (-Xmx via sbt/java);
      // setting spark.driver.memory here would be a no-op in local mode
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Gts.fromEvents(spark, sfDir)
    def replicate(k: Int): DataFrame =
      if (k == 1) base
      else Gts.canonicalRehash(
        base.crossJoin(spark.range(k).select(col("id").as("__rep")))
          .withColumn("labels", map(lit("user"),
            concat(col("labels").getItem("user"), lit("_"), col("__rep"))))
          .drop("__rep"))

    val lb = 1706659200000000L
    val day = 86400000000L

    def probe(name: String, f: DataFrame => Long): Unit = {
      def run(k: Int): (Long, Double) = {
        val df = replicate(k)
        val t0 = System.nanoTime()
        val n = f(df)
        (n, (System.nanoTime() - t0) / 1e9)
      }
      run(1) // warmup (codegen/JIT) — discarded
      val (n1, t1) = run(1)
      val (n10, t10) = run(10)
      val (n100, t100) = run(100)
      Console.err.println(f"$name%-28s 1x: $t1%6.2f s ($n1%9d)   10x: $t10%6.2f s   100x: $t100%7.2f s ($n100%10d)   ratios ${t10 / t1}%4.1f / ${t100 / t10}%4.1f")
    }

    Console.err.println(s"== ScaleProbe over $sfDir (series-dimension ×10) ==")
    probe("bucketize_sum_daily", df =>
      GtsFrame(df).bucketize(Sum, lb, day).df.count())
    probe("reduce_sum_by_user", df =>
      GtsFrame(df).reduce(Sum, Seq("user")).count())
    probe("map_tickwindow_mean", df => {
      // aggregate the computed column — a bare count() would let
      // Catalyst prune the window projection entirely
      val out = GtsFrame(df).mapWindow(Mean, 5, 0).df
      out.agg(sum(col("vdouble")), count(lit(1))).collect()(0).getLong(1)
    })
    probe("dedup_consecutive", df =>
      GtsFrame(df).dedup().df.count())
    probe("exact_dedup_digest", df =>
      df.groupBy(md5(concat_ws("|", col("class"), col("vdouble"))))
        .agg(count(lit(1))).count())
    probe("geo_hdist_window", df => {
      // synthesize a located track per series from the value stream
      val located = df
        .withColumn("lat", pmod(col("vdouble"), lit(180.0)) - 90.0)
        .withColumn("lon", pmod(col("vdouble") * 7.0, lit(360.0)) - 180.0)
      GtsFrame(located).mapWindow(Hdist, 10, 0).df
        .agg(sum(col("vdouble"))).collect()
      located.count()
    })
    probe("stl_daily_grid", df => {
      val bucketed = GtsFrame(df).bucketize(Mean, lb, day)
      new graft.kernels.KernelOps(bucketed.df).decomposeSeasonal(7).count()
    })
    spark.stop()
  }
}
