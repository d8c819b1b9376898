package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: empirical-gap measurement for the w110 circular-mean
  * guard band at the 3-dp grid (see WsQueries5 "w110_ws_mean_circular").
  *
  * For every kept bucket (R > 1e-3) it computes the unit-vector
  * direction (c, s) two ways — the engine's bucketizer.mean.circular
  * output and a raw Spark resultant sum — and prints, per SF dir:
  *   - the 15 smallest 3-dp guard distances d3(x) = |frac(x*1e3)-0.5|
  *     over both components and both computation paths (the empirical
  *     gap the guard threshold must sit inside),
  *   - the count of rows a candidate threshold would drop,
  *   - the minimum distance of d3*1e3 from an integer (stability of
  *     the diagnostic twin's floor(d3*1000) bucket column).
  *
  * Usage: runMain graft.queries.W110Probe <sfDir> [<sfDir> ...]
  */
object W110Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import GtsQueries.{DAY, LB}

    args.foreach { dir =>
      val e = WsQueries.engine(spark, dir, cents = true)
      val FETCHALL = s"[ '' '~events\\..*' { } $LB ${LB + 1} ] FETCH"
      val userid = col("labels").getItem("user").as("userid")
      val circ = e.runToFrame(
          s"[ $FETCHALL 100.0 bucketizer.mean.circular $LB $DAY 0 ] BUCKETIZE")
        .select(col("class"), userid, col("ts"), col("vdouble").as("circ"))
      val theta = col("vdouble") * lit(2.0 * math.Pi) / lit(100.0)
      val res = e.runToFrame(FETCHALL)
        .groupBy(col("class"), userid,
          expr(s"$LB - (($LB - ts) DIV $DAY) * $DAY").as("ts"))
        .agg(sum(sin(theta)).as("ss"), sum(cos(theta)).as("sc"))
        .withColumn("r", sqrt(col("ss") * col("ss") + col("sc") * col("sc")))
        .where(col("r") > 1e-3)
      val ang = col("circ") * lit(2.0 * math.Pi) / lit(100.0)
      val j = circ.join(res, Seq("class", "userid", "ts"))
        .select(
          cos(ang).as("c1"), sin(ang).as("s1"),
          (col("sc") / col("r")).as("c2"), (col("ss") / col("r")).as("s2"))
      def d3(x: org.apache.spark.sql.Column) =
        abs(x * 1e3 - floor(x * 1e3) - 0.5)
      val dists = j.select(explode(array(
          d3(col("c1")), d3(col("s1")), d3(col("c2")), d3(col("s2"))))
        .as("d")).cache()
      val n = dists.count() / 4
      val smallest = dists.orderBy("d").limit(15)
        .collect().map(_.getDouble(0))
      println(s"[w110probe] $dir rows=$n")
      println(s"[w110probe]   smallest d3: " +
        smallest.map(d => f"$d%.3e").mkString(", "))
      Seq(1e-6, 1e-5, 1e-4).foreach { tau =>
        val dropped = dists.where(col("d") <= tau).count()
        println(f"[w110probe]   tau=$tau%.0e drops $dropped component-rows")
      }
      // twin stability: floor(d3*K) bucket — distance from the grid
      val gridMin = dists
        .select(abs(col("d") * 1e3 - round(col("d") * 1e3, 0)).as("g"))
        .where(col("g") > 0)
        .agg(min(col("g"))).collect()(0).getDouble(0)
      println(f"[w110probe]   min |d3*1e3 - nearestInt| (nonzero): $gridMin%.3e")
      // round(d3*K) bucket — distance of frac(d3*K) from 0.5 (the
      // round boundary); safe quantization needs a clean gap here
      Seq(1e3, 2e2, 1e2).foreach { k =>
        val halfMin = dists
          .select(abs(col("d") * k - floor(col("d") * k) - 0.5).as("h"))
          .agg(min(col("h"))).collect()(0).getDouble(0)
        println(f"[w110probe]   K=$k%.0e min |frac(d3*K) - 0.5|: $halfMin%.3e")
      }
      dists.unpersist()
    }
    spark.stop()
  }
}
