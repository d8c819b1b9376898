package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Gts
import graft.operators.GtsFrame
import graft.script.WarpScriptEngine

/** Dev tool (SCALE.md, round 13): verify the claim that the
  * stack-surface binary-operator GTS faces (WordsBinaryOps — the `+ - *
  * <` faces behind q w142) cost wall time proportional to SERIES
  * LENGTH and nothing else. A stack word operates on one or two single
  * series; the only axis that grows at 100 TB is how long one series'
  * history is, so the probe builds ONE dense second-aligned series per
  * event class (every click/view point folded into a single GTS, ticks
  * floored to the second and deduped so the GTSxGTS tick join is
  * 1-to-1) and lengthens it in the TIME dimension (each replica's
  * ticks shifted past the previous range — same gtsid, x10/x100 the
  * points), timing each face at every decade. The distributed hot-path
  * equivalents remain the `op.x` and `mapper.x` Column families; this
  * is the cold REPL path.
  *
  * Usage: runMain graft.BinaryWordScaleProbe [sfDir]
  */
object BinaryWordScaleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one single series per class: every click/view point folded into
    // one GTS, ticks resequenced 1..N per class (row_number in time
    // order) so the series is dense, every tick is unique, and the
    // GTSxGTS tick join matches 1-to-1 across the classes
    import org.apache.spark.sql.expressions.Window
    val seq = Window.partitionBy("class").orderBy("ts", "gtsid")
    val base = Gts.canonicalRehash(
      Gts.fromEventsCents(spark, sfDir)
        .withColumn("ts", row_number().over(seq).cast("long"))
        .withColumn("labels", map(lit("user"), lit("probe"))))
      .persist()
    val Array(tsMin, tsMax) = base.agg(min("ts"), max("ts"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val span = tsMax - tsMin + 1

    // time-dimension replication: same gtsid, k-times the history
    def lengthen(k: Int): DataFrame =
      if (k == 1) base
      else base.crossJoin(spark.range(k).select(col("id").as("__rep")))
        .withColumn("ts", col("ts") + col("__rep") * span)
        .drop("__rep")

    // the probe's fetch hook ignores the range: the word's range
    // arithmetic is not what is being measured
    def engineAt(k: Int): WarpScriptEngine = {
      val df = lengthen(k)
      new WarpScriptEngine(
        fetch = (cls, _, _, _) => GtsFrame(df.filter(col("class") === cls)),
        nowTs = tsMax, session = Some(spark))
    }

    val fetchC = s"[ '' 'events.click' { } $tsMax $span ] FETCH"
    val fetchV = s"[ '' 'events.view' { } $tsMax $span ] FETCH"

    // the w142 faces on the raw series, one program per face so each
    // decade/face is its own timed measurement
    val faces: Seq[(String, String)] = Seq(
      "gts_gts_add" -> s"$fetchC 'c' STORE $fetchV 'v' STORE $$c $$v +",
      "gts_scalar_mul" -> s"$fetchC 2 *",
      "gts_scalar_sub" -> s"10000000 $fetchC -",
      "gts_gts_lt" -> s"$fetchC 'c' STORE $fetchV 'v' STORE $$c $$v <")

    def time(k: Int, prog: String): (Long, Double) = {
      val e = engineAt(k)
      val t0 = System.nanoTime()
      val out = e.run(prog)
      val n = e.frameOf(out.head)
        .agg(count(lit(1))).collect()(0).getLong(0)
      (n, (System.nanoTime() - t0) / 1e9)
    }

    val n1 = base.filter(col("class") === "events.click").count()
    Console.err.println(
      s"== BinaryWordScaleProbe over $sfDir (single series, $n1 click points at 1x; time-dimension x10/x100) ==")
    faces.foreach { case (name, prog) =>
      time(1, prog) // warmup (codegen/JIT) — discarded
      val (c1, t1) = time(1, prog)
      val (c10, t10) = time(10, prog)
      val (c100, t100) = time(100, prog)
      Console.err.println(f"$name%-16s 1x: $t1%6.2f s ($c1%8d rows)   10x: $t10%6.2f s ($c10%9d)   100x: $t100%7.2f s ($c100%10d)   ratios ${t10 / t1}%4.1f / ${t100 / t10}%4.1f")
    }
    spark.stop()
  }
}
