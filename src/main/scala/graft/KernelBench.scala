package graft

/** Throwaway microbenchmark for the per-series kernels (r13 profiling;
  * no Spark): times StlKernel.stl on w54-shaped series. */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val nSeries = args.headOption.map(_.toInt).getOrElse(1000)
    val n = 720
    val lastbucket = 1700000000000000L
    val span = 3600L * 1000000L
    val rnd = new java.util.Random(42)
    def mk(): (Array[Long], Array[Double]) = {
      val ticks = Array.tabulate(n)(i => lastbucket - (n - 1 - i) * span)
      val vals = Array.fill(n)(rnd.nextInt(100000).toDouble)
      (ticks, vals)
    }
    // w54 params: PERIOD 24, BANDWIDTH_S -1, BANDWIDTH_L 1, BANDWIDTH_T 1, SPEED 0
    // resolved (per StlParams): bpp=24, inner=2, outer=1(?),
    // ns=-1 ds=1 js=1, nl=1 dl=1 jl=1, nt=1 dt=1 jt=1, np/dp/jp defaults
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < nSeries) {
        val (t, v) = mk()
        kernels.StlKernel.stl(
          kernels.StlKernel.ofPoints(t, v, Some((lastbucket, span, n.toLong))),
          24, 2, 0,
          -1, 1, 0,
          1, 1, 0,
          1, 1, 0,
          0, 2, 0)
        i += 1
      }
      println(f"[kbench] round $round: $nSeries series x $n pts: " +
        f"${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
  }
}
