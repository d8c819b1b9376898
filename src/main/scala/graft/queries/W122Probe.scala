package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time each w122 face separately to see where the
  * 7-program constant cost sits. Usage: runMain graft.queries.W122Probe
  * [sfDir]. */
object W122Probe {
  import WsQueries._

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val LB = 1706659200000000L
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      Console.err.println(f"$name%-10s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }

    // bench-faithful: warm at sf0.001 (the bench's warmup pass), clear
    // caches like the bench does, then time the sf0.1 row
    t("warm001") { graft.SparkEntry.queries("w122_ws_fetch_selectors")(
      s, "/root/testdata/sf0.001").count() }
    s.catalog.clearCache()
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    t("ALL") { graft.SparkEntry.queries("w122_ws_fetch_selectors")(s, dir).count() }
    s.catalog.clearCache()
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    t("ALLb") { graft.SparkEntry.queries("w122_ws_fetch_selectors")(s, dir).count() }

    val e = engine(s, dir, cents = true, withMeta = true)
    val cut = LB - 24L * 3600L * 1000000L
    t("multi") { e.runToFrame(
      s"""{ 'selectors' [ 'events.click{user~[0-9]}' '~events\\.(click|view){user~1}' ]
         |  'end' $LB 'timespan' $LB } FETCH""".stripMargin).count() }
    (0 to 3).foreach { p =>
      t(s"page$p") { e.runToFrame(
        s"""{ 'selpairs' [ [ 'events.click' { 'user' '~[0-9]' } ]
           |               [ 'events.view' { 'user' '~[0-9]' } ] ]
           |  'end' $LB 'timespan' $LB 'gskip' ${p * 7L} 'gcount' 7 } FETCH"""
          .stripMargin).count() }
    }
    t("act") { e.runToFrame(
      s"""{ 'selector' '~events\\..*{user~[0-9]}'
         |  'end' $LB 'timespan' $LB 'active.after' $cut } FETCH""".stripMargin).count() }
    t("quiet") { e.runToFrame(
      s"""{ 'selector' '~events\\..*{user~[0-9]}'
         |  'end' $LB 'timespan' $LB 'quiet.after' $cut } FETCH""".stripMargin).count() }
    // second full pass: how much is JIT/first-plan warmup?
    t("ALL2") { graft.SparkEntry.queries("w122_ws_fetch_selectors")(s, dir).count() }
    s.stop()
  }
}
