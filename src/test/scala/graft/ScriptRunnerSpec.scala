package graft

import java.nio.file.{Files, Path}

import graft.script.WarpScriptEngine
import graft.surface.ScriptRunner

/** The periodic runner service: period-from-path discovery, tick
  * scheduling, injected runner.* symbols, ${var} substitution, error
  * capture and the getScheduled status shape. */
class ScriptRunnerSpec extends SparkSpec {

  private def eng = () => new WarpScriptEngine(
    fetch = (_, _, _, _) => throw new UnsupportedOperationException,
    nowTs = 0L, session = Some(spark))

  private def mkTree(): Path = {
    val root = Files.createTempDirectory("graft-runner-")
    Files.createDirectories(root.resolve("grp/100"))
    Files.createDirectories(root.resolve("grp/250"))
    Files.createDirectories(root.resolve("grp/notaperiod"))
    Files.write(root.resolve("grp/100/fast.mc2"),
      "$runner.periodicity 2 *".getBytes("UTF-8"))
    Files.write(root.resolve("grp/250/slow.mc2"),
      "'${who}' 'hello ' SWAP +".getBytes("UTF-8"))
    Files.write(root.resolve("grp/notaperiod/skipped.mc2"),
      "1".getBytes("UTF-8"))
    root
  }

  test("scan: period from the parent directory name, non-numeric skipped") {
    val root = mkTree()
    val r = new ScriptRunner(root, eng)
    val scripts = r.scan()
    assert(scripts.size == 2)
    assert(scripts(root.resolve("grp/100/fast.mc2").toString) == 100L)
    assert(scripts(root.resolve("grp/250/slow.mc2").toString) == 250L)
  }

  test("ticks run at-period with injected symbols and var substitution") {
    val root = mkTree()
    val results = scala.collection.mutable.Map.empty[String, List[Any]]
    val r = new ScriptRunner(root, eng, vars = Map("who" -> "runners"),
      scanPeriodMs = 0L, onResult = (p, st) => results.synchronized {
        results(p) = st })
    // t=0: both run at startup
    assert(r.runDue(0L).size == 2)
    assert(r.awaitQuiesce())
    results.synchronized {
      assert(results(root.resolve("grp/100/fast.mc2").toString) == List(200L))
      assert(results(root.resolve("grp/250/slow.mc2").toString) ==
        List("hello runners"))
    }
    // t=120: only the 100ms script is due again
    assert(r.runDue(120L) == Seq(root.resolve("grp/100/fast.mc2").toString))
    assert(r.awaitQuiesce())
    // t=130: nothing due (fast rescheduled to 220)
    assert(r.runDue(130L).isEmpty)
    // t=260: both due (fast at 220, slow at 250)
    assert(r.runDue(260L).size == 2)
    assert(r.awaitQuiesce())
  }

  test("errors are captured per script; getScheduled reports the state") {
    val root = mkTree()
    Files.write(root.resolve("grp/100/bad.mc2"), "NOSUCHWORD".getBytes("UTF-8"))
    val r = new ScriptRunner(root, eng, scanPeriodMs = 0L)
    r.runDue(0L)
    assert(r.awaitQuiesce())
    val st = r.getScheduled()
    assert(st.size == 3)
    val bad = st("grp/100/bad.mc2")
    assert(String.valueOf(bad("lasterror")).contains("NOSUCHWORD"))
    assert(st("grp/100/fast.mc2")("lasterror") == null)
    assert(st("grp/100/fast.mc2")("nextrun") == 100L)
    // regexp filter on group/period/name
    assert(r.getScheduled(Some("grp/250/.*")).keySet == Set("grp/250/slow.mc2"))
    // deleting a script drops its state on the next tick
    Files.delete(root.resolve("grp/100/bad.mc2"))
    r.runDue(500L)
    assert(r.awaitQuiesce())
    assert(!r.getScheduled().contains("grp/100/bad.mc2"))
  }

  test("a sleeping script neither delays a sibling's schedule nor refires") {
    val root = mkTree()
    Files.write(root.resolve("grp/100/sleepy.mc2"),
      "800 SLEEP 'woke'".getBytes("UTF-8"))
    val runs = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val r = new ScriptRunner(root, eng, scanPeriodMs = 0L,
      onResult = (p, _) => runs.synchronized {
        runs(p) = runs(p) + 1 })
    val sleepy = root.resolve("grp/100/sleepy.mc2").toString
    val fast = root.resolve("grp/100/fast.mc2").toString
    val t0 = System.nanoTime
    assert(r.runDue(0L).toSet.contains(sleepy))
    // the tick returned while sleepy is still asleep: submission is
    // asynchronous, so the TICK THREAD was never blocked by the sleep
    assert((System.nanoTime - t0) / 1e6 < 500)
    // wait for the QUICK scripts to finish (sleepy still in flight);
    // nextrun flips from the -1 in-flight sentinel on completion
    val deadline = System.currentTimeMillis() + 5000
    while (r.getScheduled()("grp/100/fast.mc2")("nextrun") != 100L &&
           System.currentTimeMillis() < deadline) Thread.sleep(5)
    // sleepy is in flight: a due tick refires the sibling, NOT sleepy
    // (the reference parks in-flight scripts with nextrun = -1)
    val second = r.runDue(100L)
    assert(second.contains(fast) && !second.contains(sleepy))
    assert(r.getScheduled()("grp/100/sleepy.mc2")("nextrun") == -1L)
    assert(r.awaitQuiesce(5000L))
    runs.synchronized {
      assert(runs(sleepy) == 1) // never refired while asleep
      assert(runs(fast) == 2)   // sibling kept its schedule
    }
    // completion rescheduled sleepy off its SCHEDULING tick (0 + 100)
    assert(r.getScheduled()("grp/100/sleepy.mc2")("nextrun") == 100L)
    val third = r.runDue(200L)
    assert(third.contains(sleepy))
    assert(r.awaitQuiesce(5000L))
    runs.synchronized { assert(runs(sleepy) == 2) }
  }

  test("runAtStartup=false aligns the first run to the period grid") {
    val root = mkTree()
    val r = new ScriptRunner(root, eng, runAtStartup = false)
    assert(r.runDue(130L).isEmpty) // discovery tick: aligns only
    // fast aligned to 200, slow to 250
    assert(r.runDue(210L) == Seq(root.resolve("grp/100/fast.mc2").toString))
    assert(r.runDue(260L) == Seq(root.resolve("grp/250/slow.mc2").toString))
  }
}
