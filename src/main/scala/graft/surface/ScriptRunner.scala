package graft.surface

import java.nio.file.{Files, Path}

import graft.script.WarpScriptEngine

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Periodic execution of on-disk WarpScript programs (the reference's
  * runner service, script/ScriptRunner.java:99,455-498,925-955):
  * scripts live at `<root>/<group>/<periodMs>/<name>.mc2` — the
  * periodicity IS the parent directory name — and each runs every
  * period with `runner.periodicity` / `runner.path` /
  * `runner.scheduledat` bound in its environment plus `${var}`
  * substitution from the configured vars (:645-680).
  *
  * Scheduling is tick-driven like [[MobiusEndpoint]]: [[runDue]] is
  * the period fire (specs and driver rows call it directly for
  * determinism; [[start]] spins a daemon thread parked 50 ms between
  * ticks, the reference's cadence, :496). Per-script
  * lastrun/lastduration/lasterror state backs [[getScheduled]]
  * (:986-1030 — the RUNNERS introspection shape).
  */
final class ScriptRunner(root: Path, engine: () => WarpScriptEngine,
                         minPeriodMs: Long = 0L,
                         runAtStartup: Boolean = true,
                         vars: Map[String, String] = Map.empty,
                         onResult: (String, List[Any]) => Unit = (_, _) => (),
                         onError: (String, Throwable) => Unit = (_, _) => ()) {

  private val nextRun = mutable.Map.empty[String, Long]
  private val lastRun = mutable.Map.empty[String, Long]
  private val lastDuration = mutable.Map.empty[String, Long]
  private val lastError = mutable.Map.empty[String, String]

  /** `script path → period ms`: every `*.mc2` under a numeric-named
    * directory, periods below `minPeriodMs` ignored (:930-933). */
  def scan(): Map[String, Long] =
    if (!Files.isDirectory(root)) Map.empty
    else Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".mc2"))
      .flatMap { p =>
        val period = p.getParent.getFileName.toString.toLongOption
        period.filter(_ >= minPeriodMs).map(p.toString -> _)
      }.toMap

  /** One scheduler tick: run every due script, reschedule, drop state
    * of deleted scripts; returns the paths run this tick. */
  def runDue(nowMs: Long): Seq[String] = synchronized {
    val scripts = scan()
    (nextRun.keySet -- scripts.keySet).foreach { gone =>
      nextRun.remove(gone); lastRun.remove(gone)
      lastDuration.remove(gone); lastError.remove(gone)
    }
    val due = scripts.toSeq.sortBy(_._1).filter { case (path, period) =>
      nextRun.get(path) match {
        case None =>
          // first sighting: run now, or align to the period grid (:466-470)
          if (runAtStartup) true
          else {
            nextRun(path) = nowMs + (period - nowMs % period) % period
            false
          }
        case Some(at) => at <= nowMs
      }
    }
    due.foreach { case (path, period) =>
      val t0 = System.nanoTime
      try {
        val program = prologue(path, period, nowMs) + substitute(
          new String(Files.readAllBytes(Path.of(path)), "UTF-8"))
        val stack = engine().run(program)
        lastError.remove(path)
        onResult(path, stack)
      } catch {
        case e: Exception =>
          lastError(path) = Option(e.getMessage).getOrElse(e.toString)
          onError(path, e)
      } finally {
        lastRun(path) = nowMs
        lastDuration(path) = System.nanoTime - t0
        nextRun(path) = nowMs + period
      }
    }
    due.map(_._1)
  }

  /** Runner status keyed `group/period/name`, optionally filtered by a
    * full-match regexp on that name (getScheduled, :986). */
  def getScheduled(regexp: Option[String] = None): Map[String, Map[String, Any]] =
    synchronized {
      val m = regexp.map(_.r)
      nextRun.keys.flatMap { path =>
        val p = Path.of(path)
        val n = p.getNameCount
        val name = s"${p.getName(n - 3)}/${p.getName(n - 2)}/${p.getName(n - 1)}"
        if (m.exists(!_.matches(name))) None
        else Some(name -> Map[String, Any](
          "nextrun" -> nextRun(path),
          "lastrun" -> lastRun.getOrElse(path, Long.MinValue),
          "lastduration" -> lastDuration.getOrElse(path, 0L),
          "lasterror" -> lastError.getOrElse(path, null)))
      }.toMap
    }

  private def prologue(path: String, period: Long, nowMs: Long): String = {
    val rel = root.relativize(Path.of(path)).toString
    s"$period 'runner.periodicity' STORE " +
      s"$nowMs 'runner.scheduledat' STORE " +
      s"'${rel.replace("'", "\\'")}' 'runner.path' STORE\n"
  }

  /** `${var}` substitution from the configured vars (:645-680);
    * unknown vars are left verbatim. */
  private def substitute(script: String): String =
    vars.foldLeft(script) { case (s, (k, v)) => s.replace("${" + k + "}", v) }

  // ---------------------------------------------------------- scheduler

  @volatile private var running = false

  /** Spin the 50 ms tick loop on a daemon thread (:496). */
  def start(): Unit = {
    running = true
    val t = new Thread(() => {
      while (running) {
        try runDue(System.currentTimeMillis())
        catch { case _: Exception => () }
        Thread.sleep(50L)
      }
    }, "script-runner")
    t.setDaemon(true)
    t.start()
  }

  def stop(): Unit = running = false
}
