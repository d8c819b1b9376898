package graft

import graft.script.{WarpScriptEngine, WordInventory}

/** Dev tool: probe every reference-registry name (WordInventory, the
  * public WarpScriptLib.getFunctionNames() list) against the engine's
  * dispatcher and report which are NOT implemented. A name counts as
  * implemented when evaluating it on an empty stack produces anything
  * other than the dispatcher's "unknown function" error (stack
  * underflow / type errors mean the word exists and checked its args).
  */
object WordCoverage {
  def main(args: Array[String]): Unit = {
    val en = new WarpScriptEngine(
      (_, _, _, _) => throw new IllegalStateException("no fetch"), nowTs = 0L)
    val missing = scala.collection.mutable.ArrayBuffer.empty[String]
    var known = 0
    val skip = Set("CALL", "SLEEP", "STDIN", "WAIT", "MUTEX", "WSAUDITMODE")
    val names: Seq[String] =
      if (args.nonEmpty)
        scala.io.Source.fromFile(args(0)).getLines().filter(_.nonEmpty).toSeq
      else WordInventory.names
    for (w <- names) {
      if (sys.env.contains("WORDCOV_TRACE")) { Console.err.println(s"... $w") }
      val isKnown = skip(w) || {
        try { en.run(w); true }
        catch {
          case e: IllegalArgumentException
            if e.getMessage != null && e.getMessage.startsWith("unknown function") => false
          case _: Throwable => true
        }
      }
      if (isKnown) known += 1 else missing += w
    }
    Console.err.println(s"known $known / ${names.size}")
    Console.err.println("MISSING: " + missing.mkString(" "))
  }
}
