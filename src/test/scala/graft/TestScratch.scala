package graft

/** Temp dirs for tests that are actually deleted: createTempDirectory
  * plus a JVM shutdown hook, so a forked test run cleans its scratch on
  * exit instead of leaving one orphan per suite per run (the same
  * hygiene contract graft.sources.Scratch gives the query side —
  * hundreds of graft-* orphans had accumulated under /tmp before this).
  * Unique-per-call (unlike Scratch's reuse-keyed dirs) because sbt runs
  * suites in parallel inside one JVM and two concurrent tests must
  * never share a wiped path.
  */
object TestScratch {
  def dir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try graft.sources.Scratch.wipe(p)
      catch { case scala.util.control.NonFatal(_) => () }))
    p.toString
  }
}
