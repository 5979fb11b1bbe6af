package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Reuse-keyed scratch directories for queries that need local working
  * storage as a side effect (the w02/w03/w04 stream-replay staging dirs,
  * the v10/v11 vault warehouse locations).
  *
  * `Files.createTempDirectory` per invocation is correct but unbounded:
  * every verify run in a long-lived session leaves another orphan under
  * /tmp. Instead each (tag, input-dir) pair maps to ONE deterministic
  * path that is wiped and recreated at query start — repeated runs
  * reuse the same footprint, so a session's scratch usage is bounded by
  * the number of distinct (query, scale-factor) combinations, not by
  * the number of runs. Keying by input dir keeps concurrent runs at
  * different scale factors from clobbering each other (the e07
  * sf-keyed-table idiom).
  */
object Scratch {

  /** Sanitized suffix for an input dir, shared with the sf-keyed
    * database names (v11's `v11_raw_<sfx>` pattern). */
  def sfKey(inputDir: String): String =
    inputDir.split('/').filter(_.nonEmpty).last.replaceAll("[^A-Za-z0-9]", "_")

  /** The scratch dir for (tag, inputDir): wiped if it exists, then
    * recreated empty. Returns the absolute path as a String. */
  def dir(tag: String, inputDir: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft-$tag-${sfKey(inputDir)}")
    wipe(p)
    Files.createDirectories(p)
    p.toString
  }

  /** Recursively delete `p` if present (children before parents). */
  private def wipe(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
}
