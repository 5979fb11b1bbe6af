package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{ShuffleSweep, SparkEntry, TestSpark}

/** Standing plan-drift gate: every query's static (non-AQE) shuffle
  * exchange count must match the committed SHUFFLE_BASELINE.json.
  *
  * The count is the plan-shape fingerprint — an extra exchange means a
  * lost ReusedExchange, a new shuffle an operator stopped being narrow,
  * a missing one a join silently became broadcast. Bytes are recorded
  * in the baseline for the record but not gated here (they drift with
  * fixtures; BENCH_r{N} tracks them per round at sf0.1).
  *
  * After a DELIBERATE plan change, regenerate and commit:
  *   sbt 'Test/runMain graft.ShuffleSweep /root/testdata/sf0.01 --write SHUFFLE_BASELINE.json'
  */
class ShuffleBaselineSpec extends AnyFunSuite {

  private val baselinePath = "SHUFFLE_BASELINE.json"

  /** Parses the exact shape ShuffleSweep emits (machine-generated
    * file, not arbitrary JSON). */
  private def loadBaseline(): (String, Map[String, Int]) = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(baselinePath)), "UTF-8")
    val sf = """"sf":\s*"([^"]+)"""".r.findFirstMatchIn(text)
      .map(_.group(1)).getOrElse(fail(s"$baselinePath: no sf field"))
    val entry = """"([A-Za-z0-9_]+)":\s*\{"exchanges":\s*(-?\d+),\s*"bytes":\s*(-?\d+)\}""".r
    val m = entry.findAllMatchIn(text)
      .map(g => g.group(1) -> g.group(2).toInt).toMap
    assert(m.nonEmpty, s"$baselinePath: no query entries parsed")
    (sf, m)
  }

  test("static exchange count per query matches SHUFFLE_BASELINE.json") {
    val (sf, baseline) = loadBaseline()
    val swept = ShuffleSweep.sweep(TestSpark.spark, sf, execute = false)
    val current = swept.map { case (n, ex, _, _) => n -> ex }.toMap
    val errors = swept.collect { case (n, _, _, Some(e)) => s"$n failed to plan: $e" }

    val missing = baseline.keySet -- current.keySet
    val unbaselined = current.keySet -- baseline.keySet
    val drifted = baseline.toSeq.sorted.collect {
      case (n, want) if current.get(n).exists(_ != want) =>
        s"$n: exchanges ${current(n)} != baseline $want"
    }
    val problems =
      errors ++
      missing.toSeq.sorted.map(n => s"$n: in baseline but not in SparkEntry.queries") ++
      unbaselined.toSeq.sorted.map(n => s"$n: new query with no baseline entry") ++
      drifted
    assert(problems.isEmpty,
      "plan drift vs SHUFFLE_BASELINE.json — if deliberate, regenerate with\n" +
      "  sbt 'Test/runMain graft.ShuffleSweep " + sf + " --write SHUFFLE_BASELINE.json'\n" +
      problems.mkString("\n"))
  }
}
