package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The d48 fixed-point integer PageRank: hand-computable fixtures
  * (every operation is integer floor division, so expected ranks are
  * exact), multiplicity semantics, and the mass bound. */
class GraphOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int = 8) =
    GraphOps.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(String, Long)].collect().toMap

  test("two-node cycle is a fixed point at exactly unit mass") {
    // teleport 150_000_000 + (1e9 * 85 // 100) // 1 = exactly 1e9
    val got = ranks(Seq("a" -> "b", "b" -> "a"))
    assert(got == Map("a" -> 1000000000L, "b" -> 1000000000L))
  }

  test("star: the dangling hub converges to its exact closed form") {
    // three leaves -> hub; hub has no out-edges (dangling: its damped
    // mass leaks). From round 2 on: leaves = teleport = 150_000_000,
    // hub = 150_000_000 + 3 * ((150_000_000 * 85) // 100) // 1
    val got = ranks(Seq("a" -> "h", "b" -> "h", "c" -> "h"))
    assert(got("a") == 150000000L && got("b") == 150000000L)
    assert(got("h") == 150000000L + 3L * 127500000L, got.toString)
  }

  test("iters = 0 returns unit mass for every node") {
    val got = ranks(Seq("a" -> "b", "c" -> "b"), iters = 0)
    assert(got.values.toSet == Set(1000000000L) && got.size == 3)
  }

  test("multi-edges count multiplicity") {
    // a's degree is 3; b receives two shares, c one — every round
    val got = ranks(Seq("a" -> "b", "a" -> "b", "a" -> "c"))
    assert(got("b") > got("c"), got.toString)
    // exact: from round 2, a = teleport; b = t + 2*((t*85//100)//3)
    assert(got("b") == 150000000L + 2L * (127500000L / 3L))
    assert(got("c") == 150000000L + (127500000L / 3L))
  }

  test("total mass never exceeds nodes x unit (floor never creates mass)") {
    val edges = (0 until 40).map(i => (s"n${i % 7}", s"n${(i * 3 + 1) % 7}"))
      .filter { case (a, b) => a != b }
    val got = ranks(edges)
    assert(got.values.sum <= got.size * 1000000000L)
    // and the damped web keeps everyone above bare teleport floor only
    // if they have in-edges; nobody falls below teleport
    assert(got.values.forall(_ >= 150000000L))
  }
}
