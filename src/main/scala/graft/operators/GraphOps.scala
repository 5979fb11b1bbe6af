package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality — the host/domain-grain quality prior of
  * published web-curation stacks (CommonCrawl publishes host-level
  * centrality rankings computed exactly this way; URL/host reputation
  * feeds the same filters d45's domain quotas enforce). Node grain is
  * hosts/domains — vocabulary-plateau scale, orders of magnitude below
  * the document corpus — so the iteration cost is bounded by the web
  * GRAPH, not the crawl. */
object GraphOps {

  /** Fixed-iteration integer PageRank over an edge list. Each row of
    * `edges` is one directed edge (multi-edges count multiplicity —
    * `distinct()` first for the simple-graph reading). Ranks are
    * fixed-point longs in units of 1e-9 of a per-node unit mass
    * (init 1_000_000_000); damping dampNum/dampDen applies by integer
    * floor division — every operation is integer (the d35/d38
    * exactness discipline), so ranks are bit-identical in any engine
    * at any parallelism. Floor truncation loses at most one quantum
    * per (edge, iteration) of damped mass and dangling nodes' damped
    * mass leaves the system (the published "mass leak"
    * simplification); both effects are deterministic, and neither
    * compounds (each round restarts from the teleport term). The
    * `r * dampNum` product bounds the node count at ~1e8 per unit
    * mass before long overflow — two orders above any real
    * host graph.
    *
    * Scale shape: degrees join edges ONCE into a persisted
    * (src, dst, deg) frame; each of the `iters` rounds is one
    * ranks-to-edges equi-join on src plus one map-side-combined
    * groupBy dst — the canonical Pregel cost, one node-grain shuffle
    * per iteration — localCheckpointed to truncate lineage (the
    * nearDupGroups device). Returns (node, rank_q). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 8, dampNum: Int = 85, dampDen: Int = 100): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"damping must satisfy 0 <= dampNum <= dampDen, got $dampNum/$dampDen")
    val unit = 1000000000L
    val teleport = (unit * (dampDen - dampNum)) / dampDen
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("n"))
      .union(e.select(col("dst").as("n"))).distinct().persist()
    val ed = e.join(e.groupBy("src").agg(count(lit(1)).as("__deg")), "src")
      .persist()
    var ranks = nodes.select(col("n"), lit(unit).as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contribs = ed.join(ranks, ed("src") === ranks("n"))
        .select(col("dst").as("n"),
          expr(s"((r * $dampNum) div $dampDen) div __deg").as("__c"))
        .groupBy("n").agg(sum("__c").as("__in"))
      ranks = nodes.join(contribs, Seq("n"), "left")
        .select(col("n"),
          (lit(teleport) + coalesce(col("__in"), lit(0L))).as("r"))
        .localCheckpoint(true)
    }
    nodes.unpersist(blocking = false)
    ed.unpersist(blocking = false)
    ranks.select(col("n").as("node"), col("r").as("rank_q"))
  }
}
