package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixed-point PageRank over an edge list — the iterative-graph
  * operator behind q136 (`LlmPipeline`), generalized for reuse: a
  * crawl/link-graph authority signal a pre-training pipeline mixes
  * into document quality (Common Crawl publishes PageRank-family host
  * ranks for exactly this use).
  *
  * Determinism contract (the q52 doctrine): ranks are 1e-6 fixed-point
  * longs; per-edge contribution = `rank DIV outdeg` (exact floor on
  * nonnegative values), update = `base + (dampingPct·Σ) DIV 100` with
  * reduce-order-proof integer sums — so any engine, partitioning, or
  * replay produces bit-identical ranks, and an oracle can replay the
  * chain in SQL CTEs. Dangling mass is not redistributed (the
  * simplified form, documented); nodes with no inlinks sit exactly at
  * `base` = floor((100 − dampingPct)·10⁴).
  *
  * Scale: the (src, dst, outdeg) frame materializes ONCE (it feeds
  * every round); each round is one equi-join on src + one
  * map-side-combined sum keyed dst + one left join back to the node
  * frame — the canonical distributed PageRank step. Rounds are
  * CHECKPOINTED (`Exec.materialize`) with the previous round released
  * (the connected-components loop pattern), so the plan stays one
  * round deep at any iteration count and nothing re-executes across
  * rounds; no driver loop over data, only over the fixed round count.
  */
object LinkRank {

  /** Iterate `iters` rounds over `edges` (columns `src`, `dst`;
    * multi-edges and self-loops are the caller's policy) for the node
    * set `nodes` (column `node`). Returns (node, rank_fp).
    */
  def train(nodes: DataFrame, edges: DataFrame, iters: Int,
      dampingPct: Int = 85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100], got $dampingPct")
    val base = (100L - dampingPct) * 10000L
    val withDeg = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .transform(Exec.materialize)
    var ranks = nodes.select(col("node"), lit(1000000L).as("rank_fp"))
    for (i <- 1 to iters) {
      val sums = withDeg
        .join(ranks, withDeg("src") === ranks("node"))
        .select(col("dst"), expr("rank_fp DIV outdeg").as("c"))
        .groupBy("dst").agg(sum("c").as("in_sum"))
      val next = nodes
        .join(sums, nodes("node") === sums("dst"), "left")
        .select(nodes("node"),
          (lit(base) + coalesce(
            expr(s"($dampingPct * in_sum) DIV 100"), lit(0L)))
            .cast(LongType).as("rank_fp"))
        .transform(Exec.materialize)
      if (i > 1) Exec.release(ranks) // previous round is consumed
      ranks = next
    }
    Exec.release(withDeg)
    ranks
  }
}
