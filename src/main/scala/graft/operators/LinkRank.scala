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
  * nonnegative values), the dangling share = `(Σ dangling rank) DIV n`
  * (one floor per round, applied uniformly), update =
  * `base + (dampingPct·(Σ in + dangling share)) DIV 100` with
  * reduce-order-proof integer sums — so any engine, partitioning, or
  * replay produces bit-identical ranks, and an oracle can replay the
  * chain in SQL CTEs. DANGLING MASS IS REDISTRIBUTED: real crawl
  * graphs are full of pages with no parsed outlinks, and the
  * simplified drop-it form systematically deflates every rank (the
  * mass leaks out of the system each round); here each round folds
  * the dangling nodes' total rank back in as a uniform per-node
  * addend before damping — the standard PageRank completion, kept
  * fixed-point exact. Nodes with no inlinks on a graph with no
  * dangling mass sit exactly at `base` = floor((100 − dampingPct)·10⁴).
  *
  * Scale: the (src, dst, outdeg) frame and the distinct source set
  * materialize ONCE (they feed every round); each round is one
  * equi-join on src + one map-side-combined sum keyed dst + one
  * left-anti-join scalar aggregate (the dangling sum — a 1-row
  * broadcast, never a corpus collect) + one left join back to the
  * node frame — the canonical distributed PageRank step. Rounds are
  * CHECKPOINTED (`Exec.materialize`) with the previous round released
  * (the connected-components loop pattern), so the plan stays one
  * round deep at any iteration count and nothing re-executes across
  * rounds; the driver loops only over the round count, never data.
  */
object LinkRank {

  /** Iterate `iters` rounds over `edges` (columns `src`, `dst`;
    * multi-edges and self-loops are the caller's policy) for the node
    * set `nodes` (column `node`). Returns (node, rank_fp).
    */
  def train(nodes: DataFrame, edges: DataFrame, iters: Int,
      dampingPct: Int = 85): DataFrame =
    trainConverged(nodes, edges, maxIters = iters, tolFp = 0L,
      dampingPct = dampingPct)._1

  /** [[train]] with a CONVERGENCE STOP: rounds run until the largest
    * per-node rank movement drops below `tolFp` (1e-6 fixed-point
    * units) or `maxIters` rounds have run — the fixed-point form of
    * "iterate to tolerance" that keeps an unbounded production graph
    * from paying a worst-case iteration budget on every retrain.
    * `tolFp = 0` disables the check (exactly `maxIters` rounds run —
    * the replayable fixed-count form the q136 oracle pins). The delta
    * check is one node-keyed equi-join + max aggregate per round over
    * the two materialized rank frames — a scalar leaves the cluster,
    * never the frame; it runs on EVERY round including the last, so
    * the returned flag distinguishes "converged exactly at the cap"
    * from "cap hit while still moving" — the signal a retrain log
    * needs to decide whether to raise the iteration budget. Returns
    * (ranks, rounds actually run, converged); with `tolFp = 0` the
    * flag is always false (no tolerance to converge against).
    */
  def trainConverged(nodes: DataFrame, edges: DataFrame, maxIters: Int,
      tolFp: Long, dampingPct: Int = 85): (DataFrame, Int, Boolean) = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    require(tolFp >= 0L, s"tolFp must be >= 0, got $tolFp")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100], got $dampingPct")
    val base = (100L - dampingPct) * 10000L
    // the caller's node frame is read exactly ONCE (r0); every later
    // round derives its node set from the PREVIOUS round's already-
    // materialized rank frame, so an expensive caller derivation
    // (e.g. the snapshot union-distinct) never re-executes per round
    // and no extra barrier is paid for it
    var ranks = nodes.select(col("node"), lit(1000000L).as("rank_fp"))
      .transform(Exec.materialize)
    // the uniform-share divisor; a scalar off the materialized frame
    val nNodes = ranks.count()
    if (nNodes == 0L) {
      // empty graph: the fixed point is the empty frame — returning it
      // beats evaluating `DIV 0` under ANSI in the dangling share
      return (ranks, 0, tolFp > 0L)
    }
    val withDeg = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .transform(Exec.materialize)
    val srcs = withDeg.select("src").distinct()
      .transform(Exec.materialize)
    var rounds = 0
    var converged = false
    while (rounds < maxIters && !converged) {
      // dangling mass: rank held by nodes with no outgoing edge,
      // folded back uniformly (1-row frame, broadcast into the round)
      val dang = ranks
        .join(srcs, ranks("node") === srcs("src"), "left_anti")
        .agg(coalesce(sum("rank_fp"), lit(0L)).as("d"))
        .select(expr(s"d DIV $nNodes").as("dd"))
      val sums = withDeg
        .join(ranks, withDeg("src") === ranks("node"))
        .select(col("dst"), expr("rank_fp DIV outdeg").as("c"))
        .groupBy("dst").agg(sum("c").as("in_sum"))
      val nodesR = ranks.select(col("node"))
      val next = nodesR
        .join(sums, nodesR("node") === sums("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(nodesR("node"),
          (lit(base) + expr(
            s"($dampingPct * (coalesce(in_sum, 0L) + dd)) DIV 100"))
            .cast(LongType).as("rank_fp"))
        .transform(Exec.materialize)
      rounds += 1
      if (tolFp > 0L) {
        val moved = next.join(
            ranks.select(col("node").as("pnode"),
              col("rank_fp").as("prev_fp")),
            next("node") === col("pnode"))
          .agg(coalesce(max(abs(col("rank_fp") - col("prev_fp"))),
            lit(0L)))
          .first().getLong(0)
        converged = moved < tolFp
      }
      Exec.release(ranks) // previous round is consumed
      ranks = next
    }
    Exec.release(withDeg)
    Exec.release(srcs)
    (ranks, rounds, converged)
  }
}
