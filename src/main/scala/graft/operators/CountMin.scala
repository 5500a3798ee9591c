package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Count-min sketch (Cormode & Muthukrishnan 2005) over a key column —
  * the MERGEABLE heavy-hitter/frequency structure that flanks the
  * exact q102 skew profile at 100 TB: the exact profile is one
  * full-width groupBy per audit; the sketch is a fixed `depth × width`
  * cell grid (4 × 1024 longs here — KBs) that partial-aggregates
  * map-side, merges across partitions, files, days, and streaming
  * micro-batches by plain cell-wise addition, and answers any key's
  * frequency with the one-sided guarantee `estimate ≥ true count`
  * (collisions only ever ADD). Sized by the standard ε–δ bounds
  * (width ≈ e/ε, depth ≈ ln 1/δ); at any corpus size the sketch is
  * the same few KBs, which is the whole scale argument.
  *
  * Deterministic by construction — the bucket hash is the corpus-wide
  * md5 60-bit parity trick ([[graft.queries.LlmPipeline]]'s shingle
  * hash: `conv(substr(md5(…), 1, 15), 16, 10)`), byte-identical in
  * DuckDB — so unlike an HLL register set the WHOLE sketch is
  * oracle-exact: q114 hash-matches its cells and estimates against
  * plain SQL. No sampling, no RNG, no engine-specific state.
  */
object CountMin {

  val DefaultDepth = 4
  val DefaultWidth = 1024

  /** Row `i`'s bucket for a key: 60-bit integer view of
    * md5("<i>:<key>") mod `width` — one md5 per (key, row), salted by
    * the row index so the depth rows are independent hash functions.
    */
  def bucketCol(key: Column, i: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$i:"), key.cast("string"))), 1, 15),
      16, 10).cast(LongType) % width

  /** Build the sketch in ONE pass over `keys`: explode each key into
    * its `depth` (row, bucket) cells, count per cell. Output is at
    * most `depth × width` rows (cells never touched are absent =
    * zero); the exchange carries only the partial cell counts.
    * Defined as the weight-1 case of [[buildWeighted]] so the
    * bucketing plumbing exists exactly once.
    */
  def build(keys: DataFrame, keyCol: String,
      depth: Int = DefaultDepth, width: Int = DefaultWidth): DataFrame =
    buildWeighted(keys.select(col(keyCol), lit(1L).as("__w")),
      keyCol, "__w", depth, width)

  /** [[build]] from PRE-AGGREGATED (key, count) rows — cell values are
    * the SUM of member-key counts, identical to building from the raw
    * stream (a cell's count is exactly the total of the keys hashing
    * into it). For a pipeline that already maintains per-key partials
    * (q114's exact audit leg, a dimension's statistics table), this
    * skips the second corpus scan: the sketch derives from the
    * key-cardinality-sized frame instead.
    */
  def buildWeighted(counts: DataFrame, keyCol: String, nCol: String,
      depth: Int = DefaultDepth, width: Int = DefaultWidth): DataFrame =
    counts.select(col(nCol), posexplode(array(
        (0 until depth).map(i => bucketCol(col(keyCol), i, width)): _*))
      .as(Seq("i", "bucket")))
      .groupBy("i", "bucket").agg(sum(col(nCol)).as("n"))

  /** Merge sketches built with the SAME (depth, width): cell-wise sum.
    * This is the scale lever — per-partition / per-day / per-batch
    * sketches combine associatively, so a year of daily sketches folds
    * into one without ever re-reading the corpus.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("i", "bucket").agg(sum(col("n")).as("n"))

  /** Point estimates for `probes`' keys: min over the key's `depth`
    * cells, absent cells counting zero. The probe side explodes to
    * `|probes| × depth` rows and joins the (≤ depth × width)-row
    * sketch — broadcast-sized by construction. Returns (keyCol,
    * n_est); `estimate ≥ true count` always (one-sided error).
    */
  def estimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = DefaultDepth, width: Int = DefaultWidth): DataFrame =
    probes.select(col(keyCol), posexplode(array(
        (0 until depth).map(i => bucketCol(col(keyCol), i, width)): _*))
      .as(Seq("i", "bucket")))
      .join(broadcast(sketch), Seq("i", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("n"), lit(0L))).as("n_est"))
}
