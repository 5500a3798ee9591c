package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic mergeable quantile HISTOGRAM (HdrHistogram-style
  * log-linear buckets) over non-negative fixed-point longs — the third
  * leg of the percentile trio: q43's exact per-group sort is the
  * audit, q68's KLL-style approx_percentile is the engine-specific
  * sketch (rows-only by design), and THIS is the deterministic scale
  * path that stays ORACLE-EXACT: bucket ids come from the exact
  * integer floor-log2 (`length(bin(x)) − 1` — the q113 trick) plus the
  * mantissa's top [[DefaultSigBits]] bits, so two engines, two
  * partitionings, or two days of a stream produce byte-identical
  * histograms, and histograms MERGE by cell-wise addition (the
  * CountMin property, applied to ranks).
  *
  * Error contract: values below 2^p map to themselves (exact); above,
  * a bucket spans 2^(ilog2(x)−p), i.e. relative width ≤ 2^−p (~3.1%
  * at the default p = 5). A quantile answer is its bucket's LOWER
  * bound — a true value v in the bucket satisfies lb ≤ v < lb·(1+2^−p)
  * + 1. The whole structure is ≤ (64−p)·2^p + 2^p buckets (≈ 1.9k at
  * p = 5) per group — KBs at any corpus size, which is the scale
  * argument: per-partition histograms partial-aggregate map-side; the
  * exchange carries cell counts, never values; the quantile walk runs
  * over the KB-scale histogram, never re-sorting the corpus. This is
  * also the 100 TB form of every "global ntile / percentile cut" in
  * the registry (q113's terciles, q77's quartiles): cut points come
  * off the histogram as broadcast literals.
  *
  * Expressions are built as SQL text over a COLUMN NAME (the variable
  * shift distances rule out the typed `shiftleft(Column, Int)` API),
  * which also keeps the Spark plan and the DuckDB oracle line-for-line
  * comparable.
  */
object QuantileSketch {

  /** Mantissa bits kept per bucket: relative error ≤ 2^−5 ≈ 3.1%. */
  val DefaultSigBits = 5

  /** Bucket id for non-negative long column `x`: x < 2^p → x (exact
    * region); else (ilog2(x) − p)·2^p + (x >> (ilog2(x) − p)).
    * Monotone nondecreasing in x, so rank queries respect value order.
    */
  def bucketExpr(x: String, p: Int = DefaultSigBits): Column = {
    val w = 1L << p
    expr(s"""CASE WHEN $x < $w THEN $x ELSE
      (length(bin($x)) - ${1 + p}) * $w +
      ($x div shiftleft(cast(1 as bigint),
        cast(length(bin($x)) - ${1 + p} as int))) END""")
  }

  /** A bucket id's lower bound (the reported quantile value):
    * id < 2^p → id; else ((id % 2^p) + 2^p) << (id div 2^p − 1).
    */
  def lowerBoundExpr(bucket: String, p: Int = DefaultSigBits): Column = {
    val w = 1L << p
    expr(s"""CASE WHEN $bucket < $w THEN $bucket ELSE
      shiftleft($bucket % $w + $w, cast($bucket div $w - 1 as int)) END""")
  }

  /** Per-group histograms in ONE pass: (groupCols…, bucket, n). */
  def build(values: DataFrame, valueCol: String,
      groupCols: Seq[String] = Seq.empty,
      p: Int = DefaultSigBits): DataFrame =
    values
      .select(groupCols.map(col) :+
        bucketExpr(valueCol, p).cast("long").as("bucket"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("n"))

  /** Merge histograms with the SAME (groupCols, p): cell-wise sum. */
  def merge(a: DataFrame, b: DataFrame,
      groupCols: Seq[String] = Seq.empty): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(sum(col("n")).as("n"))

  /** Quantile answers off the histogram: for each group and each
    * (label, num, den) quantile, the LOWER BOUND of the first bucket
    * whose cumulative count reaches rank ⌈n·num/den⌉ — all-integer
    * arithmetic (the rank is an exact ceiling division), so the walk
    * is bit-stable cross-engine. The cumulative window partitions by
    * group over the KB-scale histogram; the quantile frame broadcasts.
    * Returns (groupCols…, quantile, value_fp).
    */
  def quantiles(hist: DataFrame, groupCols: Seq[String],
      qs: Seq[(String, Long, Long)],
      p: Int = DefaultSigBits): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    // Empty-group walks still run over the KB-scale histogram, but an
    // explicit constant-valued partition key keeps the plan free of
    // the `WindowExec: No Partition Defined` warning (the registry's
    // scale-killer scan greps for it; a bounded ≤1.9k-row frame must
    // not trip the same alarm as a corpus-sized one). `bucket % 1` —
    // not `lit(0)`, which Catalyst folds away and the warning returns.
    def byGroup = if (groupCols.isEmpty)
      Window.partitionBy(pmod(col("bucket"), lit(1)))
      else Window.partitionBy(groupCols.map(col): _*)
    val cum = hist
      .withColumn("cum", sum(col("n")).over(byGroup.orderBy("bucket")))
      .withColumn("total", sum(col("n")).over(byGroup))
    val qdf = qs.toDF("quantile", "num", "den")
    cum.join(broadcast(qdf),
        expr("cum >= (total * num + den - 1) div den"))
      .groupBy((groupCols :+ "quantile").map(col): _*)
      .agg(min(col("bucket")).as("bucket"))
      .select(groupCols.map(col) :+ col("quantile") :+
        lowerBoundExpr("bucket", p).cast("long").as("value_fp"): _*)
  }
}
