package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Disk-backed IVF index — the AT-REST form of the inverted-file ANN
  * the query-side operators assume (q40/q85 say "the inverted list is
  * the partition column at rest"; this materializes it). The index is
  * plain partitioned parquet: every vector stored under its
  * argmax-cosine centroid's `cid=<n>` directory, so a query that
  * probes `nprobe` lists READS `nprobe` partitions off disk —
  * partition pruning in the scan, not a post-hoc filter — and the rest
  * of a 100 TB corpus is never touched. Centroids are the small object
  * (k × dim doubles — KB to MB); they ride the driver/broadcast,
  * exactly as q87's trainer produces them.
  *
  * Scoring uses the same native `cosine_sim` kernel as the query
  * operators, with ties broken on centroid id, so index assignment,
  * probe selection, and re-ranking can never disagree about order.
  */
object AnnIndex {

  private def centroidFrame(spark: SparkSession,
      centroids: Seq[(Int, Array[Double])]): DataFrame = {
    import spark.implicits._
    centroids.map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cid", "cv")
  }

  /** The index's assignment rule: each vector to its argmax-cosine
    * centroid (ties → lowest cid). ONE definition shared by
    * [[writeIndex]] and the streaming appender
    * ([[graft.streaming.Streams.indexIngestStream]]) — a streamed
    * vector must land in exactly the list a rebuild would choose.
    * Returns (vec_id, v, cid).
    */
  def assignByCosine(embeddings: DataFrame,
      centroids: Seq[(Int, Array[Double])]): DataFrame = {
    val spark = embeddings.sparkSession
    graft.functions.Functions.register(spark)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("csim"), col("cid"))
    embeddings.select("vec_id", "v")
      .crossJoin(broadcast(centroidFrame(spark, centroids)))
      .withColumn("csim", expr("cosine_sim(v, cv)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cid"))
  }

  /** Write the index: one [[assignByCosine]] pass then
    * `partitionBy(cid)` parquet. The pre-write `repartition(cid)` makes
    * each inverted list a contiguous file set instead of one sliver per
    * upstream task. `embeddings` must have (`vec_id` long,
    * `v` array<double>).
    */
  def writeIndex(embeddings: DataFrame,
      centroids: Seq[(Int, Array[Double])], dir: String): Unit =
    assignByCosine(embeddings, centroids)
      .repartition(col("cid"))
      .write.mode(SaveMode.Overwrite).partitionBy("cid").parquet(dir)

  /** The `nprobe` list ids nearest to `query` — driver-side over the
    * small centroid set, same (cosine desc, cid asc) order as the
    * assignment window.
    */
  def probeLists(query: Array[Double],
      centroids: Seq[(Int, Array[Double])], nprobe: Int): Seq[Int] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    centroids.map { case (cid, cv) => (cid, cos(query, cv)) }
      .sortBy { case (cid, c) => (-c, cid) }
      .take(nprobe).map(_._1)
  }

  /** Top-k by cosine against the probed lists ONLY: the `cid` filter is
    * a partition filter — the scan opens `nprobe` directories of the
    * index and no others (LayoutSpec pins `PartitionFilters` + the
    * file count) — and the re-rank lowers to TakeOrderedAndProject.
    */
  def topK(spark: SparkSession, indexDir: String, query: Array[Double],
      centroids: Seq[(Int, Array[Double])], k: Int,
      nprobe: Int): DataFrame = {
    graft.functions.Functions.register(spark)
    val probes = probeLists(query, centroids, nprobe)
    spark.read.parquet(indexDir)
      .filter(col("cid").isin(probes: _*))
      .withColumn("qv", typedLit(query.toSeq))
      .select(col("vec_id"), col("cid").cast("int").as("cid"),
        expr("cosine_sim(v, qv)").as("cosine"))
      .orderBy(desc("cosine"), col("vec_id"))
      .limit(k)
  }

  /** Batch serving — the q84/q85 query-SET shape against the AT-REST
    * index: all queries' probe lists union into ONE partition filter
    * (the scan still opens only probed directories, once, shared by
    * every query), a broadcast (query, probed-cid, vector) frame
    * equi-joins each index row to exactly the queries probing its list
    * (never all-pairs), and the per-query top-k is the q84 window with
    * its partial WindowGroupLimit prune. Per-query answers are
    * IDENTICAL to one [[topK]] call each — LayoutSpec pins it — for
    * the cost of a single index pass.
    */
  def topKBatch(spark: SparkSession, indexDir: String,
      queries: Seq[(Long, Array[Double])],
      centroids: Seq[(Int, Array[Double])], k: Int,
      nprobe: Int): DataFrame = {
    graft.functions.Functions.register(spark)
    import spark.implicits._
    val probeRows = queries.flatMap { case (qid, qv) =>
      probeLists(qv, centroids, nprobe)
        .map(cid => (qid, cid, qv.toSeq))
    }
    val pdf = probeRows.toDF("query_id", "cid", "qv")
    val cids = probeRows.map(_._2).distinct
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cosine"), col("vec_id"))
    spark.read.parquet(indexDir)
      .filter(col("cid").isin(cids: _*))
      .join(broadcast(pdf), "cid")
      .select(col("query_id"), col("vec_id"),
        expr("cosine_sim(v, qv)").as("cosine"))
      .withColumn("rank_n", row_number().over(w).cast("long"))
      .filter(col("rank_n") <= k)
      .orderBy("query_id", "rank_n")
  }
}
