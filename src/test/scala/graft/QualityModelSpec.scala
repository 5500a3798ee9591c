package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.QualityModel

/** Laws for the model-based quality classifier (q110/q111's operator):
  * closed-form hashed-feature linear scorer distilled from the Gopher
  * heuristic. The oracle pins cross-engine exactness; these pin the
  * operator-level laws the oracle can't see — literal-serving parity,
  * determinism, the map-only serving plan, and that the model actually
  * LEARNED the rule it was distilled from.
  */
class QualityModelSpec extends SparkSuite {

  private val Dims = 512

  // The same labeled domain q110/q111 use: tokenized docs + the q54
  // gopher label, rebuilt here from the raw table (independent
  // derivation — a drift in the shared helpers shows up as a law
  // failure, not silent agreement).
  private lazy val labeled: DataFrame = {
    val toks = "regexp_extract_all(lower(text), '\\\\w+', 0)"
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), expr(toks).as("toks"))
      .filter(size(col("toks")) >= 1)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("mean_tok_len",
        expr("cast(aggregate(transform(toks, x -> length(x)), 0, " +
          "(a, x) -> a + x) as double)") / col("n_tokens").cast("double"))
      .withColumn("alpha_ratio",
        expr("cast(size(filter(toks, x -> x rlike '^[a-z]+$')) as double)")
          / col("n_tokens").cast("double"))
      .withColumn("distinct_ratio",
        size(array_distinct(col("toks"))).cast("double")
          / col("n_tokens").cast("double"))
      .withColumn("y",
        col("n_tokens") >= 40 && col("n_tokens") <= 100000 &&
          col("mean_tok_len") >= 3.5 && col("mean_tok_len") <= 5.5 &&
          col("distinct_ratio") >= 0.3 && col("alpha_ratio") >= 0.9)
  }

  private lazy val weights = QualityModel.train(labeled, "toks", "y", Dims)
  private lazy val (tPos, tNeg) = {
    val r = QualityModel.classTotals(labeled, "y").collect()(0)
    (r.getLong(0), r.getLong(1))
  }
  private lazy val thFp = QualityModel
    .threshold(labeled, "toks", "y", weights, Dims).collect()(0).getLong(0)

  test("weights are bounded fixed-point rates over observed feature ids") {
    val rows = weights.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (fid, nPos, nNeg, w) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(fid >= 0 && fid < Dims)
      assert(nPos >= 0 && nPos <= tPos)
      assert(nNeg >= 0 && nNeg <= tNeg)
      // each q6(rate) is in [0, 1e6], so the difference is in ±1e6
      assert(math.abs(w) <= 1000000L)
    }
    // feature ids are unique (groupBy key)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("sufficient statistics: weightsOf(countsOf) equals train bit for " +
    "bit, and cell-wise merged disjoint-cohort stats equal the union's") {
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val viaStats = QualityModel.weightsOf(
      QualityModel.countsOf(labeled, "toks", "y", Dims))
    assert(rows(viaStats) === rows(weights),
      "the stats-derived weights diverged from train")
    // mergeability — the streaming-maintainer law at operator level:
    // stats over doc_id-parity cohorts, merged, must equal the union's
    val merged = QualityModel.mergeCounts(
      QualityModel.countsOf(labeled.filter(col("doc_id") % 2 === 0),
        "toks", "y", Dims),
      QualityModel.countsOf(labeled.filter(col("doc_id") % 2 =!= 0),
        "toks", "y", Dims))
    assert(rows(QualityModel.weightsOf(merged)) === rows(weights),
      "merged cohort stats diverged from one-shot training")
  }

  test("training is deterministic: two independent fits are identical") {
    val a = QualityModel.train(labeled, "toks", "y", Dims)
      .orderBy("fid").collect().toSeq
    val b = QualityModel.train(labeled, "toks", "y", Dims)
      .orderBy("fid").collect().toSeq
    assert(a == b)
  }

  test("literal-model serving equals broadcast-join scoring bit for bit") {
    val joined = QualityModel.score(labeled, "toks", weights, thFp, Dims)
      .orderBy("doc_id").collect().toSeq
    val dense = QualityModel.collectWeights(weights, Dims)
    val lit = QualityModel.scoreLiteral(labeled, "toks", dense, thFp, Dims)
      .orderBy("doc_id").collect().toSeq
    assert(joined.nonEmpty)
    assert(joined == lit)
  }

  test("lazy in-plan threshold equals the collected-threshold form") {
    val a = QualityModel.score(labeled, "toks", weights, thFp, Dims)
      .orderBy("doc_id").collect().toSeq
    val b = QualityModel.scoreWithThreshold(labeled, "toks", weights,
        QualityModel.threshold(labeled, "toks", "y", weights, Dims), Dims)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("literal serving is map-only: no shuffle exchange, no join") {
    val dense = QualityModel.collectWeights(weights, Dims)
    val plan = QualityModel
      .scoreLiteral(labeled.select("doc_id", "toks"), "toks", dense,
        thFp, Dims)
      .queryExecution.executedPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"literal scorer must not shuffle:\n$plan")
    assert(!plan.toString.contains("Join"),
      s"literal scorer must not join:\n$plan")
  }

  test("the distilled model learns the heuristic: train-set agreement") {
    val scored = QualityModel.score(labeled, "toks", weights, thFp, Dims)
      .join(labeled.select("doc_id", "y"), "doc_id")
    val n = scored.count()
    val agree = scored.filter(col("predicted") === col("y")).count()
    assert(n == tPos + tNeg)
    // hashed 512-dim presence features + the learned centroid-midpoint
    // threshold must beat the majority-class floor (a prior-bias scorer
    // provably sits AT the floor here — the length confound)
    val majority = math.max(tPos, tNeg).toDouble / n.toDouble
    val acc = agree.toDouble / n.toDouble
    assert(acc > majority,
      s"agreement $acc must beat the majority floor $majority")
    assert(acc >= 0.68, s"agreement $acc below the pinned sf0.001 floor")
  }

  test("scoring fresh data with unseen features degrades to -threshold") {
    import spark.implicits._
    val fresh = Seq((9001L, Seq("zzzqx"))).toDF("doc_id", "toks")
    // a model trained with NO features: every weight missing → wsum 0
    val empty = weights.filter(lit(false))
    val r = QualityModel.score(fresh, "toks", empty, thFp, Dims)
      .collect()(0)
    assert(r.getLong(1) == -thFp)
  }

  test("threshold sits strictly between the class centroids") {
    val raw = QualityModel.rawScores(labeled, "toks", weights, Dims)
      .join(labeled.select("doc_id", "y"), "doc_id")
    val Array(cPos, cNeg) = raw.groupBy("y")
      .agg(avg(col("wmean")).as("c")).orderBy(desc("y"))
      .collect().map(_.getDouble(1))
    assert((thFp - cPos) * (thFp - cNeg) <= 0,
      s"threshold $thFp must lie between centroids $cPos / $cNeg")
  }
}
