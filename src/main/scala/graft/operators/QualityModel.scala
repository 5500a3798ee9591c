package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Model-based document quality filtering — the "train a cheap linear
  * classifier, score the whole corpus" stage every production
  * training-data pipeline runs after its heuristics (CCNet's fastText
  * filter, fineweb-edu's distilled classifier). The reference
  * warehouse has no model stage at all (its quality surface is the
  * validation contract in `etl/app.py:61-96`); this is the
  * beyond-reference LLM-pipeline form: labels come from an upstream
  * heuristic (here the shared Gopher-style rule of q54 — weak
  * supervision / rule distillation), features are HASHED token
  * presence (a fastText-style hashing-trick bag of words: md5 → 16-bit
  * integer → mod `dims`, so the feature space is fixed-width and the
  * model is KB-scale no matter the corpus vocabulary), and the model
  * is closed-form:
  *
  *   weights  w_f = q6((pos_f+1)/(POS+2)) − q6((neg_f+1)/(NEG+2))
  *   doc score    = floor(MEAN of w_f over the doc's DISTINCT features)
  *   threshold th = floor((c_pos + c_neg) / 2),  c_k = floor-mean doc
  *                  score of class k  (1-D nearest-class-centroid)
  *   predict good iff  score − th > 0
  *
  * with q6(x) = floor(x·10^6) (1e-6 fixed point). Two deliberate
  * choices, both learned from degenerate first cuts: the MEAN, not the
  * sum — presence-feature sums scale with document length, so a
  * sum-scorer is a length detector (the fastText-average rationale);
  * and a LEARNED threshold, not a prior bias — long documents cover
  * more of the hashed feature space, which inflates every feature's
  * positive-class rate by the same length confound, so the raw scores
  * of both classes sit far from zero and only their midpoint separates
  * them (the 1-D Fisher/LDA decision rule with equal class spread).
  *
  * Determinism doctrine (the q52/q61 family): every arithmetic step is
  * IEEE-exact — long counts, correctly-rounded double division and
  * long→double conversion, exact floor — and per-document/per-class
  * sums are INTEGER sums, reduce-order-independent, so the whole
  * train→threshold→score path is ORACLE-EXACT (q110/q111 replay it in
  * DuckDB CTEs bit-for-bit). No log/exp/sigmoid anywhere: a monotone
  * transform never changes a threshold test, and libm last-ulp drift
  * would break cross-engine hashing.
  *
  * Scale posture at 100 TB: [[train]] is ONE corpus scan — features
  * are deduplicated scan-side (array_distinct in-projection, never a
  * distinct-aggregate Expand), the only exchange carries ≤ 2·dims
  * partially-aggregated (fid, counts) rows, and class totals ride a
  * 1-row broadcast; [[threshold]] is a second scan ending in a 1-row
  * aggregate. The fitted model is ≤ dims weight rows + 1 threshold
  * (KBs) — [[scoreWithThreshold]] broadcasts it; [[scoreLiteral]]
  * goes further and embeds it as plan literals (the Pq-codebook
  * pattern): scoring is then a pure map-side projection with NO join
  * and NO shuffle, which is also exactly the form a streaming
  * curation feed wants (stateless, no watermark interaction).
  */
object QualityModel {

  /** Hashed-presence feature array of a token-array column: distinct
    * `md5(token) → 16-bit → mod dims` ids, deduplicated in the same
    * projection (one pass per row; cardinality ≤ min(#tokens, dims)).
    */
  def featuresExpr(toksCol: String, dims: Int): Column =
    expr(featuresExprSql(toksCol, dims))

  /** (doc_id, fid) rows — one per distinct hashed feature per doc. */
  def featurize(labeled: DataFrame, toksCol: String,
      dims: Int): DataFrame = {
    graft.functions.Functions.register(labeled.sparkSession)
    labeled.select(col("doc_id"),
      explode(featuresExpr(toksCol, dims)).as("fid"))
  }

  /** 1-row class totals (t_pos, t_neg) of a boolean-labeled frame. */
  def classTotals(labeled: DataFrame, labelCol: String): DataFrame =
    labeled.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("t_pos"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("t_neg"))

  private[operators] def q6(x: Column): Column =
    floor(x * lit(1000000.0)).cast(LongType)

  /** THE model family's weight formula — the Laplace-smoothed
    * class-rate difference in 1e-6 fixed point, shared by [[train]],
    * [[weightsOf]], and [[LangId.train]] (one definition, so the
    * one-vs-rest lift can never drift from the binary model).
    */
  private[operators] def laplaceWeightFp(nPos: Column, nNeg: Column,
      tPos: Column, tNeg: Column): Column =
    q6((nPos + lit(1L)).cast(DoubleType) /
        (tPos + lit(2L)).cast(DoubleType)) -
      q6((nNeg + lit(1L)).cast(DoubleType) /
        (tNeg + lit(2L)).cast(DoubleType))

  /** The model's SUFFICIENT STATISTICS over a labeled frame — per
    * observed feature id the class counts (fid, n_pos, n_neg), plus a
    * sentinel fid = −1 row carrying the class DOC totals (feature ids
    * are `md5 mod dims` ∈ [0, dims), so −1 can never collide). Every
    * cell is an integer COUNT, so two frames over disjoint corpora
    * merge by cell-wise addition ([[mergeCounts]]) into exactly the
    * stats of the union — the mergeability that puts this model on the
    * streaming versioned-snapshot loop beside the count-min/quantile
    * sketches. Bounded: ≤ dims + 1 rows (KBs) whatever the corpus.
    */
  def countsOf(labeled: DataFrame, toksCol: String, labelCol: String,
      dims: Int): DataFrame = {
    graft.functions.Functions.register(labeled.sparkSession)
    labeled.select(col("doc_id"), col(labelCol).as("y"),
        explode(featuresExpr(toksCol, dims)).as("fid"))
      .groupBy("fid")
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("y"), 0L).otherwise(1L)).as("n_neg"))
      .unionByName(classTotals(labeled, labelCol)
        .select(lit(-1L).as("fid"), col("t_pos").as("n_pos"),
          col("t_neg").as("n_neg")))
  }

  /** Cell-wise addition of two [[countsOf]] frames: integer sums are
    * associative/commutative, so any batching of a corpus folds to the
    * one-shot stats bit-for-bit.
    */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("fid")
      .agg(sum(col("n_pos")).as("n_pos"), sum(col("n_neg")).as("n_neg"))

  /** Derive the fitted weights from a [[countsOf]] stats frame — the
    * Laplace-smoothed class-rate difference in 1e-6 fixed point. The
    * stats are the model: weights from merged streamed stats are
    * BIT-IDENTICAL to [[train]] on the union corpus (same integer
    * counts in, same IEEE-exact formula).
    */
  def weightsOf(counts: DataFrame): DataFrame =
    counts.filter(col("fid") =!= lit(-1L))
      .crossJoin(broadcast(counts.filter(col("fid") === lit(-1L))
        .select(col("n_pos").as("t_pos"), col("n_neg").as("t_neg"))))
      .select(col("fid"), col("n_pos"), col("n_neg"),
        laplaceWeightFp(col("n_pos"), col("n_neg"), col("t_pos"),
          col("t_neg")).as("weight_fp"))

  /** Fit the weights: (fid, n_pos, n_neg, weight_fp), one row per
    * OBSERVED feature id, weight in 1e-6 fixed point. `labeled` must
    * carry doc_id, a token-array column, and a boolean label column
    * (restrict it to tokenized docs — the same domain the labels were
    * computed over, with both classes present).
    *
    * ≡ `weightsOf(countsOf(labeled, …))` bit-for-bit (same integer
    * counts, same IEEE-exact formula — QualityModelSpec pins the law),
    * but kept as its own two-scan plan: [[weightsOf]] references its
    * stats frame twice (weight rows + the totals broadcast), which is
    * free over a KB-scale committed snapshot file but would re-run the
    * corpus featurization here (Catalyst re-executes a subplan per
    * reference), and train must stay LAZY (SqlSurface registration
    * contract for q110; q111 feeds it a materialized frame since r21).
    */
  def train(labeled: DataFrame, toksCol: String, labelCol: String,
      dims: Int): DataFrame = {
    graft.functions.Functions.register(labeled.sparkSession)
    val feats = labeled.select(col("doc_id"), col(labelCol).as("y"),
      explode(featuresExpr(toksCol, dims)).as("fid"))
    feats.groupBy("fid")
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("y"), 0L).otherwise(1L)).as("n_neg"))
      .crossJoin(broadcast(classTotals(labeled, labelCol)))
      .select(col("fid"), col("n_pos"), col("n_neg"),
        laplaceWeightFp(col("n_pos"), col("n_neg"), col("t_pos"),
          col("t_neg")).as("weight_fp"))
  }

  /** Raw per-doc scores (doc_id, wmean): floor-mean of the doc's
    * distinct-feature weights via a broadcast left join (features
    * missing from the model — possible on fresh data, never when
    * scoring the training corpus — contribute 0).
    */
  def rawScores(docs: DataFrame, toksCol: String, weights: DataFrame,
      dims: Int): DataFrame =
    featurize(docs, toksCol, dims)
      .join(broadcast(weights.select("fid", "weight_fp")), Seq("fid"),
        "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("weight_fp"), lit(0L))).as("wsum"),
        count(lit(1)).as("nf"))
      .select(col("doc_id"), wmean.as("wmean"))

  /** Learn the decision threshold: 1-row (th_fp) — the midpoint of
    * the two class-centroid raw scores over the labeled training
    * frame. Each centroid is an exact integer sum + correctly-rounded
    * division + exact floor; so is the midpoint.
    */
  def threshold(labeled: DataFrame, toksCol: String, labelCol: String,
      weights: DataFrame, dims: Int): DataFrame =
    thresholdOfRaw(
      rawScores(labeled, toksCol, weights, dims)
        .join(labeled.select(col("doc_id"), col(labelCol).as("__y")),
          "doc_id"), "__y")

  /** The [[threshold]] aggregate over an ALREADY-SCORED labeled frame
    * (doc_id, wmean, labelCol) — split out (r21) so a caller that
    * materializes its raw-score frame once (q111) derives the
    * threshold from the SAME integers without a second scoring pass;
    * [[threshold]] is defined through this, so the formula cannot
    * drift.
    */
  def thresholdOfRaw(rawWithLabel: DataFrame,
      labelCol: String): DataFrame =
    rawWithLabel
      .agg(
        floor(sum(when(col(labelCol), col("wmean"))).cast(DoubleType) /
          sum(when(col(labelCol), 1L).otherwise(0L)).cast(DoubleType))
          .cast(LongType).as("c_pos"),
        floor(sum(when(!col(labelCol), col("wmean"))).cast(DoubleType) /
          sum(when(!col(labelCol), 1L).otherwise(0L)).cast(DoubleType))
          .cast(LongType).as("c_neg"))
      .select(floor((col("c_pos") + col("c_neg")).cast(DoubleType)
        / lit(2.0)).cast(LongType).as("th_fp"))

  /** Score with a collected threshold: (doc_id, score_fp, predicted)
    * where score_fp = wmean − th and predicted = score_fp > 0.
    */
  def score(docs: DataFrame, toksCol: String, weights: DataFrame,
      thFp: Long, dims: Int): DataFrame =
    rawScores(docs, toksCol, weights, dims)
      .select(col("doc_id"),
        (col("wmean") - lit(thFp)).as("score_fp"),
        (col("wmean") - lit(thFp) > lit(0L)).as("predicted"))

  /** [[score]] with the threshold riding a 1-row broadcast cross join
    * — fully lazy (no driver collect at DataFrame-build time: the
    * SqlSurface registration contract), same integers bit for bit.
    */
  def scoreWithThreshold(docs: DataFrame, toksCol: String,
      weights: DataFrame, thresholdDf: DataFrame,
      dims: Int): DataFrame =
    scoreOfRaw(rawScores(docs, toksCol, weights, dims), thresholdDf)

  /** The [[scoreWithThreshold]] projection over an ALREADY-SCORED
    * frame (doc_id, wmean, …) — split out (r21) for callers that
    * materialize their raw scores once (q111); extra columns pass
    * through. [[scoreWithThreshold]] is defined through this, so the
    * score/predict formula cannot drift.
    */
  def scoreOfRaw(raw: DataFrame, thresholdDf: DataFrame): DataFrame =
    raw
      .crossJoin(broadcast(thresholdDf))
      .select(Seq(col("doc_id"),
        (col("wmean") - col("th_fp")).as("score_fp"),
        (col("wmean") - col("th_fp") > lit(0L)).as("predicted")) ++
        raw.columns.filter(c => c != "doc_id" && c != "wmean")
          .map(col): _*)

  /** floor-mean of the per-doc weight sum — deterministic cross-engine
    * at any magnitude (long→double conversion and division are both
    * correctly rounded in IEEE-754; floor is exact), and bit-exact for
    * these magnitudes (|wsum| ≤ dims·10^6 ≪ 2^53).
    */
  private def wmean: Column =
    floor(col("wsum").cast(DoubleType) / col("nf").cast(DoubleType))
      .cast(LongType)

  /** Collect a fitted model into a dims-sized dense weight vector
    * (absent features → 0) — ≤ dims rows, KB-scale by construction:
    * the bounded-collect contract of the Pq codebook / KMeans
    * centroid frames.
    */
  def collectWeights(weights: DataFrame, dims: Int): Seq[Long] = {
    val dense = Array.fill[Long](dims)(0L)
    weights.select("fid", "weight_fp").collect().foreach { r =>
      dense(r.getLong(0).toInt) = r.getLong(1)
    }
    dense.toSeq
  }

  /** Literal-model scoring — the serving form: the dense weight vector
    * and threshold ride the plan as literals and each doc folds its
    * distinct feature ids through ONE `aggregate(...)` whose struct
    * accumulator carries (sum, count), so the feature array is
    * evaluated once — a pure map-side projection, NO join, NO
    * exchange (spec-pinned). Identical output to [[score]] on any
    * frame (bit-exact: same integer sums, same floor-mean).
    */
  def scoreLiteral(docs: DataFrame, toksCol: String,
      denseWeights: Seq[Long], thFp: Long, dims: Int): DataFrame = {
    require(denseWeights.size == dims,
      s"dense weight vector must have size $dims")
    graft.functions.Functions.register(docs.sparkSession)
    docs
      .withColumn("__w", typedLit(denseWeights))
      .select(col("doc_id"),
        expr(scoreFoldSql(featuresExprSql(toksCol, dims), thFp))
          .as("score_fp"))
      .withColumn("predicted", col("score_fp") > lit(0L))
  }

  /** The streaming/ingest quality GATE: tokenize `textCol` inline,
    * score with the literal model, keep only rows the model predicts
    * good (untokenizable rows drop too — they are outside the model's
    * domain, the same ≥ 1-token rule training uses). Stateless
    * per-row projection + filter: safe on a streaming DataFrame (no
    * state, no watermark interaction), all other columns pass
    * through untouched.
    */
  def keepGood(docs: DataFrame, textCol: String,
      denseWeights: Seq[Long], thFp: Long, dims: Int): DataFrame = {
    require(denseWeights.size == dims,
      s"dense weight vector must have size $dims")
    graft.functions.Functions.register(docs.sparkSession)
    val toks = s"word_toks($textCol)"
    docs
      .withColumn("__w", typedLit(denseWeights))
      .withColumn("__toks", expr(toks))
      .filter(size(col("__toks")) >= 1)
      .filter(expr(scoreFoldSql(featuresExprSql("__toks", dims), thFp))
        > lit(0L))
      .drop("__w", "__toks")
  }

  /** One fold over the feature array with a (sum, count) struct
    * accumulator — the array is evaluated once — finishing in
    * floor-mean minus the threshold.
    */
  private def scoreFoldSql(featArraySql: String, thFp: Long): String =
    s"""aggregate($featArraySql,
       |  named_struct('s', 0L, 'n', 0L),
       |  (a, f) -> named_struct(
       |    's', a.s + element_at(__w, cast(f as int) + 1),
       |    'n', a.n + 1L),
       |  a -> cast(floor(cast(a.s as double)
       |    / cast(a.n as double)) as bigint) - ${thFp}L)""".stripMargin

  /** `toksCol` may be any SQL expression yielding array<string> —
    * [[LangId]] feeds a char-ngram array through the same hash.
    *
    * r21: emits the native `tok_fids` kernel — ONE compiled pass per
    * row, bit-identical to the interpreted chain it replaces,
    * `array_distinct(transform($toksCol, t -> cast(conv(substring(
    * md5(t), 1, 4), 16, 10) as bigint) % $dims))` (FunctionsSpec pins
    * the parity, null elements included). Callers that feed this to
    * `expr(...)` must have [[graft.functions.Functions.register]] run
    * on the session — every DataFrame-accepting entry point here does.
    */
  private[operators] def featuresExprSql(toksCol: String,
      dims: Int): String =
    s"tok_fids($toksCol, $dims)"
}
