package graft

/** Physical-plan shape guards — the properties that make the flagship
  * operators scale are pinned here so a future refactor cannot silently
  * regress them (e.g. a top-k degenerating into a global sort, or a
  * bucketed near-dup join degenerating into a cartesian product).
  */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("registry: no key collisions between query modules") {
    val core = graft.queries.CoreAnalytics.queries.keySet
    val llm = graft.queries.LlmPipeline.queries.keySet
    assert((core & llm).isEmpty, s"shadowed keys: ${core & llm}")
    assert(SparkEntry.queries.size === core.size + llm.size)
  }

  test("top-k queries lower to TakeOrderedAndProject, never a full sort") {
    for (q <- Seq("q03_topk_customers", "q24_cosine_topk",
        "q25_ann_lsh_bucket", "q35_top_terms", "q50_hybrid_search",
        "q61_lexical_search", "q71_bpe_merge_pairs", "q76_posting_lists",
        "q86_collocations", "q102_key_skew")) {
      assert(plan(q).contains("TakeOrderedAndProject"),
        s"$q lost its top-k lowering")
    }
  }

  test("near-dup candidate joins never degenerate into cartesian products") {
    for (q <- Seq("q26_embedding_neardup", "q28_minhash_neardup",
        "q30_simhash_neardup", "q31_ngram_jaccard", "q53_contamination",
        "q56_chunk_dedup", "q57_range_join_binned", "q90_containment",
        "q101_dup_spans", "q103_minhash_precision",
        // the r15 multimodal/CDC flanks ride the same banded/bucketed
        // candidate patterns — same law
        "q125_image_neardup", "q126_cdc_chunk_dedup",
        "q133_audio_neardup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went all-pairs")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q lost its equi-join")
    }
  }

  test("KNN joins: map-side window-group-limit, equi-join probes, " +
      "no cartesian corpus product") {
    // q84/q85's per-query top-3 is a row_number filter over a window:
    // InferWindowGroupLimit must plant a PARTIAL WindowGroupLimit below
    // the window exchange, so each map task forwards at most k rows per
    // query instead of shuffling the full |Q| x corpus scored set — the
    // difference between a bounded exchange and moving the whole corpus
    // |Q| times at 100 TB.
    // q88's per-cluster sampler and q87's argmin lean on the same prune.
    for (q <- Seq("q84_knn_join", "q85_ivf_knn_join",
        "q88_cluster_sample")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"),
        s"$q lost its map-side top-k prune")
      assert(!p.contains("CartesianProduct"), s"$q went all-pairs")
    }
    // q85's probe join must stay a hash equi-join on the inverted-list
    // id (cid): the corpus side never meets the query set all-pairs.
    // The only nested-loop join allowed is the bounded centroid fanout
    // (8 rows, the IVF assignment scoring) — same shape as q40.
    val p85 = plan("q85_ivf_knn_join")
    assert(p85.contains("BroadcastHashJoin [cid"),
      s"q85 probe join is not a cid equi-join:\n$p85")
    // SHUFFLE budgets pin the per-query data-movement story (broadcast
    // exchanges are intended — the tiny query/centroid sides): q84
    // moves rows only for the (group-limited) window and the
    // presentation sort; q89 is pure per-row projection — nothing
    // moves before the sort.
    def shuffles(q: String): Int =
      "Exchange (hash|range)partitioning".r.findAllIn(plan(q)).length
    assert(shuffles("q84_knn_join") <= 2,
      s"q84 grew a shuffle beyond window+sort: ${plan("q84_knn_join")}")
    assert(shuffles("q89_random_projection") <= 1,
      "q89 must not shuffle before the presentation sort")
    // q127's three top-k legs are the same row_number shape: the
    // map-side prune must survive on each, and the only nested-loop
    // joins are the bounded broadcast query/LUT sides (|Q| = 10 rows),
    // never a corpus×corpus product.
    val p127 = plan("q127_pq_recall")
    assert(p127.contains("WindowGroupLimit"),
      "q127 lost its map-side top-k prune")
    assert(!p127.contains("CartesianProduct"), "q127 went all-pairs")
  }

  private def scans(name: String) =
    SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }

  test("q95 corpus shuffle never plans a global range sort over the " +
    "corpus: one hash exchange feeds the per-bucket window") {
    val p = plan("q95_corpus_shuffle")
    // exactly: hashpartitioning(bucket) for the window (its Sort is
    // partition-LOCAL, global=false) + ONE rangepartitioning for the
    // final presentation order. A second range exchange would mean the
    // global ORDER-BY-md5 shuffle this query exists to avoid.
    assert("Exchange hashpartitioning\\(bucket".r.findAllIn(p).size === 1, p)
    assert("Exchange rangepartitioning".r.findAllIn(p).size === 1, p)
    // the in-bucket ordering sort must be partition-local: its window
    // sort prints with global=false ("], false, 0")
    assert(p.contains("shuffle_key"), p)
    assert("Sort \\[bucket[^\\]]*shuffle_key[^\\]]*\\], false, 0".r
      .findFirstIn(p).isDefined, p)
  }

  test("pure-projection queries shuffle ONLY for the presentation " +
    "sort: no aggregation/join exchange anywhere") {
    // q94 accent folding, q98 markup strip, q99 sentence stats — their
    // docstrings claim zero shuffle at any scale; pin it: the only
    // exchange allowed is the final ORDER BY's rangepartitioning
    for (q <- Seq("q94_accent_fold", "q98_markup_strip",
        "q99_sentence_stats")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q grew an aggregation/join shuffle:\n$p")
      assert("Exchange rangepartitioning".r.findAllIn(p).size <= 1, p)
    }
  }

  test("q93 frequency spectrum aggregates with map-side partial " +
    "combines (both levels)") {
    val p = plan("q93_freq_spectrum")
    // two-level agg: term counts then freq-of-freq; each must plan a
    // partial+final HashAggregate pair, never a single-exchange sort agg
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("selective scans push their filters into the parquet reader") {
    // q06 filters a date range; q05 is a key lookup — both must reach
    // the scan as a NON-EMPTY pushed-filter list (every scan prints
    // 'PushedFilters:', so a substring check would be vacuous).
    for (q <- Seq("q05_key_lookup", "q06_time_range_scan")) {
      val pushed = scans(q).map(_.metadata.getOrElse("PushedFilters", "[]"))
      assert(pushed.exists(p => p != "[]" && p.nonEmpty),
        s"$q lost pushdown: $pushed")
    }
  }

  test("signature kernels run exactly once per side (no re-evaluation, " +
      "no explode-aggregate shuffle)") {
    // The per-row kernels must appear exactly once per pipeline side in
    // the optimized plan: alias inlining (filter pushdown / project
    // collapse) would silently multiply the per-document md5 work, and
    // reintroducing the r2 explode+groupBy form would put a shuffle
    // under the signature. q29/q36's only exchange is the final sort.
    def opt(name: String): String =
      SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan.toString
    def cnt(s: String, pat: String): Int = pat.r.findAllIn(s).length
    assert(cnt(opt("q29_simhash"), "simhash60") === 1)
    assert(cnt(opt("q36_doc_fingerprint"), "min_gram_md5") === 1)
    // q28/q30 (r21): the q90 treatment — the signature frame
    // materializes once and feeds both band-join sides, so the final
    // plans have NO kernel at all
    assert(cnt(opt("q28_minhash_neardup"), "minhash_sig") === 0)
    assert(cnt(opt("q30_simhash_neardup"), "simhash60") === 0)
    // q31 (r21): the q90 treatment — ONE materialized kernel frame
    // feeds both pair sides, so the final plan has NO kernel at all
    assert(cnt(opt("q31_ngram_jaccard"), "shingle_hashes") === 0)
    // q53's two kernels are one CORPUS side + one BENCHMARK side —
    // different inputs, both necessary
    assert(cnt(opt("q53_contamination"), "shingle_hashes") === 2)
    // q90 (r21): ONE materialized kernel frame feeds both pair sides —
    // the final plan re-reads the checkpointed RDD and contains NO
    // kernel at all (the q61/q86 barrier doctrine; 2 would mean the
    // lazy two-side form regressed)
    assert(cnt(opt("q90_containment"), "shingle_hashes") === 0)
    // q103 (r21): the shingle-set frame AND the minhash signature
    // frame (via minhashPairsOf) each materialize once — zero kernels
    // of either kind in the final plan
    assert(cnt(opt("q103_minhash_precision"), "shingle_hashes") === 0)
    assert(cnt(opt("q103_minhash_precision"), "minhash_sig") === 0)
    for (q <- Seq("q29_simhash", "q36_doc_fingerprint")) {
      val phys = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(cnt(phys, "Exchange") <= 1, s"$q grew a signature shuffle")
      assert(!phys.contains("HashAggregate"), s"$q re-grew an aggregate")
    }
    // q62's struct result sits behind the same barrier: collapsing it
    // into the four field extractions would re-run the kernel 4x per
    // row. Exactly one kernel call in the optimized plan.
    assert(cnt(opt("q62_embedding_quantize"), "quantize_i8") === 1)
    // q101's single-pass property: the ~k-amplified window stream is
    // GENERATED once — exactly one windowing md5 in the optimized plan
    // (a second one = the recompute-twice semi-join form regressed).
    assert(cnt(opt("q101_dup_spans"), "md5") === 1)
  }

  test("tokenization runs exactly once per document (toks Generate barrier)") {
    // The shared `toks` array must be a generator attribute, never an
    // inlined alias: CollapseProject/PushDownPredicates would substitute
    // the regexp tokenization into every downstream reference (3-5× the
    // regex work per document — the r3 hot spot in q32/q34/q54).
    def opt(name: String): String =
      SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan.toString
    // r21: the house tokenization is the native word_toks kernel —
    // the barrier property is unchanged (ONE tokenization per doc),
    // the counted pattern covers both the kernel and any remaining
    // regexp (q32/q34 carry separate punctuation regexes).
    def cnt(s: String): Int =
      "regexp_extract_all|word_toks".r.findAllIn(s).length
    assert(cnt(opt("q32_token_stats")) === 2, "q32: toks + n_punct")
    assert(cnt(opt("q34_quality_score")) === 2, "q34: toks + punct_ratio")
    assert(cnt(opt("q54_gopher_quality")) === 1, "q54: toks only")
    // q61's token explode lives entirely inside the eagerly-checkpointed
    // tf frame: the final plan re-reads the materialized RDD and must
    // contain NO tokenization at all (r3 ran the corpus explode twice).
    assert(cnt(opt("q61_lexical_search")) === 0,
      "q61: tokenization must be checkpointed out of the final plan")
    // q70 fans out to ~5 windows per document: an inlined tokenization
    // would re-run the regex per window.
    assert(cnt(opt("q70_token_windows")) === 1, "q70: toks only")
    // q71 reads the array twice per pair row (element_at ×2) and q73
    // fans out like q70 — both must keep the single Generate barrier.
    assert(cnt(opt("q71_bpe_merge_pairs")) === 1, "q71: toks only")
    assert(cnt(opt("q73_sequence_packing")) === 1, "q73: toks only")
    // q76's tokenization is a single explode argument — one evaluation.
    assert(cnt(opt("q76_posting_lists")) === 1, "q76: toks only")
    // q86 branches the token frame three ways (unigrams, pairs, totals)
    // off ONE eagerly-materialized positional frame: the final plan
    // re-reads the checkpointed RDD and must contain no tokenization.
    assert(cnt(opt("q86_collocations")) === 0,
      "q86: tokenization must be checkpointed out of the final plan")
  }

  test("q80 pipeline: heavy stages are checkpointed out of the final plan") {
    // The survivor frame (tokenization + quality rules + content hash)
    // and the component labels are both eagerly materialized; the final
    // keeper join must re-read those RDDs, not re-run the corpus scan —
    // the optimized plan may contain NO tokenization and NO signature
    // kernel.
    val opt = SparkEntry.queries("q80_pipeline_e2e")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!opt.contains("regexp_extract_all"),
      "q80 re-tokenizes past the checkpoint")
    assert(!opt.contains("minhash_sig"),
      "q80 re-runs the signature kernel past the checkpoint")
  }

  test("q75 novelty resolves first-seen with a window, not a self-join") {
    // The window-MIN form scans and shingles the corpus ONCE; a
    // groupBy+join rewrite would re-run the shingle kernel (and the
    // corpus scan) a second time.
    def opt(name: String): String =
      SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan.toString
    def cnt(s: String, pat: String): Int = pat.r.findAllIn(s).length
    assert(cnt(opt("q75_ngram_novelty"), "shingle_hashes") === 1,
      "q75 must shingle the corpus exactly once")
    assert(!plan("q75_ngram_novelty").contains("Join"),
      "q75 grew a self-join")
  }

  test("media decode audits scan doc_id only (text never reaches decode)") {
    // q64/q65 synthesize payloads from doc_id alone; a pruning
    // regression that drags `text` (the wide column) through the
    // mapPartitions decode stage would 100×-scale the scan bytes.
    for (q <- Seq("q64_image_decode", "q65_audio_decode",
        "q66_image_resize")) {
      val ss = scans(q)
      assert(ss.nonEmpty, s"no documents scan in $q")
      for (cols <- ss.map(_.schema.fieldNames.toSet))
        assert(cols === Set("doc_id"), s"$q reads unneeded columns: $cols")
    }
  }

  test("star join prunes fact columns (no full-width lineitem read)") {
    // q02 needs exactly 3 lineitem columns; inspect the scan node's
    // schema programmatically (the rendered ReadSchema string truncates
    // at 100 chars, which would hide a full-width regression).
    val li = scans("q02_revenue_by_segment")
      .map(_.schema.fieldNames.toSet)
      .find(_.contains("l_extendedprice"))
      .getOrElse(fail("no lineitem scan found"))
    assert(li.subsetOf(Set("l_orderkey", "l_extendedprice", "l_discount")),
      s"q02 reads unneeded fact columns: $li")
    // q102's skew profile touches ONE fact column: both its lineitem
    // scans (per-key counts + the one-row total) must prune to at most
    // l_suppkey — a full-width read here would price the diagnostic
    // like the join it exists to protect.
    val sk = scans("q102_key_skew").map(_.schema.fieldNames.toSet)
    assert(sk.nonEmpty, "no lineitem scan found in q102")
    for (cols <- sk)
      assert(cols.subsetOf(Set("l_suppkey")),
        s"q102 reads unneeded fact columns: $cols")
  }

  test("bloom_probe predicate stays inside WholeStageCodegen — the " +
    "ingest fast path never falls back to a row-at-a-time UDF filter") {
    import spark.implicits._
    graft.functions.Functions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("bloomplan").toString
    graft.functions.BloomShards.build(
      Seq("a1", "b2", "c3").toDF("h"), "h", dir, 4, 0.01)
    // a parquet-backed scan: a local relation would be folded driver-side
    // and leave no FilterExec to pin
    val src = java.nio.file.Files.createTempDirectory("bloomplan-src")
      .toString + "/rows"
    Seq("a1", "zz").toDF("h").write.parquet(src)
    val probed = spark.read.parquet(src)
      .filter(org.apache.spark.sql.functions.call_function(
        "bloom_probe", org.apache.spark.sql.functions.col("h"),
        org.apache.spark.sql.functions.lit(dir),
        org.apache.spark.sql.functions.lit(4)))
    val exec = probed.queryExecution.executedPlan
    val codegenFilters = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.collectFirst {
            case f: org.apache.spark.sql.execution.FilterExec
                if f.condition.exists(
                  _.isInstanceOf[graft.functions.BloomProbe]) => f
          }.nonEmpty => w
    }
    assert(codegenFilters.nonEmpty,
      s"bloom_probe filter not inside WholeStageCodegen:\n$exec")
    assert(probed.collect().map(_.getString(0)).toSeq === Seq("a1"))
  }

  test("r14 additions: q118's corpus side filters against broadcast " +
    "frames (never shuffled to be sampled), q119 is one scan + one " +
    "aggregation, q113's tercile cut plans no global sort") {
    // q118: the thresholds reach the corpus scan via broadcast joins —
    // the selection must never shuffle the documents side
    val p118 = plan("q118_export_mix")
    assert(p118.contains("BroadcastHashJoin") ||
      p118.contains("BroadcastExchange"),
      "q118 lost its broadcast threshold join")
    assert(!p118.contains("SortMergeJoin"),
      "q118's corpus side shuffled to be sampled")
    // q119: a single-scan audit — exactly one parquet scan, no join
    val p119 = plan("q119_embedding_health")
    assert("FileScan parquet".r.findAllIn(p119).size === 1,
      "q119 must read the corpus exactly once")
    assert(!p119.contains("Join"), "q119 needs no join")
    // q113 (r14 histogram tercile): zero sorts over the per-doc frame —
    // the only Sort nodes allowed are inside the KB-scale histogram
    // walk's window (bounded cells) and the presentation orderBy; a
    // global ntile would show as a single-partition Window over the
    // corpus-sized frame, which the warning-free build already rules
    // out — pin the operator here too
    val p113 = plan("q113_lm_score")
    // \b keeps the QuantileSketch column name "quantile" from matching
    assert("\\bntile\\(".r.findFirstIn(p113).isEmpty,
      "q113 regressed to the global ntile")
  }

  test("q121 fuzzy join: the length-band blocking plans an equi-join, " +
    "never a cartesian or nested loop") {
    val p = plan("q121_fuzzy_name_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "fuzzy resolution degenerated into all-pairs")
  }

  test("PQ family: codebooks ride broadcasts (no shuffled codebook " +
    "side, no cartesian), and the ADC top-k lowers to " +
    "TakeOrderedAndProject") {
    // TRAINING: the codebook/centroid side always rides a BROADCAST —
    // the corpus side never shuffles for a join, and nothing goes
    // all-pairs beyond the bounded broadcast fanout. Pinned on
    // Pq.train's own plan: the registry queries hide it behind the
    // r13 materialization barrier (the codebook trains once per
    // build), so their final plans start from the checkpointed rows.
    val e = Tables.load(spark, sf, "embeddings")
      .withColumn("v", org.apache.spark.sql.functions.col("embedding")
        .cast("array<double>"))
      .select("vec_id", "v")
    val pTrain = graft.operators.Pq.train(e, 1L to 8L, 8, 64, iters = 1)
      .queryExecution.executedPlan.toString
    assert(pTrain.contains("BroadcastHashJoin") ||
      pTrain.contains("BroadcastNestedLoopJoin"),
      s"PQ training lost its broadcast codebook join:\n$pTrain")
    assert(!pTrain.contains("CartesianProduct"), "PQ training all-pairs")
    assert(!pTrain.contains("SortMergeJoin"),
      "PQ training shuffled a KB-scale codebook side")
    // SERVING (q109): the ADC LUT join stays broadcast, never merges
    val p109 = plan("q109_pq_adc_topk")
    assert(p109.contains("BroadcastHashJoin"),
      "q109 lost its broadcast LUT join")
    assert(!p109.contains("CartesianProduct"), "q109 went all-pairs")
    assert(!p109.contains("SortMergeJoin"),
      "q109 shuffled a KB-scale LUT side")
    // q108 (encode) is MAP-ONLY: the codebook is a plan literal, so
    // the whole encode is one projection + one Generate — no join of
    // any kind, and the only exchange is the presentation sort's
    val p108 = plan("q108_pq_encode")
    for (j <- Seq("BroadcastHashJoin", "SortMergeJoin",
        "CartesianProduct", "ShuffledHashJoin"))
      assert(!p108.contains(j), s"q108 encode gained a $j")
    assert(p108.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      s"q108 encode gained a non-presentation exchange:\n$p108")
    // q109's final cut is a bounded top-k, not a global sort
    assert(plan("q109_pq_adc_topk").contains("TakeOrderedAndProject"),
      "q109 lost its top-k lowering")
  }

  test("r15 late additions: q134 funnels through ONE user_id exchange " +
    "and one events scan; q135's denominator join broadcasts; q136 " +
    "lowers its top-20 and never goes all-pairs; q137's prefix join " +
    "stays an equi-join") {
    // q134: the three min-when windows share the user_id partitioning —
    // one hash exchange, one scan, zero joins (the whole funnel is one
    // pass; the only other exchange is the 1-row global count's)
    val p134 = plan("q134_funnel_steps")
    assert("Exchange hashpartitioning".r.findAllIn(p134).size === 1,
      s"q134 must shuffle exactly once (the shared user_id window):\n$p134")
    assert("FileScan parquet".r.findAllIn(p134).size === 1,
      "q134 must read events exactly once")
    assert(!p134.contains("Join"), "q134 needs no join")
    assert(p134.contains("In(event_type"),
      "q134's step-type IN filter must reach the parquet scan")
    // q135: the per-cohort denominator (KB frame) must come in broadcast
    val p135 = plan("q135_retention_cohorts")
    assert(p135.contains("BroadcastHashJoin"),
      "q135 lost its broadcast denominator join")
    assert(!p135.contains("CartesianProduct") &&
      !p135.contains("BroadcastNestedLoopJoin"),
      "q135 degenerated into all-pairs")
    // q136: per-iteration equi-joins only (the 1-row count crossJoin is
    // behind the edge materialize barrier); bounded top-20 lowering
    val p136 = plan("q136_link_rank")
    assert(p136.contains("TakeOrderedAndProject"),
      "q136 lost its top-k lowering")
    assert(!p136.contains("CartesianProduct") &&
      !p136.contains("BroadcastNestedLoopJoin"),
      "q136's iteration joins degenerated")
    // q137: prefix-key equi-join candidates, never all-pairs
    val p137 = plan("q137_jaccard_join")
    assert(!p137.contains("CartesianProduct") &&
      !p137.contains("BroadcastNestedLoopJoin"), "q137 went all-pairs")
  }

  test("r16 additions: q140/q141's video band join stays an equi-join " +
    "(never all-pairs); q142/q143's weighted selections filter against " +
    "BROADCAST threshold frames (the scan side never shuffles to be " +
    "sampled)") {
    // q140: one 8-byte-key hash aggregate over the fingerprint frame
    val p140 = plan("q140_video_dedup")
    assert(!p140.contains("CartesianProduct") &&
      !p140.contains("BroadcastNestedLoopJoin"), "q140 degenerated")
    // q141: banded-Hamming candidates ride the pigeonhole equi-join
    val p141 = plan("q141_video_neardup")
    assert(!p141.contains("CartesianProduct") &&
      !p141.contains("BroadcastNestedLoopJoin"), "q141 went all-pairs")
    for (q <- Seq("q142_weighted_export", "q143_authority_mix")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q lost its broadcast threshold join")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q's selection degenerated")
    }
  }

  test("r17 additions: q146's store probe rides a BROADCAST gram join " +
    "(the benchmark side is broadcast-scale by design); q147's score " +
    "is the codegen'd cosine over ONE pairing join, never all-pairs; " +
    "q148's seed agg is map-side partial") {
    // q146: the gram join's store side comes in broadcast (gatedHint —
    // a KB benchmark store is far under the ceiling), so the corpus
    // gram stream never shuffles to be gated
    val p146 = plan("q146_contamination_store")
    assert(p146.contains("BroadcastHashJoin"),
      s"q146's store probe lost its broadcast:\n$p146")
    assert(!p146.contains("CartesianProduct") &&
      !p146.contains("BroadcastNestedLoopJoin"), "q146 degenerated")
    // q147: exactly one join (the pair_id equi-join); cosine_sim is a
    // native expression inside the projection, no extra exchange
    val p147 = plan("q147_crossmodal_alignment")
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(p147).size === 1,
      s"q147 must pair with exactly one equi-join:\n$p147")
    assert(p147.contains("cosine_sim"),
      "q147's score must be the native cosine expression")
    assert(!p147.contains("CartesianProduct") &&
      !p147.contains("BroadcastNestedLoopJoin"), "q147 went all-pairs")
    // q148: the substring-count aggregate partials map-side before its
    // exchange (the corpus never ships raw substring rows)
    val p148 = plan("q148_ulm_seed_vocab")
    assert(p148.contains("partial_sum") || p148.contains("partial_count")
      || "HashAggregate.*partial".r.findFirstIn(p148).isDefined,
      s"q148's seed agg lost its map-side partial:\n$p148")
    // q149: the blocklist membership gate anti-joins a broadcast-scale
    // store side and never degenerates
    val p149 = plan("q149_blocklist_gate")
    assert(p149.contains("BroadcastHashJoin"),
      s"q149's membership gate lost its broadcast anti-join:\n$p149")
    assert(!p149.contains("CartesianProduct") &&
      !p149.contains("BroadcastNestedLoopJoin"), "q149 degenerated")
  }

  test("r18 additions (r20 form): q150 PROBES the standing decision " +
    "log — the serving plan is a join-free store scan (the chain's " +
    "id-keyed assembly runs once per fingerprint inside the builder; " +
    "a revert to per-query re-derivation would re-grow joins here), " +
    "and the gate probes stay on their pinned q146/q149 shapes " +
    "(asserted there)") {
    val p150 = plan("q150_full_stack_log")
    assert(!p150.contains("Join"),
      s"q150's standing-log probe must be join-free:\n$p150")
    // q151 (r21 shared-scan form): ONE featurize pass feeds trainer
    // and scorer — the final plan reads the materialized feature/grid
    // RDDs and must contain NO feature kernel and NO marker regex
    // (a revert to the two-scan literal form re-runs the corpus
    // featurize per side); every data-bearing join is a broadcast
    // hash join (model, doc-lang re-attach) — the only nested-loop
    // joins are the bounded 1-row/K-row total frames of the grid
    // completion, never a corpus product
    val p151 = plan("q151_langid_confusion")
    val o151 = SparkEntry.queries("q151_langid_confusion")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!o151.contains("lid_features") &&
      !o151.contains("regexp_replace"),
      s"q151 re-featurizes past the checkpoint:\n$o151")
    assert(!p151.contains("CartesianProduct"), s"q151 went all-pairs")
    assert(p151.contains("BroadcastHashJoin"),
      s"q151's model/score joins must be broadcast hash joins:\n$p151")
    // q152 scores through ONE word-keyed equi-join (occurrence stream
    // × distinct-word Viterbi stats) and never degenerates
    val p152 = plan("q152_ulm_lm_score")
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(p152).size === 1,
      s"q152 must score with exactly one word equi-join:\n$p152")
    assert(!p152.contains("CartesianProduct") &&
      !p152.contains("BroadcastNestedLoopJoin"),
      s"q152 degenerated:\n$p152")
  }

  test("r19 additions: q153 main-content extraction is a join-free " +
    "per-row projection — its only exchange is the final global " +
    "order (presentation, not the operator)") {
    val p153 = plan("q153_main_content")
    assert(!p153.contains("Join"),
      s"q153 must stay join-free:\n$p153")
    // one rangepartitioning exchange for ORDER BY doc_id; no
    // hash-partitioned exchange anywhere (no aggregation, no shuffle
    // in the operator itself)
    assert(!p153.contains("hashpartitioning"),
      s"q153 grew a shuffle beyond the presentation sort:\n$p153")
    // q154: the export epilogue over the materialized chain — the
    // selection is a broadcast-threshold scan-side filter, never a
    // cartesian/nested-loop, and the manifest agg is the only wide op
    val p154 = plan("q154_curated_export")
    assert(!p154.contains("CartesianProduct") &&
      !p154.contains("BroadcastNestedLoopJoin"),
      s"q154 degenerated:\n$p154")
    // q100 PROBES the standing label store: two aggs over a parquet
    // read, join-free — a revert to in-query label propagation would
    // put joins (and the iterative loop) back in this plan
    val p100 = plan("q100_cluster_sizes")
    assert(!p100.contains("Join"),
      s"q100 must probe the standing label snapshot, not recluster:\n$p100")
  }
}
