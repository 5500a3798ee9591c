package graft

import org.apache.spark.sql.SparkSession

import graft.ingest.Warehouse

/** The plain-SQL entry surface — the reference's analytics leg is a BI
  * tool speaking SQL to the warehouse (reference `docker-compose.yml:
  * 42-58` wires Metabase at Postgres; `readme.md:115-118` documents it
  * as THE query path). A user of this engine gets the same thing
  * natively: one call registers every table — and, optionally, every
  * registry query — as session views, after which `spark.sql("SELECT
  * … FROM ventes")` (or any ad-hoc text a dashboard emits) just works.
  *
  * TABLE views are metadata only: each one binds a NAME to a lazy scan
  * plan, so SQL text gets the identical Catalyst treatment — pushdown,
  * pruning, broadcast selection — and the identical answers
  * (SqlSurfaceSpec pins result parity between the SQL and DataFrame
  * forms); registering them is free at any data scale. QUERY views are
  * mostly the same — but a minority of registry builders
  * ([[eagerQueries]]: the connected-components family, the k-means
  * trainers, the barrier-materialized token pipelines) RUN their
  * iterative/materialization work when the builder is invoked, and
  * their views bind to labels frozen at registration time.
  * [[registerQueries]] therefore skips them by default; opt in with
  * `includeEager = true` (accepting the registration cost and the
  * snapshot semantics) or register one on first reference with
  * [[registerQuery]].
  */
object SqlSurface {

  /** Registry queries whose BUILDER runs Spark jobs when invoked —
    * iterative label propagation (connectedComponents: q60/q80/q83/
    * q100/q105), k-means training (q87/q88/q91/q96), or an eager
    * barrier materialization inside the plan (q56/q61/q86/q97). Their
    * views are SNAPSHOTS: the expensive part runs at registration and
    * the view serves those frozen results until re-registered. Every
    * other registry view is a lazy plan that recomputes per query,
    * like any SQL view.
    */
  val eagerQueries: Set[String] = Set(
    "q56_chunk_dedup", "q60_neardup_clusters", "q61_lexical_search",
    "q80_pipeline_e2e", "q83_semantic_clusters", "q86_collocations",
    "q87_kmeans", "q88_cluster_sample", "q91_ivf_stats",
    "q96_cluster_separation", "q97_vocab_coverage",
    "q100_cluster_sizes", "q105_quality_keeper",
    // q112 rides the q87 k-means assignment (centroid collect at
    // builder time); q113 materializes its LM count tables (the
    // two-phase train/score shape); q116 is q80's audit form (same CC
    // loop + barriers); the PQ family trains+materializes its codebook
    // at build (q108/q109 additionally inline it as plan literals);
    // q110 is lazy end to end; q111 materializes its labeled corpus
    // frame (r21 — the lazy form re-ran the tokenize+Gopher chain six
    // times per execution); q28/q30/q31/q90/q103 materialize their
    // signature/shingle kernel frame (r21 — one kernel pass feeds
    // both pair sides, the q137 pattern)
    "q28_minhash_neardup", "q30_simhash_neardup",
    "q31_ngram_jaccard", "q90_containment", "q103_minhash_precision",
    "q111_quality_model_score",
    "q112_semdedup", "q113_lm_score", "q116_curation_log",
    // q122 rides the q60 CC loop (builder-time label propagation);
    // q123 materializes its scored frame for the histogram cut
    "q122_soft_dedup_weights", "q123_curriculum_stages",
    "q117_term_drift",
    // q120 rides the same build-time PQ codebook materialization
    "q107_pq_codebooks", "q108_pq_encode", "q109_pq_adc_topk",
    "q120_pq_distortion",
    // q124/q125 materialize the decoded-image perceptual-hash frame
    // (the PNG round trip must not re-run per band-join reference)
    "q124_image_dedup", "q125_image_neardup",
    // q126 materializes its chunk frame like q56 (read twice: counts
    // + the join back)
    "q126_cdc_chunk_dedup",
    // q127 rides the build-time PQ codebook + materializes its truth
    // and shortlist frames (each feeds two recall joins)
    "q127_pq_recall",
    // q133 materializes the decoded audio-fingerprint frame (the WAV
    // round trip must not re-run per band-join side; q128/q129-q132
    // are lazy end to end — single-reference decode projections)
    "q133_audio_neardup",
    // q136 materializes its (src, dst, outdeg) edge frame (referenced
    // once per unrolled PageRank iteration); q137 materializes the
    // shingle kernel frame and the per-doc prefix frame (each feeds
    // both join sides)
    "q136_link_rank", "q137_jaccard_join",
    // q140/q141 materialize the container-derived video-fingerprint
    // frame (the MP4 write + box walk must not re-run per band-join
    // side — the q124/q133 doctrine on the video pillar)
    "q140_video_dedup", "q141_video_neardup",
    // q142/q143 materialize their weight frames (referenced by the
    // driver-side threshold collect AND the weighted selection);
    // q143 additionally runs the checkpointed LinkRank rounds
    "q142_weighted_export", "q143_authority_mix",
    // q144 materializes its per-customer RFM frame (referenced by
    // three histogram builds AND the final scoring pass)
    "q144_rfm_segments",
    // q146 builds + probes its contamination store at build time
    // (the recordBenchmark write job); q147 is lazy end to end.
    // q148 materializes its top-64 seed frame (referenced by the
    // Σn/|V| aggregate AND the scoring join); q149 builds its
    // standing blocklist store at build time (the recordHashes job)
    "q146_contamination_store", "q148_ulm_seed_vocab",
    "q149_blocklist_gate",
    // q150 builds/probes both standing stores AND rides the q116
    // CC loop + gate-survivor barriers at build time; q151 collects
    // its K dense weight vectors at build (the literal-serving form);
    // q152 collects its trained ULM vocabulary at build (plan-literal
    // Viterbi serving, the q148/Ulm.train shape)
    "q150_full_stack_log", "q151_langid_confusion",
    "q152_ulm_lm_score",
    // q154 rides the full q150 chain (standing stores + gate-survivor
    // barriers at build time) plus the export threshold collect
    "q154_curated_export")

  /** Register the driver testdata tables under `dir` as temp views
    * (`region … lineitem events documents embeddings`), plus the graft
    * native functions (`cosine_sim`, `minhash_sig`, …) so ad-hoc SQL
    * can use them. Idempotent; re-registering re-points the views.
    */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    graft.functions.Functions.register(spark)
    Tables.names.foreach(n =>
      Tables.load(spark, dir, n).createOrReplaceTempView(n))
  }

  /** Register the warehouse entity tables rooted at `warehouseRoot`
    * (`clients`, `produits`, `ventes`, and the `file_metadata` control
    * table carrying per-file status) as temp views — the Metabase-leg
    * tables of the reference (init-db/init.sql:21-67). Absent tables
    * (nothing ingested yet) are skipped, not errors: a dashboard
    * against a fresh warehouse sees the views appear as data lands.
    * Returns the names registered.
    */
  def registerWarehouse(spark: SparkSession,
      warehouseRoot: String): Seq[String] = {
    val wh = new Warehouse(spark, warehouseRoot)
    Seq("clients", "produits", "ventes", "file_metadata").flatMap { n =>
      wh.table(n).map { df => df.createOrReplaceTempView(n); n }
    }
  }

  /** Register registry queries as views named by their key
    * (`q01_pricing_summary` … `q105_quality_keeper`) over the testdata
    * at `dir` — `SELECT * FROM q03_topk_customers` is then the SQL
    * spelling of the DataFrame registry call, sharing one plan
    * definition (no drift between the two surfaces is possible).
    * [[eagerQueries]] are SKIPPED unless `includeEager` — their
    * builders run their full iterative/materialization work at
    * registration and the views snapshot (class doc); register one on
    * demand with [[registerQuery]] instead. Returns the names
    * registered.
    */
  def registerQueries(spark: SparkSession, dir: String,
      includeEager: Boolean = false): Seq[String] =
    SparkEntry.queries.toSeq.collect {
      case (name, q) if includeEager || !eagerQueries.contains(name) =>
        q(spark, dir).createOrReplaceTempView(name)
        name
    }

  /** Register ONE registry query view on demand — the
    * first-reference path for [[eagerQueries]] (pay its registration
    * cost when a dashboard actually asks for it; re-register to
    * refresh the snapshot). Works for any registry name.
    */
  def registerQuery(spark: SparkSession, dir: String,
      name: String): Unit = {
    val q = SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(s"unknown registry query $name"))
    q(spark, dir).createOrReplaceTempView(name)
  }

  /** The full SQL surface in one call: base tables + registry query
    * views over `dir` (minus [[eagerQueries]] unless `includeEager` —
    * see [[registerQueries]]).
    */
  def registerAll(spark: SparkSession, dir: String,
      includeEager: Boolean = false): Unit = {
    registerTables(spark, dir)
    registerQueries(spark, dir, includeEager)
    ()
  }
}
