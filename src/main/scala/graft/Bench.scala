package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, xxhash64}

/** Benchmark main — one JSON line on stdout (driver contract).
  *
  * Methodology: queries run in fixed (sorted-name) order; each query is
  * warmed up untimed and then timed IMMEDIATELY (warmup-then-measure
  * per query, not a global warmup pass: with 50+ queries the global
  * pass overflows Spark's 100-entry codegen class cache, so by the
  * time the timed pass re-reaches a query its compiled stages have
  * been evicted and the "warmup" bought nothing — the cache size is
  * also raised below). Each execution checksums every column of every
  * result row (xxhash64 → BIT_XOR) — `count()` would let Catalyst
  * prune computed columns and under-bill projection-only queries, and
  * SUM of full-range 64-bit hashes overflows BIGINT under Spark 4's
  * default ANSI mode (which aborted some r2 timings mid-run). BIT_XOR
  * cannot overflow and still forces every row's every column. A query
  * whose timed run throws is reported as -1 in `queries` and its
  * message lands in the `errors` field — never a silent success.
  *
  * r9: each query is timed THREE times after its warmup; `queries`
  * reports the per-query MEDIAN, so a one-off GC/compilation stall is
  * visible as spread instead of masquerading as a regression (the
  * q60/q73/q74 round-over-round ambiguity of r7/r8). `value` is the
  * sum of medians. Keys are shortened to the qNN prefix ("q60", not
  * "q60_neardup_clusters" — full names in SparkEntry.queries).
  *
  * r10: the driver captures EXACTLY the last 2000 chars of stdout and
  * tries to parse the JSON line out of them — every BENCH_r1..r9
  * artifact shows "parsed": null because the line (plus sbt's trailing
  * "[success]" line) never fit: r9's per-query `spread` object alone
  * doubled the line past the window. The JSON keeps one compact
  * `spread_max` entry — the worst query's max−min — as the
  * machine-readable variance flag; 100 queries ≈ 1.5 kB, inside the
  * window with room for the sbt trailer.
  *
  * r12: the per-rep timings and the full spread map (stderr) are
  * gated behind SPARK_GRAFT_VERBOSE — BENCH_r11 recorded "parsed":
  * null because the driver's tail window merges the streams and the
  * spreads line crowded the JSON out. The contract line also prints
  * LAST-AND-ALONE: after spark.stop() (whose shutdown warnings would
  * otherwise land in the tail behind it), followed by a flush.
  * Between-queries cleanup is a BLOCKING unpersist of every persisted
  * RDD plus a driver GC, so no query is billed for its predecessors'
  * localCheckpoint debt.
  *
  * r13 — every BENCH_r01..r12 artifact STILL recorded "parsed": null;
  * the extracted tail showed three remaining killers, each closed here:
  *  - sbt's logger re-printed the line under an "[info] " prefix →
  *    build.sbt now sets `run / outputStrategy := StdoutOutput`, so
  *    the forked JVM's stdout reaches the driver raw;
  *  - the blocking unpersist of localCheckpointed RDDs floods WARN
  *    lines (benign by construction — the blocks belong to the query
  *    that just FINISHED) into the tail window → the
  *    `org.apache.spark.rdd` logger is pinned to ERROR up front;
  *  - `spark.stop()` throwing would drop the line entirely → the line
  *    is built first, mirrored to a well-known file (`bench_line.json`
  *    in the working directory, or $SPARK_GRAFT_BENCH_OUT) BEFORE the
  *    stop, and the stdout print sits in a finally. `spread_max` moved
  *    to stderr (verbose runs) to keep the line lean.
  *
  * r14: a bounded `noisy` object returns to the (now-parsing) contract
  * line — outlier spreads only (> half the query's median and > 0.25 s,
  * worst 12), so a 2× round-over-round reading carries its own
  * stall-vs-regression evidence without re-growing the line past the
  * driver's tail window (the r13 q101 ambiguity).
  *
  * r20 — the QUIET-BAND ledger (the r19 verdict's "machine-flag
  * regressions against bands instead of adjudicating from memory"):
  * `bench_bands.txt` (committed; one line per query: name + the last
  * ≤ 6 full-run medians, oldest first) persists per-query history
  * across rounds. Each run loads it FIRST, takes the per-query band =
  * MIN of the recorded medians (the quiet floor), and emits
  *  - `band` — the full per-query band map (authoritative in the
  *    mirrored `bench_line.json`; see the tail note below);
  *  - `over_band` — the bounded violation flags: queries whose median
  *    exceeds 1.5 × band AND band + 0.4 s, worst 12 by excess, each as
  *    [median, band] — the exact rule the r18/r19 verdicts applied by
  *    hand to q101/q19/q59.
  * The emitted `band` map is INTENTIONALLY the pre-run history: the
  * current run's medians are appended to the ledger after the band is
  * computed, so a new minimum set by this run appears in
  * bench_bands.txt but not in this run's `band` field — flags judge a
  * run against what was known before it, never against itself.
  * Only a FULL error-free run appends its medians to the ledger
  * (partial SPARK_GRAFT_ONLY runs and error runs read but never
  * write), so local profiling cannot pollute the bands.
  *
  * Tail-window disposition (r20): the registry outgrew the driver's
  * 2000-char stdout tail at r17 — a 154-entry queries map alone is
  * ~1.9 kB, so the tail has recorded "parsed": null since then and
  * CANNOT be restored without dropping contract fields. The committed
  * `bench_line.json` mirror is the authoritative full artifact (the
  * r19 judge read it); field order on the line puts the large maps
  * first so the tail window always retains the compact diagnostic
  * fields (errors/noisy/over_band/sf) at the end.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); see graft.Tables.load.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // 50+ queries × several codegen stages each overflow the default
      // 100-entry compiled-class cache; evictions turn re-execution
      // into recompilation.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The between-queries blocking unpersist of localCheckpointed RDDs
    // WARNs once per block ("removing block of RDD that was locally
    // checkpointed") — benign here by construction (the blocks belong
    // to the query that already finished), but dozens of lines of it
    // land in the driver's ~2 kB output tail and crowd out the
    // contract JSON. Pin the rdd logger to ERROR.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    def exec(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).collect()
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Local-profiling convenience: SPARK_GRAFT_ONLY=q60,q61 restricts
    // the run to a comma-separated prefix-match list. The driver never
    // sets it, so contract runs always cover every query.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty) // empty/blank var = unset, never "run nothing"
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    // qNN prefix, unique today; any collision falls back to full names
    // for the colliding pair rather than silently merging two queries.
    val shortOf: Map[String, String] = {
      val pref = names.map(n => n -> n.takeWhile(_ != '_')).toMap
      val dup = pref.groupBy(_._2).filter(_._2.size > 1).keySet
      names.map(n => n -> (if (dup(pref(n))) n else pref(n))).toMap
    }
    val reps = sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption)
      .filter(_ >= 1).getOrElse(3)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // (name, median, spread)
    val results: Seq[(String, Double, Double)] = names.map { n =>
      // Between queries (outside any timed region): first BLOCKING-
      // unpersist every RDD the previous query left persisted — the
      // materialize/localCheckpoint blocks inside eager builders (q56/
      // q60-family/q61/q86/q97) are only reclaimed by the async
      // ContextCleaner after a GC notices the dead reference, and that
      // race charged up to 7 s of q90's residue to q91 in full passes
      // (r11 full-pass q91 8 s vs 1.1 s solo). The explicit blocking
      // pass frees executor storage deterministically; the GC then
      // clears driver-side debt. Nothing from a previous registry
      // query is ever read by the next (they are independent by
      // construction), so this cannot evict live data.
      if (!sys.env.contains("SPARK_GRAFT_NOGC")) {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
      }
      try exec(n) // warm this query (codegen + JIT + file footers)
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $n failed: ${e.getMessage}") }
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try { exec(n); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          errors.getOrElseUpdate(shortOf(n),
            String.valueOf(e.getMessage).take(200))
          System.err.println(s"[bench] $n failed: ${e.getMessage}")
          None
        }
      }
      if (times.isEmpty) (n, -1.0, 0.0)
      else {
        // per-rep timings to stderr — VERBOSE runs only: when a spread
        // is large, the JSON alone can't tell one 30 s environmental
        // stall from three mediocre runs, and the raw reps make the
        // outlier attributable. Off by default because the driver
        // captures a ~2 kB tail of the run's output and parses the
        // JSON line out of it: every extra tail line risks crowding
        // the contract line out of the window (BENCH_r11 recorded
        // "parsed": null exactly this way).
        if (sys.env.contains("SPARK_GRAFT_VERBOSE"))
          System.err.println(s"[bench] ${shortOf(n)} reps: " +
            times.map(t => f"$t%.3f").mkString(" "))
        val s = times.sorted
        (n, s(s.size / 2), s.last - s.head)
      }
    }
    // 3-decimal timings: 63+ full-precision doubles push the line past
    // the driver's ~3 kB tail-capture window and the JSON arrives
    // truncated (BENCH_r03..r05 recorded "parsed": null). 1 ms
    // resolution is below run-to-run noise anyway.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v, _) => jstr(shortOf(k)) + ":" + f3(v) }
      .mkString("{", ",", "}")
    // full per-query spreads: stderr, verbose runs only (tail-window
    // hygiene — see the per-rep comment above)
    if (sys.env.contains("SPARK_GRAFT_VERBOSE"))
      System.err.println("[bench] spreads: " + results
        .map { case (k, _, d) => s"${shortOf(k)}=${f3(d)}" }.mkString(" "))
    // worst-query spread: stderr, verbose runs only — it was the last
    // non-essential field on the contract line (tail-window hygiene)
    if (sys.env.contains("SPARK_GRAFT_VERBOSE"))
      results.filter(_._2 >= 0).sortBy(-_._3).headOption.foreach {
        case (k, _, d) =>
          System.err.println(s"[bench] spread_max ${shortOf(k)}=${f3(d)}")
      }
    val errJson =
      if (errors.isEmpty) ""
      else ",\"errors\":" + errors
        .map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    // r14: OUTLIER spreads return to the contract line — r13 moved all
    // spreads to stderr for tail-window hygiene, which made the one
    // question spreads exist to answer (is a 2× round-over-round
    // reading one environmental stall or a real regression — the q101
    // ambiguity) undecidable from the artifact. Emit max−min for ONLY
    // the queries whose spread exceeds half their median AND 0.25 s
    // (sub-second jitter stays off the line), worst 12 by spread —
    // bounded at ~16 chars each, the tail window stays safe.
    val noisy = results
      .filter { case (_, med, spr) =>
        med >= 0 && spr > 0.25 && spr > med * 0.5 }
      .sortBy(-_._3).take(12)
    val noisyJson =
      if (noisy.isEmpty) ""
      else ",\"noisy\":" + noisy
        .map { case (k, _, d) => jstr(shortOf(k)) + ":" + f3(d) }
        .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // a filtered run must be self-identifying: without this, a leaked
    // SPARK_GRAFT_ONLY would produce a partial artifact that looks like
    // a full contract run
    val onlyJson = only.map(fs =>
      ",\"only\":" + fs.map(jstr).mkString("[", ",", "]")).getOrElse("")
    only.foreach(fs => System.err.println(
      s"[bench] PARTIAL RUN: SPARK_GRAFT_ONLY=${fs.mkString(",")} " +
        s"restricted the surface to ${names.size} queries"))
    // ── r20 quiet-band ledger (scaladoc) ──────────────────────────────
    val bandsFile = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BANDS", "bench_bands.txt"))
    val history: Map[String, Seq[Double]] =
      if (!java.nio.file.Files.exists(bandsFile)) Map.empty
      else scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(bandsFile)).asScala
        .map(_.trim).filter(_.nonEmpty)
        .flatMap { l =>
          val parts = l.split("\\s+").toSeq
          val vs = parts.tail.flatMap(_.toDoubleOption)
          if (parts.nonEmpty && vs.nonEmpty) Some(parts.head -> vs)
          else {
            // a malformed line is evidence of a corrupted ledger (the
            // write below is atomic, so this should never fire) —
            // surface it instead of silently erasing band history
            System.err.println(
              s"[bench] ledger line unparsable, ignored: $l")
            None
          }
        }.toMap
    val band: Map[String, Double] = history.map { case (k, vs) =>
      k -> vs.min }
    val medOf: Map[String, Double] = results
      .filter(_._2 >= 0).map { case (k, v, _) => shortOf(k) -> v }.toMap
    val bandJson =
      if (band.isEmpty) ""
      else ",\"band\":" + band.toSeq.sortBy(_._1)
        .map { case (k, v) => jstr(k) + ":" + f3(v) }
        .mkString("{", ",", "}")
    val overBand = medOf.toSeq
      .flatMap { case (k, med) => band.get(k).map(b => (k, med, b)) }
      .filter { case (_, med, b) => med > b * 1.5 && med > b + 0.4 }
      .sortBy { case (_, med, b) => b - med } // worst excess first
      .take(12)
    val overJson =
      if (overBand.isEmpty) ""
      else ",\"over_band\":" + overBand
        .map { case (k, med, b) =>
          jstr(k) + s":[${f3(med)},${f3(b)}]" }
        .mkString("{", ",", "}")
    // only a FULL, error-free contract run extends the ledger
    if (only.isEmpty && errors.isEmpty && medOf.nonEmpty) {
      val updated = (history.keySet ++ medOf.keySet).toSeq.sorted.map {
        k =>
          val vs = (history.getOrElse(k, Seq.empty) ++ medOf.get(k))
            .takeRight(6)
          k + " " + vs.map(f3).mkString(" ")
      }
      // temp file + ATOMIC_MOVE: a crash mid-write can no longer leave
      // a truncated ledger, and two racing full runs lose at most one
      // run's append instead of interleaving bytes
      try {
        val tmp = java.nio.file.Files.createTempFile(
          bandsFile.toAbsolutePath.getParent, ".bench_bands", ".tmp")
        java.nio.file.Files.write(tmp,
          scala.jdk.CollectionConverters.SeqHasAsJava(updated).asJava,
          java.nio.charset.StandardCharsets.UTF_8)
        java.nio.file.Files.move(tmp, bandsFile,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } catch { case e: Throwable =>
        System.err.println(
          s"[bench] could not update $bandsFile: ${e.getMessage}") }
    }
    // field order = tail-window layout: the band map (fully present in
    // bench_line.json and derivable from the committed ledger) leads,
    // so the driver's 2000-char stdout tail retains what it always
    // retained — the END of the queries map plus every compact
    // diagnostic field (errors/noisy/over_band/sf)
    val line = s"""{"metric":"total","value":${f3(total)},"unit":"sec","reps":$reps$bandJson,"queries":$qs$errJson$noisyJson$overJson$onlyJson,"sf":"$sfDir"}"""
    // mirror to a well-known file FIRST — immune to anything stop() or
    // the JVM teardown does to the streams
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_line.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}") }
    // the contract line goes out LAST-AND-ALONE on stdout: stop Spark
    // first (its shutdown can emit WARN lines that would otherwise land
    // in the driver's tail window after the JSON) — but print in a
    // finally, so a throwing stop() cannot swallow the line.
    try spark.stop()
    catch { case e: Throwable =>
      System.err.println(s"[bench] spark.stop failed: ${e.getMessage}") }
    finally {
      println(line)
      System.out.flush()
    }
  }
}
