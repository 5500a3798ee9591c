package graft

import org.apache.spark.sql.DataFrame

/** The plain-SQL entry surface (the reference's Metabase leg made
  * native): registered views must answer SQL text identically to the
  * DataFrame registry forms — same rows, same columns — and the
  * warehouse entity tables must be queryable by name.
  */
class SqlSurfaceSpec extends SparkSuite {

  /** Collected rows normalized for order-insensitive comparison. */
  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq
      .map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) "∅" else r.get(i).toString))
      .sortBy(_.mkString("|"))

  // Representative registry queries whose oracle SQL is portable ANSI
  // (runs unchanged on Spark): aggregation, multi-join star, top-k,
  // point lookup, range scan, anti-join EXISTS, window rank, set ops,
  // CASE buckets, HAVING, correlated-avg join — the shapes a dashboard
  // actually emits.
  private val portable = Seq(
    "q01_pricing_summary", "q02_revenue_by_segment",
    "q03_topk_customers", "q04_monthly_sales", "q05_key_lookup",
    "q06_time_range_scan", "q07_orphan_check", "q08_window_rank",
    "q12_setop_intersect", "q15_date_parts", "q16_case_buckets",
    "q17_semijoin_exists", "q18_distinct_counts", "q19_having_filter",
    "q44_above_cust_avg", "q45_setop_except")

  test("SQL text over registered table views answers identically to " +
    "the DataFrame registry forms (the Metabase leg, 16 query shapes)") {
    SqlSurface.registerTables(spark, sf)
    for (name <- portable) {
      val viaSql = spark.sql(SparkEntry.oracleSql(name))
      val viaDf = SparkEntry.queries(name)(spark, sf)
      assert(viaSql.columns.map(_.toLowerCase).sorted.toSeq
        === viaDf.columns.map(_.toLowerCase).sorted.toSeq,
        s"$name: SQL and DataFrame column sets diverge")
      assert(rows(viaSql.select(viaSql.columns.sorted.map(viaSql(_)): _*))
        === rows(viaDf.select(viaDf.columns.sorted.map(viaDf(_)): _*)),
        s"$name: SQL and DataFrame answers diverge")
    }
  }

  test("registry queries are addressable as views: SELECT * FROM " +
    "<query_name> equals the registry call") {
    SqlSurface.registerAll(spark, sf)
    for (name <- Seq("q03_topk_customers", "q27_exact_dedup",
        "q34_quality_score")) {
      assert(rows(spark.sql(s"SELECT * FROM $name"))
        === rows(SparkEntry.queries(name)(spark, sf)),
        s"$name view diverges from the registry form")
    }
    // ad-hoc SQL over a query view composes (the dashboard case:
    // filter/aggregate over a curated view)
    val n = spark.sql(
      "SELECT count(*) AS n FROM q03_topk_customers WHERE revenue > 0")
      .collect().head.getLong(0)
    assert(n > 0L)
    // graft native functions are available to ad-hoc SQL text
    val sim = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s")
      .collect().head.getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("eager registry queries (CC family, k-means, barrier plans) " +
    "are skipped by default and register on first reference via " +
    "registerQuery") {
    val reg = SqlSurface.registerQueries(spark, sf)
    assert(reg.toSet.intersect(SqlSurface.eagerQueries).isEmpty,
      "default registration must not invoke eager builders")
    assert((SparkEntry.queries.keySet -- SqlSurface.eagerQueries)
      .subsetOf(reg.toSet), "a lazy registry query went unregistered")
    // an eager query is NOT addressable until explicitly registered…
    spark.catalog.dropTempView("q60_neardup_clusters")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM q60_neardup_clusters").collect()
    }
    // …and after registerQuery it answers identically to the registry
    SqlSurface.registerQuery(spark, sf, "q60_neardup_clusters")
    assert(rows(spark.sql("SELECT * FROM q60_neardup_clusters"))
      === rows(SparkEntry.queries("q60_neardup_clusters")(spark, sf)))
    intercept[IllegalArgumentException] {
      SqlSurface.registerQuery(spark, sf, "q999_no_such_query")
    }
  }

  test("dashboard-shaped ad-hoc SQL over the warehouse views: join + " +
    "window + rollup in one text, and a clean error on a missing table") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("sqldash").toString
    Seq(("CLI001", "Dupont", "Paris"), ("CLI002", "Martin", "Lyon"))
      .toDF("client_id", "nom", "ville")
      .write.parquet(s"$root/clients")
    Seq(
      ("VNT001", "CLI001", "PRO001", 2L, BigDecimal("10.00")),
      ("VNT002", "CLI001", "PRO002", 1L, BigDecimal("25.50")),
      ("VNT003", "CLI002", "PRO001", 4L, BigDecimal("20.00")),
      ("VNT004", "CLI002", "PRO003", 3L, BigDecimal("7.50")))
      .toDF("vente_id", "client_id", "produit_id", "quantite",
        "prix_total")
      .write.parquet(s"$root/ventes")
    assert(SqlSurface.registerWarehouse(spark, root).toSet
      === Set("clients", "ventes"))
    // the shape a BI tool actually emits: per-city revenue rollup with
    // each client's top sale ranked by a window, NOT a registry echo
    val got = spark.sql(
      """SELECT v.ville, c.nom, v.total,
        |       rank() OVER (ORDER BY v.total DESC) AS rk
        |FROM (SELECT cl.ville, s.client_id,
        |             sum(s.prix_total) AS total
        |      FROM ventes s JOIN clients cl
        |        ON s.client_id = cl.client_id
        |      GROUP BY ROLLUP (cl.ville, s.client_id)
        |      HAVING s.client_id IS NOT NULL) v
        |JOIN clients c ON v.client_id = c.client_id
        |ORDER BY rk""".stripMargin).collect()
    assert(got.length === 2)
    assert(got(0).getString(1) === "Dupont" &&
      got(0).getAs[java.math.BigDecimal](2).doubleValue === 35.5 &&
      got(0).getInt(3) === 1)
    assert(got(1).getString(1) === "Martin" &&
      got(1).getAs[java.math.BigDecimal](2).doubleValue === 27.5 &&
      got(1).getInt(3) === 2)
    // negative: a table nobody registered fails analysis cleanly
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM no_such_warehouse_table").collect()
    }
    assert(err.getMessage.toLowerCase.contains("no_such_warehouse_table"))
  }

  test("warehouse entity tables register as views when present and " +
    "skip silently when absent") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("sqlwh").toString
    // nothing ingested yet: no views, no errors
    assert(SqlSurface.registerWarehouse(spark, root) === Seq())
    // land one entity table; only it registers
    Seq(("VNT001", "CLI001", "PRO001", 2L))
      .toDF("vente_id", "client_id", "produit_id", "quantite")
      .write.parquet(s"$root/ventes")
    assert(SqlSurface.registerWarehouse(spark, root) === Seq("ventes"))
    assert(spark.sql("SELECT vente_id FROM ventes").collect()
      .map(_.getString(0)).toSeq === Seq("VNT001"))
  }
}
