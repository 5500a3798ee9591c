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
  * Views are metadata only: each one binds a NAME to the same lazy
  * plan the DataFrame form builds, so SQL text gets the identical
  * Catalyst treatment — pushdown, pruning, broadcast selection — and
  * the identical answers (SqlSurfaceSpec pins result parity between
  * the SQL and DataFrame forms). Nothing is copied or materialized at
  * registration, so the call is free at any data scale.
  */
object SqlSurface {

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

  /** Register every registry query as a view named by its key
    * (`q01_pricing_summary` … `q105_quality_keeper`) over the testdata
    * at `dir` — `SELECT * FROM q03_topk_customers` is then the SQL
    * spelling of the DataFrame registry call, sharing one plan
    * definition (no drift between the two surfaces is possible).
    */
  def registerQueries(spark: SparkSession, dir: String): Unit =
    SparkEntry.queries.foreach { case (name, q) =>
      q(spark, dir).createOrReplaceTempView(name)
    }

  /** The full SQL surface in one call: base tables + all registry
    * query views over `dir`.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    registerTables(spark, dir)
    registerQueries(spark, dir)
  }
}
