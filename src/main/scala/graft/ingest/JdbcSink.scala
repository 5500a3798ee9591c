package graft.ingest

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** O8, JDBC leg — the reference's actual sink is an operational Postgres
  * written via pandas `to_sql(..., if_exists="append")`
  * (`/root/reference/etl/app.py:162,191,220`); the parquet sink in
  * [[Warehouse]] is the analytical-store re-expression. This object is
  * the operational-DB parity path: Spark's JDBC writer appends each
  * partition over its own connection with batched INSERTs — the
  * distributed analog of `to_sql`'s single-connection executemany.
  *
  * Scale posture: the writer parallelism IS the DataFrame partitioning —
  * cap it with `numPartitions` below so a 1000-executor append doesn't
  * open 1000 connections against one database (the DB, not Spark, is
  * the bottleneck); `batchsize` controls rows per INSERT round trip.
  * Column DDL mirrors the reference's init.sql so a freshly-created
  * table carries the same VARCHAR/DECIMAL shapes as the reference
  * warehouse (init-db/init.sql:21-60) rather than the dialect's lowest
  * common denominator (e.g. Derby/Postgres CLOB/TEXT for every string).
  */
object JdbcSink {

  /** Per-entity column DDL for table auto-creation, mirroring
    * init-db/init.sql:21-60 (lineage columns included — the reference
    * adds them to every frame before to_sql, etl/app.py:156-160).
    */
  val columnDdl: Map[String, String] = Map(
    "clients" -> ("client_id VARCHAR(50), nom VARCHAR(100), " +
      "prenom VARCHAR(100), email VARCHAR(255), telephone VARCHAR(20), " +
      "adresse VARCHAR(1000), date_creation TIMESTAMP, " +
      "source_file VARCHAR(255), imported_at TIMESTAMP"),
    "produits" -> ("produit_id VARCHAR(50), nom VARCHAR(255), " +
      "categorie VARCHAR(100), prix_unitaire DECIMAL(10,2), " +
      "stock_disponible INTEGER, description VARCHAR(1000), " +
      "source_file VARCHAR(255), imported_at TIMESTAMP"),
    "ventes" -> ("vente_id VARCHAR(50), client_id VARCHAR(50), " +
      "produit_id VARCHAR(50), quantite INTEGER, " +
      "prix_total DECIMAL(10,2), date_vente TIMESTAMP, " +
      "source_file VARCHAR(255), imported_at TIMESTAMP"))

  /** Append `df` to `table`, creating it on first write (pandas
    * `to_sql(if_exists="append")` semantics). `maxConnections` bounds
    * write-side fan-in to the database.
    */
  def append(df: DataFrame, url: String, table: String,
      props: Properties = new Properties, maxConnections: Int = 8): Unit = {
    val w = df.write.mode("append")
    columnDdl.get(table)
      .map(ddl => w.option("createTableColumnTypes", ddl))
      .getOrElse(w)
      // the JDBC writer's own fan-in cap (coalesces internally when the
      // frame is wider — no extra planning pass, AQE-safe)
      .option("numPartitions", maxConnections)
      .option("batchsize", 1000) // rows per INSERT round trip
      .jdbc(url, table, props)
  }

  /** Read a warehouse table back (verification / downstream joins). For
    * big tables pass `partitionColumn`/bounds via `props` at the call
    * site — an unpartitioned JDBC read is a single connection.
    */
  def read(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, props)
}
