package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Table access + declared schemas for the driver's TPC-H-ish testdata
  * (see /root/repo/TESTDATA.md) and the reference warehouse star schema
  * (reference: init-db/init.sql:11-60).
  *
  * Design: schemas are *declared*, mirroring the reference's fixed DDL
  * (init-db/init.sql) — we never rely on inference in production paths
  * (SURVEY.md §1.2). Parquet at rest, columnar + vectorized in flight.
  */
object Tables {

  /** All driver testdata tables, one parquet file each. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one testdata table. Plain parquet scan: Catalyst handles column
    * pruning + predicate pushdown; at cluster scale the same call reads a
    * partitioned/bucketed table without code change.
    *
    * events.ts is parquet TIMESTAMP(NANOS), which Spark reads only as a
    * raw Long (spark.sql.legacy.parquet.nanosAsLong, set by Verify/Bench/
    * tests); convert to TimestampType by integer ns→µs truncation —
    * integer `div`, not double division, which would lose precision at
    * 1e18-scale nanos.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val nanosFixed =
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      else df
    // Newer testdata generations write TIMESTAMP(MICROS) without UTC
    // adjustment, which Spark 4 reads as TIMESTAMP_NTZ. NTZ supports no
    // epoch arithmetic (cast to numeric is an analysis error), so the
    // sessionize/as-of/window queries would not even plan. Under the
    // UTC session every entry point pins, the LTZ form is VALUE-
    // identical to the naive reading (and to the DuckDB oracle's naive
    // TIMESTAMP) — normalize every NTZ column once, at the scan.
    nanosFixed.schema.fields
      .filter(_.dataType == TimestampNTZType)
      .foldLeft(nanosFixed)((d, f) =>
        d.withColumn(f.name,
          org.apache.spark.sql.functions.col(f.name).cast(TimestampType)))
  }

  // --- Reference warehouse schemas (init-db/init.sql:21-60) ------------

  /** warehouse.clients (init-db/init.sql:21-32). SERIAL surrogate id is
    * emulated only on demand (SURVEY.md §1.2); business key client_id.
    */
  val clientsSchema: StructType = StructType(Seq(
    StructField("client_id", StringType, nullable = false),
    StructField("nom", StringType),
    StructField("prenom", StringType),
    StructField("email", StringType),
    StructField("telephone", StringType),
    StructField("adresse", StringType),
    StructField("date_creation", TimestampType),
    StructField("source_file", StringType),
    StructField("imported_at", TimestampType)))

  /** warehouse.produits (init-db/init.sql:35-45). */
  val produitsSchema: StructType = StructType(Seq(
    StructField("produit_id", StringType, nullable = false),
    StructField("nom", StringType),
    StructField("categorie", StringType),
    StructField("prix_unitaire", DecimalType(10, 2)),
    StructField("stock_disponible", IntegerType),
    StructField("description", StringType),
    StructField("source_file", StringType),
    StructField("imported_at", TimestampType)))

  /** warehouse.ventes (init-db/init.sql:48-60). */
  val ventesSchema: StructType = StructType(Seq(
    StructField("vente_id", StringType, nullable = false),
    StructField("client_id", StringType, nullable = false),
    StructField("produit_id", StringType, nullable = false),
    StructField("quantite", IntegerType),
    StructField("prix_total", DecimalType(10, 2)),
    StructField("date_vente", TimestampType),
    StructField("source_file", StringType),
    StructField("imported_at", TimestampType)))

  /** warehouse.file_metadata (init-db/init.sql:11-17): the incremental
    * control table driving change detection (etl/app.py:36-52).
    */
  val fileMetadataSchema: StructType = StructType(Seq(
    StructField("filename", StringType, nullable = false),
    StructField("last_modified", TimestampType),
    StructField("last_processed", TimestampType),
    StructField("status", StringType)))

  /** Required-column ingest contracts (etl/app.py:150-155,179-184,208-213). */
  val requiredColumns: Map[String, Seq[String]] = Map(
    "clients" -> Seq("client_id", "nom", "prenom", "email", "telephone",
      "adresse"),
    "produits" -> Seq("produit_id", "nom", "categorie", "prix_unitaire",
      "stock_disponible", "description"),
    "ventes" -> Seq("vente_id", "client_id", "produit_id", "quantite",
      "prix_total", "date_vente"))
}
