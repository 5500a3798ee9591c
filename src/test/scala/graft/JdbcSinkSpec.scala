package graft

import java.sql.Timestamp
import java.util.Properties

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.DecimalType
import graft.ingest.JdbcSink

/** O8 JDBC parity leg, contract-tested against embedded Derby (ships
  * with the Spark distribution — no network, no external server). The
  * semantics under test are the reference's `to_sql(if_exists="append")`
  * (etl/app.py:162): first write creates the table with the init.sql
  * column shapes, subsequent writes append, values round-trip.
  */
class JdbcSinkSpec extends SparkSuite {

  private def url(db: String) = s"jdbc:derby:memory:$db;create=true"

  private def ventesBatch(ids: String*) = {
    val now = Timestamp.valueOf("2025-05-10 14:30:00")
    spark.createDataFrame(
      java.util.Arrays.asList(ids.map(id =>
        Row(id, "CLI001", "PRO001", 2, new java.math.BigDecimal("10000.00"),
          now, "ventes.xlsx", now)): _*),
      Tables.ventesSchema)
  }

  test("first append creates the table with init.sql column shapes") {
    val u = url("wh1")
    JdbcSink.append(ventesBatch("VNT001"), u, "ventes")
    val back = JdbcSink.read(spark, u, "ventes")
    assert(back.count() === 1)
    // DECIMAL(10,2) survives the JDBC round trip (not a double)
    assert(back.schema("prix_total").dataType === DecimalType(10, 2))
    val r = back.collect().head
    assert(r.getAs[String]("vente_id") === "VNT001")
    assert(r.getAs[java.math.BigDecimal]("prix_total")
      .compareTo(new java.math.BigDecimal("10000.00")) === 0)
    assert(r.getAs[Timestamp]("date_vente").toString
      === "2025-05-10 14:30:00.0")
    // VARCHAR, not CLOB: Derby can filter/compare the key column (a
    // CLOB-typed key would throw on equality — the createTableColumnTypes
    // DDL is what this asserts).
    assert(JdbcSink.read(spark, u, "ventes")
      .filter("vente_id = 'VNT001'").count() === 1)
  }

  test("second append appends (to_sql if_exists=append semantics)") {
    val u = url("wh2")
    JdbcSink.append(ventesBatch("VNT001"), u, "ventes")
    JdbcSink.append(ventesBatch("VNT002", "VNT003"), u, "ventes")
    val back = JdbcSink.read(spark, u, "ventes")
    assert(back.count() === 3)
    assert(back.select("vente_id").collect().map(_.getString(0)).sorted
      === Array("VNT001", "VNT002", "VNT003"))
  }

  test("composed flow: xlsx poll cycle → parquet warehouse → JDBC mirror") {
    // The reference's full path in one test: Excel delivery in, typed
    // rows out to the operational store.
    val watch = java.nio.file.Files.createTempDirectory("watch-jdbc")
    val wh = new graft.ingest.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("wh-jdbc").toString)
    // minimal inline-string workbooks (ventes carries the serial date
    // as a numeric cell); dims must land too or the FK orphan check
    // rightly rejects the fact batch.
    def sheet(rows: Seq[Seq[String]], numericTail: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
      val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
      def cell(v: String, numeric: Boolean) =
        if (numeric) s"""<c><v>$v</v></c>"""
        else s"""<c t="inlineStr"><is><t>$v</t></is></c>"""
      z.write((s"""<worksheet xmlns="$ns"><sheetData>""" +
        rows.zipWithIndex.map { case (r, ri) =>
          "<row>" + r.zipWithIndex.map { case (v, ci) =>
            cell(v, ri > 0 && ci >= r.length - numericTail)
          }.mkString + "</row>"
        }.mkString + "</sheetData></worksheet>").getBytes("UTF-8"))
      z.closeEntry(); z.close()
      bos.toByteArray
    }
    java.nio.file.Files.write(watch.resolve("clients.xlsx"), sheet(Seq(
      Seq("client_id", "nom", "prenom", "email", "telephone", "adresse"),
      Seq("CLI001", "Dupont", "Jean", "j@e.com", "612345678", "1 rue")),
      numericTail = 0))
    java.nio.file.Files.write(watch.resolve("produits.xlsx"), sheet(Seq(
      Seq("produit_id", "nom", "categorie", "prix_unitaire",
        "stock_disponible", "description"),
      Seq("PRO001", "USB", "info", "5000", "100", "une clé")),
      numericTail = 0))
    java.nio.file.Files.write(watch.resolve("ventes.xlsx"), sheet(Seq(
      Seq("vente_id", "client_id", "produit_id", "quantite",
        "prix_total", "date_vente"),
      Seq("VNT001", "CLI001", "PRO001", "2", "10000",
        "45787.604166666664")),
      numericTail = 3))
    assert(wh.pollOnce(watch.toString) === Map(
      "clients.xlsx" -> "success", "produits.xlsx" -> "success",
      "ventes.xlsx" -> "success"))
    val u = url("wh4")
    JdbcSink.append(wh.table("ventes").get, u, "ventes")
    val back = JdbcSink.read(spark, u, "ventes").collect().head
    assert(back.getAs[String]("vente_id") === "VNT001")
    assert(back.getAs[Timestamp]("date_vente").toString
      === "2025-05-10 14:30:00.0") // serial → TIMESTAMP end to end
  }

  test("write fan-in is bounded by maxConnections") {
    val u = url("wh3")
    val wide = ventesBatch((1 to 40).map(i => f"VNT$i%03d"): _*)
      .repartition(32)
    JdbcSink.append(wide, u, "ventes", maxConnections = 4)
    assert(JdbcSink.read(spark, u, "ventes").count() === 40)
  }
}
