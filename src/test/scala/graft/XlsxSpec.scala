package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.types.DecimalType
import graft.ingest.{Warehouse, Xlsx}

/** Pure-JVM xlsx reader (O4 parity: the reference's actual source format,
  * etl/app.py:103 pd.read_excel). Fixtures are re-created in-code from
  * FIXTURES.md §1 — byte layout mirrors real Excel output (namespaced
  * parts, shared strings, xml:space="preserve") — plus a direct parse of
  * the reference's own shipped workbooks when present.
  */
class XlsxSpec extends SparkSuite {

  // -- in-test xlsx writer ----------------------------------------------

  private sealed trait Cell
  private case class S(v: String) extends Cell // shared string
  private case class N(v: String) extends Cell // numeric/general, raw
  private case object E extends Cell // empty cell, still materialized

  private def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) {
      sb.insert(0, ('A' + (n - 1) % 26).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Build workbook bytes the way Excel lays them out (the parts our
    * reader and real readers consume; namespace on every part).
    */
  private def xlsxBytes(rows: Seq[Seq[Cell]]): Array[Byte] = {
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val shared = scala.collection.mutable.LinkedHashMap[String, Int]()
    def sidx(s: String): Int =
      shared.getOrElseUpdate(s, shared.size)
    val sheetXml = new StringBuilder(
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<worksheet xmlns="$ns"><sheetData>""")
    rows.zipWithIndex.foreach { case (cells, ri) =>
      sheetXml.append(s"""<row r="${ri + 1}">""")
      cells.zipWithIndex.foreach { case (c, ci) =>
        val ref = s"${colRef(ci)}${ri + 1}"
        c match {
          case S(v) => sheetXml.append(
            s"""<c r="$ref" t="s"><v>${sidx(v)}</v></c>""")
          case N(v) => sheetXml.append(s"""<c r="$ref"><v>$v</v></c>""")
          case E => sheetXml.append(s"""<c r="$ref"/>""")
        }
      }
      sheetXml.append("</row>")
    }
    sheetXml.append("</sheetData></worksheet>")
    val sstXml = new StringBuilder(
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<sst xmlns="$ns" count="${shared.size}" """ +
        s"""uniqueCount="${shared.size}">""")
    shared.keys.foreach { s =>
      val pre = if (s != s.trim) """ xml:space="preserve"""" else ""
      sstXml.append(s"<si><t$pre>${esc(s)}</t></si>")
    }
    sstXml.append("</sst>")
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      s"""<?xml version="1.0"?><workbook xmlns="$ns"><sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>""")
    put("xl/worksheets/sheet1.xml", sheetXml.toString)
    put("xl/sharedStrings.xml", sstXml.toString)
    z.close()
    bos.toByteArray
  }

  private def writeXlsx(dir: String, name: String,
      rows: Seq[Seq[Cell]]): Unit = {
    val f = new FileOutputStream(new java.io.File(dir, name))
    try f.write(xlsxBytes(rows)) finally f.close()
  }

  // FIXTURES.md §1 rows, with the quirks that matter: numeric telephone
  // (leading 0 already lost in the Excel cell), preserved leading space
  // in adresse, ragged produits row (trailing empty 7th cell), ventes
  // date as a raw Excel serial number.
  private def clientsRows: Seq[Seq[Cell]] = Seq(
    Seq("client_id", "nom", "prenom", "email", "telephone", "adresse").map(S(_)),
    Seq(S("CLI001"), S("Dupont"), S("Jean"), S("jean.dupont@email.com"),
      N("612345678"), S(" 1 rue de Paris, Paris")),
    Seq(S("CLI002"), S("Martin"), S("Sophie"), S("s.martin@email.com"),
      N("723456789"), S("2 avenue Lyon, Lyon")),
    Seq(S("CLI003"), S("Dupont"), S("Jean"), S("jean.dupont@email.com"),
      N("612345678"), S(" 1 rue de Paris, Paris")))
  private def produitsRows: Seq[Seq[Cell]] = Seq(
    Seq("produit_id", "nom", "categorie", "prix_unitaire",
      "stock_disponible", "description").map(S(_)),
    Seq(S("PRO001"), S("USB "), S("informatique"), N("5000"), N("100"),
      S("une clé usb de qualité")),
    Seq(S("PRO002"), S("Odinateur"), S("informatique"), N("5000"), N("100"),
      S("une clé usb de qualité"), E)) // ragged: 7th empty cell
  private def ventesRows: Seq[Seq[Cell]] = Seq(
    Seq("vente_id", "client_id", "produit_id", "quantite", "prix_total",
      "date_vente").map(S(_)),
    Seq(S("VNT001"), S("CLI001"), S("PRO001"), N("2"), N("10000"),
      N("45787.604166666664")))

  // -- parser unit behavior ---------------------------------------------

  test("colIndex: A=0, Z=25, AA=26, BC12=54") {
    assert(Xlsx.colIndex("A1") === 0)
    assert(Xlsx.colIndex("Z9") === 25)
    assert(Xlsx.colIndex("AA3") === 26)
    assert(Xlsx.colIndex("BC12") === 54)
  }

  test("parse: shared strings, preserved space, numerics kept verbatim") {
    val (header, rows) = Xlsx.parseWorkbook(xlsxBytes(clientsRows))
    assert(header === Seq("client_id", "nom", "prenom", "email",
      "telephone", "adresse"))
    assert(rows.length === 3)
    assert(rows.head === Seq("CLI001", "Dupont", "Jean",
      "jean.dupont@email.com", "612345678", " 1 rue de Paris, Paris"))
  }

  test("parse: ragged row truncates to header width; trailing space kept") {
    val (header, rows) = Xlsx.parseWorkbook(xlsxBytes(produitsRows))
    assert(header.length === 6)
    assert(rows.forall(_.length === 6))
    assert(rows.head(1) === "USB ") // trailing space survives
    assert(rows(1).head === "PRO002")
  }

  test("parse: sparse cell refs leave nulls in the gap, short rows pad") {
    // hand-build a sheet with an explicit gap: A2 then C2 (B2 omitted)
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    z.write(
      (s"""<worksheet xmlns="$ns"><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><t>a</t></is></c>""" +
        """<c r="B1" t="inlineStr"><is><t>b</t></is></c>""" +
        """<c r="C1" t="inlineStr"><is><t>c</t></is></c></row>""" +
        """<row r="2"><c r="A2"><v>1</v></c><c r="C2"><v>3</v></c></row>""" +
        """<row r="3"><c r="A3"><v>7</v></c></row>""" +
        """</sheetData></worksheet>""").getBytes("UTF-8"))
    z.closeEntry()
    z.close()
    val (header, data) = Xlsx.parseWorkbook(bos.toByteArray)
    assert(header === Seq("a", "b", "c"))
    assert(data(0) === Seq("1", null, "3")) // gap at B2
    assert(data(1) === Seq("7", null, null)) // short row padded
  }

  // -- end-to-end through the warehouse ---------------------------------

  test("E1 end-to-end over .xlsx deliveries: router, serial date, lock file") {
    val watch = Files.createTempDirectory("watch-xlsx").toString
    val wh = new Warehouse(spark, Files.createTempDirectory("wh-xlsx").toString)
    writeXlsx(watch, "clients.xlsx", clientsRows)
    writeXlsx(watch, "produits.xlsx", produitsRows)
    writeXlsx(watch, "ventes.xlsx", ventesRows)
    // Excel lock artifact (the reference dir ships these too) → filtered
    Files.write(java.nio.file.Paths.get(watch, "~$clients.xlsx"),
      Array[Byte](1, 2, 3))

    val st = wh.pollOnce(watch)
    assert(st === Map("clients.xlsx" -> "success",
      "produits.xlsx" -> "success", "ventes.xlsx" -> "success"))
    assert(wh.table("clients").get.count() === 3) // CLI003 near-dup kept
    assert(wh.table("produits").get.count() === 2)
    val ventes = wh.table("ventes").get.collect()
    assert(ventes.length === 1)
    assert(ventes.head.getAs[java.sql.Timestamp]("date_vente").toString
      === "2025-05-10 14:30:00.0") // Excel serial → timestamp (O7)
    assert(ventes.head.getAs[String]("source_file") === "ventes.xlsx")
    assert(wh.table("ventes").get.schema("prix_total").dataType
      === DecimalType(10, 2))
    // idempotent re-poll: nothing modified → nothing reprocessed (O3)
    assert(wh.pollOnce(watch) === Map.empty)
  }

  test("property: arbitrary cell grids round-trip through the parser") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // XML 1.0 forbids control chars; everything else (unicode, quotes,
    // &<>, leading/trailing spaces) must survive byte-exactly.
    val cellText: Gen[String] = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.stringOfN(n, Gen.frequency(
        8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '&', '<', '>', '"',
          '\'', 'é', '漢', 'ß'))))
    val cell: Gen[Cell] = Gen.frequency(
      5 -> cellText.map(S(_)),
      2 -> Gen.chooseNum(-1e6, 1e6).map(d => N(d.toString)),
      1 -> Gen.const(E))
    val grid: Gen[(Seq[String], Seq[Seq[Cell]])] = for {
      nCols <- Gen.chooseNum(1, 6)
      header <- Gen.listOfN(nCols, Gen.identifier.map(_.take(8)))
        .retryUntil(h => h.distinct.size == h.size)
      nRows <- Gen.chooseNum(0, 8)
      rows <- Gen.listOfN(nRows, for { // ragged short rows + empty overflow
        len <- Gen.chooseNum(0, nCols)
        cells <- Gen.listOfN(len, cell)
        overflow <- Gen.oneOf(true, false)
      } yield if (overflow) cells :+ (E: Cell) else cells)
    } yield (header, rows)
    val params = Gen.Parameters.default
    (0 until 40).foreach { i =>
      val (header, rows) = grid.pureApply(params, Seed(1234L + i))
      val all = header.map(S(_): Cell) +: rows
      val (gotHeader, gotRows) = Xlsx.parseWorkbook(xlsxBytes(all))
      assert(gotHeader === header)
      assert(gotRows.length === rows.length)
      gotRows.zip(rows).foreach { case (got, src) =>
        val expected = src.map {
          case S(v) => if (v.isEmpty) null else v
          case N(v) => v
          case E => null
        }.padTo(header.length, null).take(header.length)
        assert(got === expected)
      }
    }
  }

  test("over-wide row with NON-empty overflow fails the file (no silent drop)") {
    val rows = produitsRows.map(identity) :+
      (Seq(S("PRO003"), S("X"), S("c"), N("1"), N("1"), S("d"),
        S("surprise")): Seq[Cell]) // 7th NON-empty cell
    val e = intercept[IllegalArgumentException](
      Xlsx.parseWorkbook(xlsxBytes(rows)))
    assert(e.getMessage.contains("beyond the 6-column header"))
  }

  test("inline rich-text runs concatenate; phonetic blocks are skipped") {
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    z.write((s"""<worksheet xmlns="$ns"><sheetData>""" +
      """<row><c t="inlineStr"><is><t>h</t></is></c></row>""" +
      """<row><c t="inlineStr"><is><r><t>foo</t></r><r><t>bar</t></r>""" +
      """<rPh sb="0" eb="6"><t>PHONETIC</t></rPh></is></c></row>""" +
      """</sheetData></worksheet>""").getBytes("UTF-8"))
    z.closeEntry(); z.close()
    val (_, data) = Xlsx.parseWorkbook(bos.toByteArray)
    assert(data.head === Seq("foobar")) // not "bar", not "PHONETIC"
  }

  test("first sheet = first WORKBOOK tab, not lowest part name") {
    // tab order says sheet2.xml is the (only) visible first tab —
    // Excel leaves this layout behind when the original Sheet1 is
    // deleted; pd.read_excel follows tab order and so must we.
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    def sheetXml(v: String) =
      s"""<worksheet xmlns="$ns"><sheetData><row>""" +
        s"""<c t="inlineStr"><is><t>$v</t></is></c>""" +
        """</row><row><c><v>1</v></c></row></sheetData></worksheet>"""
    put("xl/workbook.xml",
      s"""<workbook xmlns="$ns" xmlns:r="$rns"><sheets>""" +
        """<sheet name="Current" sheetId="2" r:id="rId7"/>""" +
        """<sheet name="Old" sheetId="1" r:id="rId3"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId3" Type="t" Target="worksheets/sheet1.xml"/>""" +
        """<Relationship Id="rId7" Type="t" Target="worksheets/sheet2.xml"/>""" +
        """</Relationships>""")
    put("xl/worksheets/sheet1.xml", sheetXml("stale"))
    put("xl/worksheets/sheet2.xml", sheetXml("current"))
    z.close()
    val (header, _) = Xlsx.parseWorkbook(bos.toByteArray)
    assert(header === Seq("current"))
  }

  test("readMany: executor-side parse across files, header contract enforced") {
    val dir = Files.createTempDirectory("xlsx-many").toString
    for (i <- 1 to 3)
      writeXlsx(dir, s"clients_batch$i.xlsx", clientsRows)
    Files.write(java.nio.file.Paths.get(dir, "~$clients_batch1.xlsx"),
      Array[Byte](9, 9)) // lock artifact skipped, not parsed
    // _-/.-prefixed files are hidden to Hadoop's executor-side listing;
    // the driver probe applies the same rule (would otherwise become
    // the header-probe file and then silently contribute no rows)
    writeXlsx(dir, "_staging.xlsx", clientsRows)
    val df = Xlsx.readMany(spark, s"$dir/*.xlsx")
    assert(df.columns.toSeq === Seq("client_id", "nom", "prenom", "email",
      "telephone", "adresse"))
    assert(df.count() === 9) // 3 files x 3 rows, all parsed on executors
    assert(df.filter(df("client_id") === "CLI001").count() === 3)
    // a delivery with a DIFFERENT header fails the job loudly
    writeXlsx(dir, "clients_rogue.xlsx", Seq(
      Seq(S("wrong"), S("header")), Seq(S("a"), S("b"))))
    val e = intercept[org.apache.spark.SparkException](
      Xlsx.readMany(spark, s"$dir/*.xlsx").count())
    assert(e.getMessage.contains("does not match") ||
      Option(e.getCause).exists(_.getMessage.contains("does not match")))
    // a bare directory argument works too (no trailing glob needed)
    val dir2 = Files.createTempDirectory("xlsx-dir").toString
    writeXlsx(dir2, "clients_a.xlsx", clientsRows)
    writeXlsx(dir2, "clients_b.xlsx", clientsRows)
    assert(Xlsx.readMany(spark, dir2).count() === 6)
  }

  test("corrupt workbook → error status, not a crashed poll cycle") {
    val watch = Files.createTempDirectory("watch-bad").toString
    val wh = new Warehouse(spark,
      Files.createTempDirectory("wh-bad").toString)
    Files.write(java.nio.file.Paths.get(watch, "clients.xlsx"),
      Array[Byte](1, 2, 3, 4, 5)) // not a zip
    writeXlsx(watch, "produits.xlsx", produitsRows)
    val st = wh.pollOnce(watch) // O4 retry exhausts, O13 records error
    assert(st === Map("clients.xlsx" -> "error",
      "produits.xlsx" -> "success"))
    assert(wh.table("clients").isEmpty)
    assert(wh.table("produits").get.count() === 2)
  }

  test("streaming router leaves .xlsx to the batch path (no CSV shredding)") {
    // An xlsx in a streamed watch dir must NOT be parsed as CSV: the
    // entity glob is suffix-anchored to .csv.
    val watch = Files.createTempDirectory("watch-mixed").toString
    val wh = new Warehouse(spark,
      Files.createTempDirectory("wh-mixed").toString)
    writeXlsx(watch, "clients.xlsx", clientsRows)
    Files.writeString(java.nio.file.Paths.get(watch, "clients_extra.csv"),
      "client_id,nom,prenom,email,telephone,adresse\n" +
        "CLI009,Durand,Luc,l.durand@email.com,699999999,3 rue X\n")
    graft.streaming.Streams.pollAvailableNow(spark, wh, watch,
      Files.createTempDirectory("ckpt-mixed").toString)
    val got = wh.table("clients").get.collect()
    assert(got.map(_.getAs[String]("client_id")).toSeq === Seq("CLI009"))
    // ...and the batch poll then picks the xlsx up normally.
    assert(wh.pollOnce(watch).get("clients.xlsx").contains("success"))
    assert(wh.table("clients").get.count() === 4)
  }

  test("reads the reference's own shipped workbooks (when present)") {
    val dir = new java.io.File("/root/reference/data/excel")
    assume(dir.isDirectory, "reference fixtures not mounted")
    val bytes = Files.readAllBytes(
      new java.io.File(dir, "clients.xlsx").toPath)
    val (header, rows) = Xlsx.parseWorkbook(bytes)
    assert(header === Seq("client_id", "nom", "prenom", "email",
      "telephone", "adresse"))
    assert(rows.length === 3)
    assert(rows.head.take(4) === Seq("CLI001", "Dupont", "Jean",
      "jean.dupont@email.com"))
    assert(rows.head(5) === " 1 rue de Paris, Paris") // preserved space
    val (vh, vr) = Xlsx.parseWorkbook(Files.readAllBytes(
      new java.io.File(dir, "ventes.xlsx").toPath))
    assert(vh.contains("date_vente"))
    // the raw serial reaches coercion verbatim
    assert(vr.head(vh.indexOf("date_vente")).startsWith("45787.604166666"))
  }
}
