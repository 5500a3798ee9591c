package graft.ingest

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal pure-JVM `.xlsx` reader — the reference's actual source format
  * (`/root/reference/etl/app.py:103` reads the xlsx files under
  * `data/excel/` via `pd.read_excel`). xlsx is a zip of XML parts;
  * `java.util.zip` +
  * `javax.xml.stream` (both in the JDK) cover the whole format surface
  * the ingest contract needs — shared/inline strings, numeric cells,
  * sparse cell references, ragged rows — with zero added dependencies.
  *
  * Output mirrors the CSV leg of the router: every value is a STRING
  * column named by the header row; the warehouse's existing validation /
  * type-coercion / Excel-serial-date stages (Ingest.scala O5/O7) do the
  * typing downstream, so `.xlsx` and `.csv` deliveries of the same data
  * coerce identically.
  *
  * Scale posture: one workbook parses on the DRIVER, like the
  * reference's `pd.read_excel` — xlsx is a single-machine format by
  * construction (Excel caps a sheet at 2^20 rows ⇒ low-tens of MB of
  * XML). Many-file deliveries parallelize across files via the poll
  * loop; bulk data lands as parquet/CSV, which take the distributed
  * scan path.
  */
object Xlsx {

  /** Read the first worksheet of an xlsx file into a DataFrame of
    * strings (header row = column names; empty cells = null).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val bytes =
      try in.readAllBytes()
      finally in.close()
    val (header, rows) = parseWorkbook(bytes)
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row.fromSeq(r)): _*),
      headerSchema(header))
  }

  /** One naming rule for both the single-file and many-file paths. */
  private def headerSchema(header: IndexedSeq[String]): StructType =
    StructType(header.zipWithIndex.map { case (h, i) =>
      StructField(if (h == null || h.isEmpty) s"_c$i" else h, StringType,
        nullable = true)
    })

  /** Scale path for MANY workbooks: xlsx caps a sheet at 2^20 rows, so
    * volume arrives as file count, not file size — and file count is
    * exactly what distributes. One task per file (`binaryFiles`), the
    * whole parse executor-side; only the schema probe (header of the
    * first file) runs on the driver. All files must share that header —
    * a mismatched delivery fails the JOB (loud), it does not silently
    * mis-map columns.
    */
  def readMany(spark: SparkSession, pattern: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(pattern)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // Expand a bare directory argument (binaryFiles accepts both) and
    // apply the SAME visibility rule Hadoop's FileInputFormat applies
    // on the executor side — `_`/`.`-prefixed files are markers/hidden
    // and are skipped by binaryFiles no matter what the driver lists,
    // so the probe must agree or the two sides see different files.
    // Directory expansion is ONE LEVEL on both sides: FileInputFormat
    // is non-recursive by default, and this probe mirrors that with a
    // non-recursive listStatus — nested workbooks need an explicit glob
    // down to the leaf level (a nested DIRECTORY inside a matched one
    // fails the binaryFiles job loudly rather than being half-seen).
    def visible(name: String): Boolean =
      !name.startsWith("~$") && !name.startsWith("_") &&
        !name.startsWith(".")
    val statuses = Option(fs.globStatus(p))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
      .flatMap(st => if (st.isDirectory) fs.listStatus(st.getPath)
        else Array(st))
    val first = statuses
      .filter(st => st.isFile && visible(st.getPath.getName))
      .map(_.getPath.toString).sorted.headOption
      .getOrElse(throw new IllegalArgumentException(
        s"xlsx: no workbooks match $pattern"))
    // Header-only probe: parse stops after the first sheet row.
    val in = fs.open(new org.apache.hadoop.fs.Path(first))
    val header =
      try parseWorkbook(in.readAllBytes(), maxDataRows = 0)._1
      finally in.close()
    val rows = spark.sparkContext.binaryFiles(pattern)
      .filter { case (path, _) => visible(path.split('/').last) }
      .flatMap { case (path, pds) =>
        val (h, data) = parseWorkbook(pds.toArray())
        require(h == header,
          s"xlsx: $path header $h does not match first-file header $header")
        data.map(r => Row.fromSeq(r))
      }
    spark.createDataFrame(rows, headerSchema(header))
  }

  /** Parse workbook bytes → (header, data rows), all strings. Short data
    * rows pad with nulls; over-wide rows are accepted ONLY when the
    * overflow cells are empty (the reference's produits fixture ships a
    * ragged row with a trailing empty cell) — a non-empty cell beyond
    * the header is data the load would silently drop, so it fails the
    * file instead (pandas keeps it as an `Unnamed:` column and the
    * reference's insert then rejects the batch; error status either
    * way).
    */
  private[graft] def parseWorkbook(bytes: Array[Byte],
      maxDataRows: Int = Int.MaxValue)
      : (IndexedSeq[String], Seq[IndexedSeq[String]]) = {
    var sharedBytes: Array[Byte] = null
    var workbookBytes: Array[Byte] = null
    var relsBytes: Array[Byte] = null
    val sheets = scala.collection.mutable.LinkedHashMap[String, Array[Byte]]()
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    var e = zin.getNextEntry
    while (e != null) {
      e.getName match {
        case "xl/sharedStrings.xml" => sharedBytes = zin.readAllBytes()
        case "xl/workbook.xml" => workbookBytes = zin.readAllBytes()
        case "xl/_rels/workbook.xml.rels" => relsBytes = zin.readAllBytes()
        case n if n.startsWith("xl/worksheets/") && n.endsWith(".xml") =>
          sheets(n) = zin.readAllBytes()
        case _ =>
      }
      e = zin.getNextEntry
    }
    require(sheets.nonEmpty, "xlsx: no xl/worksheets/*.xml part")
    // "First" sheet = first tab in WORKBOOK order (what pd.read_excel
    // reads), resolved via workbook.xml's first <sheet r:id> and the
    // rels part — part NAMES do not track tab order (deleting Sheet1
    // in Excel can leave the only tab stored as sheet2.xml). Falls back
    // to the lowest part name when either part is absent.
    val sheetBytes = firstSheetPart(workbookBytes, relsBytes)
      .flatMap(sheets.get)
      .getOrElse(sheets(sheets.keys.toSeq.min))
    val shared =
      if (sharedBytes == null) IndexedSeq.empty[String]
      else parseSharedStrings(sharedBytes)
    val rows = parseSheet(sheetBytes, shared,
      maxRows = if (maxDataRows == Int.MaxValue) Int.MaxValue
        else maxDataRows + 1) // + the header row
    require(rows.nonEmpty, "xlsx: worksheet has no rows")
    val header = rows.head
    val width = header.length
    val data = rows.tail.map { r =>
      if (r.length == width) r
      else if (r.length > width) {
        require(r.drop(width).forall(_ == null),
          s"xlsx: row carries non-empty cells beyond the $width-column " +
            "header (would be silently dropped)")
        r.take(width)
      } else r ++ IndexedSeq.fill(width - r.length)(null: String)
    }
    (header, data)
  }

  /** Resolve the first workbook tab to its worksheet part name:
    * workbook.xml's first `<sheet>` carries an `r:id` that the rels part
    * maps to a target like `worksheets/sheet2.xml`. None when either
    * part is missing/unresolvable.
    */
  private def firstSheetPart(workbook: Array[Byte],
      rels: Array[Byte]): Option[String] = {
    if (workbook == null || rels == null) return None
    var firstRid: String = null
    var r = factory.createXMLStreamReader(new ByteArrayInputStream(workbook))
    try {
      while (firstRid == null && r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "sheet")
          firstRid = attr(r, "id") // r:id — matched on local name
      }
    } finally r.close()
    if (firstRid == null) return None
    var target: String = null
    r = factory.createXMLStreamReader(new ByteArrayInputStream(rels))
    try {
      while (target == null && r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship" &&
            attr(r, "Id") == firstRid)
          target = attr(r, "Target")
      }
    } finally r.close()
    Option(target).map { t =>
      if (t.startsWith("/")) t.stripPrefix("/") // absolute part name
      else "xl/" + t // relative to xl/
    }
  }

  private val factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    // XXE hardening: a workbook is untrusted input.
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.IS_COALESCING, true)
    f
  }

  /** sharedStrings.xml: one entry per `<si>`; rich-text runs concatenate
    * their `<r><t>` fragments; phonetic `<rPh>` blocks are skipped.
    * `xml:space="preserve"` whitespace survives (StAX never trims text
    * events) — the clients fixture's leading-space `adresse` depends on
    * it.
    */
  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val out = ArrayBuffer[String]()
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(bytes))
    try {
      var sb: StringBuilder = null
      var skip = 0
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => sb = new StringBuilder
              case "rPh" | "phoneticPr" => skip += 1
              case "t" if skip == 0 && sb != null =>
                sb.append(r.getElementText)
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "si" => out += sb.toString(); sb = null
              case "rPh" | "phoneticPr" => skip -= 1
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.toIndexedSeq
  }

  /** sheetN.xml: `<row>` of `<c r="B3" t="...">` cells. Handled cell
    * types: shared string (`t="s"`), inline string (`t="inlineStr"`),
    * formula-cached string (`t="str"`), and the numeric/general default
    * — values stay EXACTLY as stored (`45787.604166666664` reaches the
    * serial-date coercion untouched). Sparse references leave nulls in
    * the gap; a missing `r` attribute means "next column".
    */
  private def parseSheet(bytes: Array[Byte], shared: IndexedSeq[String],
      maxRows: Int = Int.MaxValue): Seq[IndexedSeq[String]] = {
    val rows = ArrayBuffer[IndexedSeq[String]]()
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(bytes))
    try {
      var row: ArrayBuffer[String] = null
      var cellIdx = 0
      var cellType = ""
      var value: String = null
      var skip = 0 // depth inside <rPh>/<phoneticPr> (ignored content)
      while (rows.length < maxRows && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => row = ArrayBuffer[String]()
              case "c" if row != null =>
                val ref = attr(r, "r")
                cellIdx = if (ref == null) row.length else colIndex(ref)
                cellType = Option(attr(r, "t")).getOrElse("")
                value = null
              case "v" => value = r.getElementText
              case "rPh" | "phoneticPr" => skip += 1
              case "t" if row != null && skip == 0 =>
                // <is> inline string: rich-text runs carry several <t>
                // fragments — CONCATENATE (mirrors parseSharedStrings),
                // don't overwrite.
                value = (if (value == null) "" else value) + r.getElementText
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "c" if row != null =>
                val v = cellType match {
                  case "s" if value != null => shared(value.toInt)
                  // booleans are stored as "1"/"0"; pandas surfaces
                  // Python bools, whose string form is True/False —
                  // match that so downstream coercion sees the same
                  // tokens the reference's ingest would
                  case "b" if value != null =>
                    if (value.trim == "1") "True" else "False"
                  // t="e" passes through the cached error text
                  // ("#DIV/0!"), which is exactly what openpyxl's
                  // data-only read hands pandas
                  case _ => value
                }
                while (row.length < cellIdx) row += null
                row += (if (v == null || v.isEmpty) null else v)
              case "rPh" | "phoneticPr" => skip -= 1
              case "row" =>
                rows += row.toIndexedSeq
                row = null
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    rows.toSeq
  }

  private def attr(r: XMLStreamReader, name: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == name) return r.getAttributeValue(i)
      i += 1
    }
    null
  }

  /** "BC12" → 0-based column 54 (letters are bijective base-26). */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }
}
