package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal XLSX reader on the JDK only (java.util.zip + StAX) — no external
  * spreadsheet library. Covers the subset real normalizer inputs use
  * (reference legiscan_normalizer.py:123-137 unions *.csv, *.xlsx, *.xls via
  * pandas.read_excel): first worksheet, header row + string and number cells,
  * shared strings, inline strings, sparse cells by A1 reference.
  *
  * Scale shape: XLSX is an ingestion-boundary format — files are
  * human-authored and small, but there can be MANY of them, so the reader
  * distributes per-file: Spark's binaryFile source lists the files, each
  * executor task unzips and parses its own file, and only the header probe
  * of the first file runs on the driver (to fix the schema). All cells
  * surface as nullable strings — spreadsheet cells carry no trustworthy
  * types; conforming/casting is SchemaNormalizer's job downstream.
  */
object Xlsx {

  /** Parse one workbook: (header row, data rows), all strings, rows padded/
    * truncated to the header width. Understands t="s" (shared string),
    * t="inlineStr", and value cells (numbers, formula results). */
  def parse(content: Array[Byte]): (Seq[String], Seq[Seq[String]]) = {
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var sheet: Option[Array[Byte]] = None
    val zin = new ZipInputStream(new ByteArrayInputStream(content))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        e.getName match {
          case "xl/sharedStrings.xml" => shared = parseSharedStrings(zin.readAllBytes())
          case n if sheet.isEmpty && n.matches("xl/worksheets/sheet\\d+\\.xml") =>
            sheet = Some(zin.readAllBytes())
          case _ => ()
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    val rows = parseSheet(
      sheet.getOrElse(throw new IllegalArgumentException("no worksheet in xlsx")),
      shared)
    if (rows.isEmpty) (Seq.empty, Seq.empty)
    else {
      val header = rows.head
      val width = header.length
      (header, rows.tail.map(r => r.padTo(width, null: String).take(width)))
    }
  }

  /** <si> items: plain <t> or rich-text runs (<r><t>..</t></r> concatenated). */
  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val out = ArrayBuffer[String]()
    val r = XMLInputFactory.newInstance().createXMLStreamReader(new ByteArrayInputStream(bytes))
    var cur: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "si" => cur = new StringBuilder
          case "t" if cur != null => inT = true
          case _ => ()
        }
        case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "t" => inT = false
          case "si" => out += cur.toString; cur = null
          case _ => ()
        }
        case _ => ()
      }
    }
    r.close()
    out.toIndexedSeq
  }

  /** Sheet rows: each <row> of <c r="A1" [t=...]><v>..</v> or <is><t>..</t>.
    * Missing cells (sparse refs) become nulls at their column position. */
  private def parseSheet(bytes: Array[Byte], shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val rows = ArrayBuffer[Seq[String]]()
    val r = XMLInputFactory.newInstance().createXMLStreamReader(new ByteArrayInputStream(bytes))
    var row: ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var text: StringBuilder = null
    var capture = false
    def endCell(): Unit = if (row != null && cellCol >= 0) {
      val raw = if (text == null) null else text.toString
      val v = cellType match {
        case "s" if raw != null => shared(raw.trim.toInt)
        case _ => raw
      }
      while (row.length <= cellCol) row += null
      row(cellCol) = v
      cellCol = -1; text = null
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row = ArrayBuffer[String]()
          case "c" =>
            val ref = Option(r.getAttributeValue(null, "r"))
            cellCol = ref.map(colIndex).getOrElse(row.length)
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
          case "v" | "t" if cellCol >= 0 =>
            capture = true; if (text == null) text = new StringBuilder
          case _ => ()
        }
        case XMLStreamConstants.CHARACTERS if capture => text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" | "t" => capture = false
          case "c" => endCell()
          case "row" => rows += row.toSeq; row = null
          case _ => ()
        }
        case _ => ()
      }
    }
    r.close()
    rows.toSeq
  }

  /** "BC23" → 0-based column index (A=0, Z=25, AA=26 …). */
  private[sources] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  /** Read xlsx file(s) at `path` (file, directory, or glob) into one string
    * DataFrame. The schema comes from the first file's header (driver-side
    * probe of one small file); every file parses on an executor and aligns
    * its own header to the canonical one by name, so heterogeneous column
    * orders union cleanly. */
  def read(s: SparkSession, path: String): DataFrame = {
    val files = s.read.format("binaryFile").load(path).select("path", "content")
    val firstBytes = files.orderBy(col("path")).select("content")
      .head().getAs[Array[Byte]](0)
    val header = parse(firstBytes)._1
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val rows = files.select("content").rdd.flatMap { r =>
      val (h, data) = parse(r.getAs[Array[Byte]](0))
      val idx = header.map(h.indexOf)
      data.map(cells => Row.fromSeq(idx.map(i => if (i < 0) null else cells(i))))
    }
    s.createDataFrame(rows, schema)
  }
}
