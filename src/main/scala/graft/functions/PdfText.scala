package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Minimal pure-JVM text extractor for UNCOMPRESSED text-object PDFs — the
  * PyPDF2 arm of the reference's extract_text_from_bytes
  * (text_processor.py:65-97). Covers the subset a text-only generated PDF
  * uses, which is also the subset a filter-free scanner can extract without
  * a decompression codec:
  *
  *   - `BT ... ET` text objects anywhere in the file, in byte order;
  *   - literal strings `( ... )` with the full escape set — \n \r \t \b \f,
  *     \( \) \\, 1-3 digit octal codes, line-continuation backslash — and
  *     PDF's balanced-unescaped-paren nesting rule;
  *   - hex strings `<...>` (odd final nibble padded with 0 per spec);
  *   - all show operators take their text from those operands (Tj, ', ",
  *     and TJ arrays — numeric kerning entries are skipped).
  *
  * Text parts within one BT..ET block concatenate; blocks join with '\n'
  * (the reference joins page texts with '\n', text_processor.py:75).
  *
  * Out-of-scope inputs fail CLOSED to "" exactly like the reference's
  * except-branch: a missing %PDF- header, or any /Filter'd stream
  * (FlateDecode etc. — no codec here). Byte-level scanning is genuinely
  * imperative, so callers run this behind a mapPartitions arm — the
  * decode-rung exception to the no-UDF rule (same as Multimodal.decodeStub).
  *
  * PDF string/stream bytes are charset-opaque; the scanner works on raw
  * bytes and decodes the collected text as UTF-8 at the very end (the
  * encoding our synthesized fixtures and the reference's corpus use).
  */
object PdfText {

  def extractText(bytes: Array[Byte]): String = {
    if (bytes.length < 5 ||
      !(bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' &&
        bytes(3) == 'F' && bytes(4) == '-')) return ""
    if (indexOfToken(bytes, "/Filter") >= 0) return "" // compressed: unsupported
    val blocks = ArrayBuffer[String]()
    var i = 0
    while (i < bytes.length) {
      val bt = indexOfOperator(bytes, "BT", i)
      if (bt < 0) { i = bytes.length }
      else {
        val (block, next) = readTextObject(bytes, bt + 2)
        if (block.nonEmpty) blocks += block
        i = next
      }
    }
    blocks.mkString("\n")
  }

  /** Scan one BT..ET body; returns (concatenated shown text, index after ET). */
  private def readTextObject(bytes: Array[Byte], from: Int): (String, Int) = {
    val out = new java.io.ByteArrayOutputStream()
    var i = from
    while (i < bytes.length) {
      bytes(i) match {
        case '(' =>
          i = readLiteralString(bytes, i, out)
        case '<' if i + 1 < bytes.length && bytes(i + 1) != '<' =>
          i = readHexString(bytes, i, out)
        case '<' => i += 2 // '<<' dictionary open — skip both
        case 'E' if isOperatorAt(bytes, "ET", i) =>
          return (new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8), i + 2)
        case _ => i += 1
      }
    }
    // unterminated text object: emit what we saw (PyPDF2 is similarly lenient)
    (new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8), i)
  }

  /** PDF literal string: bytes(start) == '('. Returns index after the
    * closing paren; decoded bytes appended to `out`. */
  private def readLiteralString(bytes: Array[Byte], start: Int,
      out: java.io.ByteArrayOutputStream): Int = {
    var i = start + 1
    var depth = 1
    while (i < bytes.length && depth > 0) {
      bytes(i) match {
        case '\\' if i + 1 < bytes.length =>
          bytes(i + 1) match {
            case 'n' => out.write('\n'); i += 2
            case 'r' => out.write('\r'); i += 2
            case 't' => out.write('\t'); i += 2
            case 'b' => out.write('\b'); i += 2
            case 'f' => out.write('\f'); i += 2
            case '\n' => i += 2 // line continuation: both chars vanish
            case '\r' => // \CR or \CRLF continuation
              i += (if (i + 2 < bytes.length && bytes(i + 2) == '\n') 3 else 2)
            case d if d >= '0' && d <= '7' => // 1-3 octal digits
              var v = 0; var n = 0; var j = i + 1
              while (n < 3 && j < bytes.length && bytes(j) >= '0' && bytes(j) <= '7') {
                v = v * 8 + (bytes(j) - '0'); n += 1; j += 1
              }
              out.write(v & 0xff); i = j
            case c => out.write(c); i += 2 // incl. \( \) \\ and unknown escapes
          }
        case '(' => depth += 1; out.write('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) out.write(')')
          i += 1
        case b => out.write(b); i += 1
      }
    }
    i
  }

  /** PDF hex string: bytes(start) == '<'. Odd nibble count pads 0 per spec. */
  private def readHexString(bytes: Array[Byte], start: Int,
      out: java.io.ByteArrayOutputStream): Int = {
    var i = start + 1
    var hi = -1
    while (i < bytes.length && bytes(i) != '>') {
      val c = bytes(i).toChar
      val v = Character.digit(c, 16)
      if (v >= 0) {
        if (hi < 0) hi = v
        else { out.write(hi * 16 + v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi * 16) // odd final nibble
    i + 1
  }

  /** Operator-token match: `tok` at `pos`, delimited on both sides. */
  private def isOperatorAt(bytes: Array[Byte], tok: String, pos: Int): Boolean = {
    if (pos + tok.length > bytes.length) return false
    var k = 0
    while (k < tok.length) {
      if (bytes(pos + k) != tok.charAt(k)) return false
      k += 1
    }
    val beforeOk = pos == 0 || isDelimiter(bytes(pos - 1))
    val afterOk = pos + tok.length == bytes.length || isDelimiter(bytes(pos + tok.length))
    beforeOk && afterOk
  }

  private def indexOfOperator(bytes: Array[Byte], tok: String, from: Int): Int = {
    var i = from
    while (i <= bytes.length - tok.length) {
      if (bytes(i) == tok.charAt(0) && isOperatorAt(bytes, tok, i)) return i
      i += 1
    }
    -1
  }

  /** Raw substring search (for names like /Filter — '/' is its own delimiter). */
  private def indexOfToken(bytes: Array[Byte], tok: String): Int = {
    var i = 0
    while (i <= bytes.length - tok.length) {
      var k = 0
      while (k < tok.length && bytes(i + k) == tok.charAt(k)) k += 1
      if (k == tok.length) return i
      i += 1
    }
    -1
  }

  private def isDelimiter(b: Byte): Boolean = b match {
    case ' ' | '\t' | '\r' | '\n' | '\f' | 0 => true
    case '(' | ')' | '<' | '>' | '[' | ']' | '{' | '}' | '/' | '%' => true
    case _ => false
  }
}
