package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PDF text extraction — the #1 document format of any crawl, and
  * the extraction step every document-heavy training corpus runs.
  * Dependency-free over the REAL PDF 1.4 machinery: the parse is
  * XREF-DRIVEN (startxref → xref table of 20-byte entries → trailer
  * /Root), walks Catalog → Pages → Page → /Contents through a small
  * recursive object parser (dicts, names, numbers, indirect
  * references, arrays), inflates the FlateDecode content stream
  * (RFC 1950 zlib, JDK Inflater), and tokenizes the text operators —
  * `(string) Tj` with PDF string escapes, which the synthesized line
  * `doc (N)` makes load-bearing: its parentheses MUST ride escaped
  * and unescape on the way out or every hash breaks.
  */
object Pdf {

  private def escPdfString(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  private[graft] def linesOf(docId: Long, text: String): Seq[String] = {
    val words = text.split(' ')
    Seq(s"doc ($docId)",
      words.slice(1, 5).mkString(" "),
      words.slice(5, 9).mkString(" "))
  }

  /** Write a real 5-object PDF 1.4: catalog, pages tree, page with
    * MediaBox and font resource, a FlateDecode content stream of
    * BT/Tf/Td/Tj text operators, and a Type1 font — then the xref
    * table (exact 20-byte entries, byte-accurate offsets), trailer,
    * startxref. A wrong offset anywhere kills the parse. */
  private[graft] def synthesizePdf(docId: Long, text: String): Array[Byte] = {
    val lines = linesOf(docId, text)
    val content = new StringBuilder("BT\n/F1 12 Tf\n72 720 Td\n")
    lines.zipWithIndex.foreach { case (ln, i) =>
      if (i > 0) content.append("0 -14 Td\n")
      content.append(s"(${escPdfString(ln)}) Tj\n")
    }
    content.append("ET\n")
    val defl = new java.util.zip.Deflater()
    defl.setInput(content.toString.getBytes("ISO-8859-1")); defl.finish()
    val zo = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) zo.write(buf, 0, defl.deflate(buf))
    defl.end()
    val cz = zo.toByteArray
    val objs: Seq[Array[Byte]] = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes("ISO-8859-1"),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes("ISO-8859-1"),
      ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
        .getBytes("ISO-8859-1"),
      (s"<< /Length ${cz.length} /Filter /FlateDecode >>\nstream\n"
        .getBytes("ISO-8859-1") ++ cz ++ "\nendstream".getBytes("ISO-8859-1")),
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>".getBytes("ISO-8859-1"))
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.4\n".getBytes("ISO-8859-1"))
    out.write(Array(0x25, 0xe2, 0xe3, 0xcf, 0xd3, 0x0a).map(_.toByte)) // binary marker
    val offsets = Array.ofDim[Int](objs.length + 1)
    objs.zipWithIndex.foreach { case (o, i) =>
      offsets(i + 1) = out.size()
      out.write(s"${i + 1} 0 obj\n".getBytes("ISO-8859-1"))
      out.write(o)
      out.write("\nendobj\n".getBytes("ISO-8859-1"))
    }
    val xrefOff = out.size()
    out.write(s"xref\n0 ${objs.length + 1}\n".getBytes("ISO-8859-1"))
    out.write("0000000000 65535 f\r\n".getBytes("ISO-8859-1"))
    (1 to objs.length).foreach { i =>
      out.write(f"${offsets(i)}%010d 00000 n\r\n".getBytes("ISO-8859-1"))
    }
    out.write((s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n").getBytes("ISO-8859-1"))
    out.toByteArray
  }

  // ---- minimal PDF object model ----
  private[graft] sealed trait PVal
  private[graft] case class PName(s: String) extends PVal
  private[graft] case class PNum(v: Double) extends PVal
  private[graft] case class PRef(n: Int) extends PVal
  private[graft] case class PArr(xs: Vector[PVal]) extends PVal
  private[graft] case class PDict(m: Map[String, PVal]) extends PVal

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\r' || b == '\n'
  private def isDelim(c: Char): Boolean = " \t\r\n/<>[](".contains(c)

  /** Parse `<< /Key value … >>` at `pos`; returns (dict, end). */
  private[graft] def parseDict(b: Array[Byte], pos0: Int): (PDict, Int) = {
    require(b(pos0) == '<' && b(pos0 + 1) == '<', s"no dict at $pos0")
    var pos = pos0 + 2
    val m = Map.newBuilder[String, PVal]
    while (true) {
      while (isWs(b(pos))) pos += 1
      if (b(pos) == '>' && b(pos + 1) == '>') return (PDict(m.result()), pos + 2)
      require(b(pos) == '/', s"expected /Name in dict at $pos, got '${b(pos).toChar}'")
      pos += 1
      val k = new StringBuilder
      while (!isDelim(b(pos).toChar)) { k.append(b(pos).toChar); pos += 1 }
      val (v, p2) = parseValue(b, pos)
      pos = p2
      m += k.toString -> v
    }
    throw new IllegalStateException("unreachable")
  }

  /** Parse one value: name, number, indirect reference `n g R`,
    * array, or nested dict. (Strings never appear in these dicts.) */
  private[graft] def parseValue(b: Array[Byte], pos0: Int): (PVal, Int) = {
    var pos = pos0
    while (isWs(b(pos))) pos += 1
    if (b(pos) == '<' && b(pos + 1) == '<') return parseDict(b, pos)
    if (b(pos) == '/') {
      pos += 1
      val v = new StringBuilder
      while (!isDelim(b(pos).toChar)) { v.append(b(pos).toChar); pos += 1 }
      return (PName(v.toString), pos)
    }
    if (b(pos) == '[') {
      pos += 1
      val xs = Vector.newBuilder[PVal]
      while (true) {
        while (isWs(b(pos))) pos += 1
        if (b(pos) == ']') return (PArr(xs.result()), pos + 1)
        val (v, p2) = parseValue(b, pos)
        xs += v
        pos = p2
      }
    }
    val num = new StringBuilder
    while ("0123456789+-.".contains(b(pos).toChar)) { num.append(b(pos).toChar); pos += 1 }
    require(num.nonEmpty, s"cannot parse value at $pos0")
    val save = pos
    // lookahead for "<gen> R" — an indirect reference
    while (pos < b.length && b(pos) == ' ') pos += 1
    val gen = new StringBuilder
    while (pos < b.length && b(pos).toChar.isDigit) { gen.append(b(pos).toChar); pos += 1 }
    while (pos < b.length && b(pos) == ' ') pos += 1
    if (gen.nonEmpty && pos < b.length && b(pos) == 'R')
      (PRef(num.toString.toInt), pos + 1)
    else (PNum(num.toString.toDouble), save)
  }

  private val ObjHeader = """(\d+) 0 obj\s*""".r

  private def objAt(b: Array[Byte], offsets: Map[Int, Int], n: Int): Int = {
    val pos = offsets.getOrElse(n,
      throw new IllegalArgumentException(s"object $n not in xref"))
    require(pos >= 0 && pos < b.length,
      s"xref offset $pos for object $n is outside the file")
    val head = new String(b, pos, math.min(32, b.length - pos), "ISO-8859-1")
    ObjHeader.findPrefixMatchOf(head) match {
      case Some(m) if m.group(1).toInt == n => pos + m.end
      case _ => throw new IllegalArgumentException(
        s"xref offset $pos does not hit object $n")
    }
  }

  /** Extract the strings of `(…) Tj` operators, unescaping PDF string
    * escapes (\( \) \\ \n \r \t and octal \ddd). Fails loudly if a
    * string is not followed by Tj — this extractor is for pure text
    * content streams. */
  private[graft] def extractText(content: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < content.length) {
      if (content(i) == '(') {
        var j = i + 1
        val s = new StringBuilder
        while (content(j) != ')') {
          if (content(j) == '\\') {
            content(j + 1) match {
              case 'n' => s.append('\n'); j += 2
              case 'r' => s.append('\r'); j += 2
              case 't' => s.append('\t'); j += 2
              case '(' => s.append('('); j += 2
              case ')' => s.append(')'); j += 2
              case '\\' => s.append('\\'); j += 2
              case d if d.isDigit =>
                val oct = content.substring(j + 1, j + 1 +
                  (1 to 3).takeWhile(k => j + k < content.length &&
                    content(j + k).isDigit).lastOption.getOrElse(1))
                s.append(Integer.parseInt(oct, 8).toChar); j += 1 + oct.length
              case c => throw new IllegalArgumentException(s"bad escape \\$c")
            }
          } else { s.append(content(j)); j += 1 }
        }
        var k = j + 1
        while (isWs(content(k).toByte)) k += 1
        require(content.startsWith("Tj", k), s"string at $i not followed by Tj")
        out += s.toString
        i = k + 2
      } else i += 1
    }
    out.result()
  }

  case class PdfText(n_objects: Int, n_pages: Int, media_w: Int,
      media_h: Int, lines: Seq[String])

  /** Full xref-driven parse of one PDF: header check, startxref,
    * xref entries, trailer /Root, catalog → pages → per page the
    * MediaBox and the inflated /Contents text. Arbitrary truncation
    * anywhere inside the token walk converts to the decoder's
    * contractual IllegalArgumentException — never a raw index
    * error. */
  private[graft] def parsePdf(bytes: Array[Byte]): PdfText =
    try parsePdfImpl(bytes)
    catch {
      case _: IndexOutOfBoundsException =>
        throw new IllegalArgumentException("truncated or malformed PDF")
    }

  private def parsePdfImpl(bytes: Array[Byte]): PdfText = {
    require(bytes.length > 8 && new String(bytes, 0, 5, "ISO-8859-1") == "%PDF-",
      "not a PDF (bad header)")
    val whole = new String(bytes, "ISO-8859-1")
    val sx = whole.lastIndexOf("startxref")
    require(sx >= 0, "no startxref")
    var e = sx + "startxref".length
    while (isWs(bytes(e))) e += 1
    val num = new StringBuilder
    while (bytes(e).toChar.isDigit) { num.append(bytes(e).toChar); e += 1 }
    val xrefOff = num.toString.toInt
    require(whole.startsWith("xref", xrefOff), "startxref does not hit the xref table")
    var p = xrefOff + 4
    while (isWs(bytes(p))) p += 1
    val hdr = new StringBuilder
    while (bytes(p) != '\r' && bytes(p) != '\n') { hdr.append(bytes(p).toChar); p += 1 }
    val Array(start, count) = hdr.toString.trim.split("\\s+").map(_.toInt)
    while (bytes(p) == '\r' || bytes(p) == '\n') p += 1
    val offsets = Map.newBuilder[Int, Int]
    (0 until count).foreach { i =>
      val ent = new String(bytes, p, 20, "ISO-8859-1")
      require(ent.length == 20, "short xref entry")
      if (ent(17) == 'n') offsets += (start + i) -> ent.substring(0, 10).toInt
      p += 20
    }
    val offs = offsets.result()
    val t = whole.indexOf("trailer", p)
    require(t >= 0, "no trailer")
    val (trailer, _) = parseDict(bytes, whole.indexOf("<<", t))
    val root = trailer.m("Root").asInstanceOf[PRef].n
    val (cat, _) = parseDict(bytes, objAt(bytes, offs, root))
    require(cat.m.get("Type").contains(PName("Catalog")), "root is not a /Catalog")
    val pagesRef = cat.m("Pages").asInstanceOf[PRef].n
    val (pages, _) = parseDict(bytes, objAt(bytes, offs, pagesRef))
    require(pages.m.get("Type").contains(PName("Pages")), "not a /Pages node")
    val nPages = pages.m("Count").asInstanceOf[PNum].v.toInt
    var mediaW = 0; var mediaH = 0
    val lines = Seq.newBuilder[String]
    pages.m("Kids").asInstanceOf[PArr].xs.foreach { kid =>
      val (page, _) = parseDict(bytes, objAt(bytes, offs, kid.asInstanceOf[PRef].n))
      require(page.m.get("Type").contains(PName("Page")), "kid is not a /Page")
      val mb = page.m("MediaBox").asInstanceOf[PArr].xs.map(_.asInstanceOf[PNum].v)
      mediaW = mb(2).toInt; mediaH = mb(3).toInt
      val contRef = page.m("Contents").asInstanceOf[PRef].n
      val (sd, spos) = parseDict(bytes, objAt(bytes, offs, contRef))
      require(sd.m.get("Filter").contains(PName("FlateDecode")),
        "unsupported content-stream filter")
      val len = sd.m("Length").asInstanceOf[PNum].v.toInt
      var q = spos
      while (isWs(bytes(q))) q += 1
      require(whole.startsWith("stream", q), "missing stream keyword")
      q += 6
      if (bytes(q) == '\r' && bytes(q + 1) == '\n') q += 2
      else if (bytes(q) == '\n') q += 1
      val inf = new java.util.zip.Inflater()
      inf.setInput(bytes, q, len)
      val outB = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!inf.finished()) {
        val got = inf.inflate(buf)
        require(got > 0 || inf.finished(), "truncated FlateDecode stream")
        outB.write(buf, 0, got)
      }
      inf.end()
      lines ++= extractText(new String(outB.toByteArray, "ISO-8859-1"))
    }
    PdfText(offs.size + 1, nPages, mediaW, mediaH, lines.result())
  }

  case class PdfDoc(doc_id: Long, n_objects: Int, n_pages: Int,
      media_w: Int, media_h: Int, n_lines: Int, text_hash: Long)

  /** REAL PDF text extraction over synthesized documents — per doc
    * the PDF round-trips write → bytes → xref-driven parse →
    * FlateDecode → Tj extraction, and the frame reports structure
    * counts, the MediaBox, and the polyhash of the extracted lines.
    * The oracle reconstructs the line text closed-form from the
    * documents table — an offset, filter, escape, or operator bug
    * breaks the hash match.
    *
    * Plan: stateless partition-local round-trip (mapPartitions with
    * a case-class Encoder), no shuffle at all. */
  def pdfIngest(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val r = parsePdf(synthesizePdf(id, text))
          require(r.lines == linesOf(id, text), s"doc $id: extracted text drifted")
          PdfDoc(id, r.n_objects, r.n_pages, r.media_w, r.media_h,
            r.lines.length, graft.functions.PolyHash.hash(r.lines.mkString("\n")))
        }
      }.toDF()
  }
}
