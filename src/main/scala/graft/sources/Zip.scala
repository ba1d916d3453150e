package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ZIP container ingest — the archive format document corpora hide
  * inside (docx/xlsx/epub are zips; crawl dumps carry them by the
  * million). Dependency-free writer + reader over the real PKZIP
  * structures: local file headers, central directory, and the
  * End-Of-Central-Directory record found by BACKWARD scan (the
  * only correct way — EOCD carries a variable-length comment, so a
  * fixed offset from EOF is wrong for any commented archive, and
  * this one always has a comment). Entry payloads mix STORED and
  * DEFLATED (JDK Deflater/Inflater, raw mode) and every CRC32 is
  * verified on read — a corrupt byte anywhere fails loudly.
  */
object Zip {

  private val DosTime = (10 << 11) | (30 << 5)              // 10:30:00
  private val DosDate = ((2024 - 1980) << 9) | (1 << 5) | 15 // 2024-01-15

  private def entriesOf(docId: Long, text: String,
      lang: String): Seq[(String, Array[Byte], Int)] = {
    val txt = text.take(100).getBytes("UTF-8")
    val meta = s"""{"id":$docId,"lang":"$lang"}""".getBytes("UTF-8")
    val nBin = (docId % 50 + 10).toInt
    val bin = Array.tabulate(nBin)(i => ((docId * 19 + i * 23) % 256).toByte)
    Seq(("doc.txt", txt, 8), ("meta.json", meta, 0), ("data.bin", bin, 0))
  }

  /** Write a real ZIP: per entry a local file header + (possibly
    * deflated) payload, then the central directory, then a
    * comment-bearing EOCD. doc.txt is DEFLATED (raw deflate,
    * the ZIP convention), meta.json and data.bin are STORED. */
  private[graft] def synthesizeZip(docId: Long, text: String,
      lang: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val cd = new java.io.ByteArrayOutputStream()
    def w16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
    }
    def w32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
      w16(o, (v & 0xffff).toInt); w16(o, ((v >>> 16) & 0xffff).toInt)
    }
    val ents = entriesOf(docId, text, lang)
    ents.foreach { case (name, data, method) =>
      val crcC = new java.util.zip.CRC32(); crcC.update(data)
      val crc = crcC.getValue
      val cdata =
        if (method == 8) {
          val defl = new java.util.zip.Deflater(6, true) // raw deflate
          defl.setInput(data); defl.finish()
          val zo = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          while (!defl.finished()) zo.write(buf, 0, defl.deflate(buf))
          defl.end()
          zo.toByteArray
        } else data
      val nameB = name.getBytes("US-ASCII")
      val off = out.size()
      w32(out, 0x04034b50L); w16(out, 20); w16(out, 0); w16(out, method)
      w16(out, DosTime); w16(out, DosDate)
      w32(out, crc); w32(out, cdata.length.toLong); w32(out, data.length.toLong)
      w16(out, nameB.length); w16(out, 0)
      out.write(nameB); out.write(cdata)
      w32(cd, 0x02014b50L); w16(cd, 20); w16(cd, 20); w16(cd, 0); w16(cd, method)
      w16(cd, DosTime); w16(cd, DosDate)
      w32(cd, crc); w32(cd, cdata.length.toLong); w32(cd, data.length.toLong)
      w16(cd, nameB.length); w16(cd, 0); w16(cd, 0); w16(cd, 0); w16(cd, 0)
      w32(cd, 0L); w32(cd, off.toLong)
      cd.write(nameB)
    }
    val cdBytes = cd.toByteArray
    val cdOff = out.size()
    out.write(cdBytes)
    val comment = "graft".getBytes("US-ASCII")
    w32(out, 0x06054b50L); w16(out, 0); w16(out, 0)
    w16(out, ents.length); w16(out, ents.length)
    w32(out, cdBytes.length.toLong); w32(out, cdOff.toLong)
    w16(out, comment.length); out.write(comment)
    out.toByteArray
  }

  /** Read a ZIP the correct way: backward-scan for the EOCD
    * signature, validate its comment length against EOF, walk the
    * central directory, and for each entry cross-check the local
    * header's name, inflate/copy the payload, and verify size and
    * CRC32. Methods other than STORED/DEFLATED fail loudly. */
  private[graft] def parseZip(bytes: Array[Byte]): Seq[(String, Array[Byte], Int)] = {
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    var eocd = -1
    var i = bytes.length - 22
    while (eocd < 0 && i >= 0) {
      if (u32(i) == 0x06054b50L) eocd = i else i -= 1
    }
    require(eocd >= 0, "no EOCD record (not a ZIP?)")
    val nTotal = u16(eocd + 10)
    val cdOff = u32(eocd + 16).toInt
    val commentLen = u16(eocd + 20)
    require(eocd + 22 + commentLen == bytes.length,
      s"EOCD comment length $commentLen does not reach EOF")
    val ents = Seq.newBuilder[(String, Array[Byte], Int)]
    var pos = cdOff
    var k = 0
    while (k < nTotal) {
      require(pos >= 0 && pos + 46 <= bytes.length, s"central directory truncated at $pos")
      require(u32(pos) == 0x02014b50L, s"bad central-directory signature at $pos")
      val method = u16(pos + 10)
      val crc = u32(pos + 16)
      val csize = u32(pos + 20).toInt; val usize = u32(pos + 24).toInt
      val nlen = u16(pos + 28); val elen = u16(pos + 30); val klen = u16(pos + 32)
      val off = u32(pos + 42).toInt
      require(pos + 46 + nlen <= bytes.length, "central-directory name truncated")
      val name = new String(bytes, pos + 46, nlen, "US-ASCII")
      pos += 46 + nlen + elen + klen
      require(off >= 0 && off + 30 <= bytes.length, s"$name: local header out of range")
      require(u32(off) == 0x04034b50L, s"bad local header signature for $name")
      require(u16(off + 8) == method, s"$name: LFH/CD method mismatch")
      val lnlen = u16(off + 26); val lelen = u16(off + 28)
      require(off + 30 + lnlen <= bytes.length, s"$name: local header name truncated")
      require(new String(bytes, off + 30, lnlen, "US-ASCII") == name,
        s"LFH/CD name mismatch at $name")
      val dstart = off + 30 + lnlen + lelen
      require(dstart + csize <= bytes.length, s"$name payload out of range")
      val data: Array[Byte] = method match {
        case 0 =>
          require(csize == usize, s"$name: stored sizes differ")
          java.util.Arrays.copyOfRange(bytes, dstart, dstart + csize)
        case 8 =>
          val inf = new java.util.zip.Inflater(true) // raw deflate
          inf.setInput(bytes, dstart, csize)
          val outB = new Array[Byte](usize)
          var done = 0
          while (done < usize && !inf.finished())
            done += inf.inflate(outB, done, usize - done)
          require(done == usize && inf.getRemaining == 0,
            s"$name: inflated $done of $usize bytes")
          inf.end()
          outB
        case m => throw new IllegalArgumentException(s"$name: unsupported method $m")
      }
      val c = new java.util.zip.CRC32(); c.update(data)
      require(c.getValue == crc, s"$name: CRC mismatch")
      ents += ((name, data, method))
      k += 1
    }
    ents.result()
  }

  case class ZipDoc(doc_id: Long, n_entries: Int, total_usize: Long,
      text_hash: Long, bin_sum: Long)

  /** REAL ZIP ingest over synthesized archives — per doc the archive
    * round-trips write → bytes → EOCD/CD/LFH parse → inflate → CRC
    * verify, and the frame reports entry count, total uncompressed
    * size, the polyhash of the deflated text entry (the Deflater→
    * Inflater loop is load-bearing) and the stored binary entry's
    * byte sum. The oracle reconstructs all of it closed-form from
    * the documents table — compressed sizes are deliberately NOT in
    * the contract (they depend on the deflate implementation).
    *
    * Plan: stateless partition-local round-trip (mapPartitions with
    * a case-class Encoder), no shuffle at all. */
  def zipIngest(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text, lang) =>
          val ents = parseZip(synthesizeZip(id, text, lang))
          require(ents.map(_._1) == Seq("doc.txt", "meta.json", "data.bin"),
            s"doc $id: unexpected entry list")
          val txt = new String(ents.head._2, "UTF-8")
          ZipDoc(id, ents.length,
            ents.map(_._2.length.toLong).sum,
            graft.functions.PolyHash.hash(txt),
            ents(2)._2.map(b => (b.toInt & 0xff).toLong).sum)
        }
      }.toDF()
  }
}
