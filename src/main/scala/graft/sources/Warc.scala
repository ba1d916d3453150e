package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC/1.0 ingest — the container format web-crawl corpora actually
  * ship in (ISO 28500; CommonCrawl's on-disk format). Dependency-free
  * record walker + embedded-HTTP parser over synthesized but
  * byte-faithful WARC streams.
  *
  * Framing is CONTENT-LENGTH-DRIVEN, never delimiter-scanned: every
  * synthesized response body contains a literal CRLFCRLF sequence, so
  * a parser that splits records on blank lines mis-frames and breaks
  * the oracle hash. Each record is `WARC/1.0` + headers + CRLFCRLF +
  * exactly Content-Length payload bytes + CRLFCRLF trailer; header
  * names are matched case-insensitively per the spec.
  */
object Warc {

  private def bodyOf(docId: Long, text: String): String =
    s"<html>\r\n\r\n<title>doc $docId</title>${text.take(60)}</html>"

  /** Synthesize one WARC stream per document: a warcinfo record, a
    * metadata record on even ids (so record COUNT is id-dependent and
    * the full walk is load-bearing), and an HTTP response record —
    * status 404 on ids divisible by 7, else 200 — whose body follows
    * a closed form over the doc text. */
  private[graft] def synthesizeWarc(docId: Long, text: String,
      source: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def rec(rtype: String, headers: Seq[(String, String)],
        payload: Array[Byte]): Unit = {
      val h = new StringBuilder(s"WARC/1.0\r\nWARC-Type: $rtype\r\n")
      headers.foreach { case (k, v) => h.append(s"$k: $v\r\n") }
      h.append(s"Content-Length: ${payload.length}\r\n\r\n")
      out.write(h.toString.getBytes("UTF-8"))
      out.write(payload)
      out.write("\r\n\r\n".getBytes("US-ASCII"))
    }
    val uri = f"http://$source.example.com/doc/$docId"
    rec("warcinfo",
      Seq("WARC-Record-ID" -> f"<urn:uuid:$docId%08x-info>"),
      "software: graft-crawler/1.0\r\n".getBytes("US-ASCII"))
    if (docId % 2 == 0)
      rec("metadata",
        Seq("WARC-Record-ID" -> f"<urn:uuid:$docId%08x-meta>",
          "WARC-Target-URI" -> uri),
        "fetchTimeMs: 12\r\n".getBytes("US-ASCII"))
    val status = if (docId % 7 == 0) 404 else 200
    val body = bodyOf(docId, text).getBytes("UTF-8")
    val http = (s"HTTP/1.1 $status ${if (status == 404) "Not Found" else "OK"}\r\n" +
      s"Content-Type: text/html\r\nContent-Length: ${body.length}\r\n\r\n")
      .getBytes("US-ASCII") ++ body
    rec("response",
      Seq("WARC-Record-ID" -> f"<urn:uuid:$docId%08x-resp>",
        "WARC-Target-URI" -> uri,
        "WARC-Date" -> "2024-01-01T00:00:00Z"),
      http)
    out.toByteArray
  }

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Walk a WARC stream into (type, lower-cased headers, payload)
    * records. Content-Length drives every payload read; the CRLFCRLF
    * record trailer is verified, so a framing slip fails loudly
    * instead of smearing into the next record. */
  private[graft] def parseWarc(bytes: Array[Byte]): Vector[(String, Map[String, String], Array[Byte])] = {
    val recs = Vector.newBuilder[(String, Map[String, String], Array[Byte])]
    var pos = 0
    while (pos < bytes.length) {
      val he = indexOfCrlfCrlf(bytes, pos)
      require(he >= 0, "unterminated WARC header block")
      val head = new String(bytes, pos, he - pos, "UTF-8")
      val lines = head.split("\r\n")
      require(lines(0) == "WARC/1.0", s"bad WARC version line '${lines(0)}'")
      val hdrs = lines.drop(1).map { ln =>
        val i = ln.indexOf(':')
        require(i > 0, s"malformed WARC header '$ln'")
        ln.substring(0, i).trim.toLowerCase -> ln.substring(i + 1).trim
      }.toMap
      require(hdrs.contains("content-length"), "record without Content-Length")
      val clen = hdrs("content-length").toInt
      require(he + 4 + clen + 4 <= bytes.length, "truncated WARC payload")
      val payload = java.util.Arrays.copyOfRange(bytes, he + 4, he + 4 + clen)
      require(bytes(he + 4 + clen) == '\r' && bytes(he + 5 + clen) == '\n' &&
        bytes(he + 6 + clen) == '\r' && bytes(he + 7 + clen) == '\n',
        "missing CRLFCRLF record trailer")
      recs += ((hdrs("warc-type"), hdrs, payload))
      pos = he + 4 + clen + 4
    }
    recs.result()
  }

  /** Parse the HTTP response embedded in a WARC response record:
    * status line + case-insensitive headers + exactly Content-Length
    * body bytes. */
  private[graft] def parseHttp(payload: Array[Byte]): (Int, Array[Byte]) = {
    val he = indexOfCrlfCrlf(payload, 0)
    require(he >= 0, "unterminated HTTP header block")
    val lines = new String(payload, 0, he, "UTF-8").split("\r\n")
    val parts = lines(0).split(" ")
    require(parts.length >= 2 && parts(0).startsWith("HTTP/"),
      s"bad HTTP status line '${lines(0)}'")
    val status = parts(1).toInt
    val hdrs = lines.drop(1).map { ln =>
      val i = ln.indexOf(':')
      ln.substring(0, i).trim.toLowerCase -> ln.substring(i + 1).trim
    }.toMap
    val clen = hdrs("content-length").toInt
    require(he + 4 + clen <= payload.length, "truncated HTTP body")
    (status, java.util.Arrays.copyOfRange(payload, he + 4, he + 4 + clen))
  }

  case class WarcDoc(doc_id: Long, n_records: Int, status: Int,
      host: String, body_len: Long, body_hash: Long)

  /** REAL WARC ingest over synthesized crawl streams — per doc the
    * stream round-trips through [[synthesizeWarc]] → bytes →
    * [[parseWarc]]/[[parseHttp]], and the frame reports the record
    * count, HTTP status, target host, and the parsed body's length
    * and polyhash. The DuckDB oracle reconstructs the body
    * closed-form from the documents table — a framing, header-case,
    * or Content-Length bug breaks the hash match.
    *
    * Plan: stateless partition-local synthesis+parse (mapPartitions
    * with a case-class Encoder — the batch shape a real WARC reader
    * over binary files would use), no shuffle at all. */
  def warcIngest(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text, source) =>
          val recs = parseWarc(synthesizeWarc(id, text, source))
          val resp = recs.filter(_._1 == "response")
          require(resp.length == 1, s"doc $id: ${resp.length} response records")
          val (status, body) = parseHttp(resp.head._3)
          val uri = resp.head._2("warc-target-uri")
          val host = uri.split("/")(2)
          val bodyStr = new String(body, "UTF-8")
          WarcDoc(id, recs.length, status, host,
            bodyStr.codePointCount(0, bodyStr.length).toLong,
            graft.functions.PolyHash.hash(bodyStr))
        }
      }.toDF()
  }
}
