package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sitemap.xml ingest (sitemaps.org protocol 0.9) — the crawl
  * SEED format: per domain an XML urlset is BUILT from the corpus and
  * parsed back through a dependency-free pull parser, with XML entity
  * escaping load-bearing — every &lt;loc&gt; contains a literal `&`
  * that rides as `&amp;` on the wire, so a parser that skips
  * unescaping (or an escaper that double-escapes) breaks the oracle
  * hash on every row.
  */
object Sitemap {

  private def locRaw(docId: Long, source: String): String =
    s"http://$source.example.com/doc/$docId?a=1&b=${docId % 5}"

  /** Build a protocol-0.9 urlset for one domain, URLs in doc order,
    * `&` escaped to `&amp;` per XML. The protocol caps one file at
    * 50k URLs — past that real sitemaps shard into an index file,
    * which is also the natural task split at crawl scale. */
  private[graft] def buildSitemap(source: String, ids: Seq[Long]): String = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
    ids.sorted.foreach { d =>
      val esc = locRaw(d, source).replace("&", "&amp;")
      sb.append("  <url>\n    <loc>").append(esc)
        .append("</loc>\n    <lastmod>")
        .append(f"2024-01-${d % 28 + 1}%02d")
        .append("</lastmod>\n  </url>\n")
    }
    sb.append("</urlset>\n")
    sb.toString
  }

  /** Pull-parse a urlset: walk `<url>` blocks, extract loc + lastmod,
    * unescape XML entities in the loc. Missing fields or an
    * unterminated block fail loudly. */
  private[graft] def parseSitemap(xml: String): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var pos = 0
    var s = xml.indexOf("<url>", pos)
    while (s >= 0) {
      val e = xml.indexOf("</url>", s)
      require(e > s, "unterminated <url> block")
      val block = xml.substring(s, e)
      def field(tag: String): String = {
        val a = block.indexOf(s"<$tag>"); val b = block.indexOf(s"</$tag>")
        require(a >= 0 && b > a, s"missing <$tag> in url block")
        block.substring(a + tag.length + 2, b)
      }
      val loc = field("loc")
        .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      out += ((loc, field("lastmod")))
      pos = e + 6
      s = xml.indexOf("<url>", pos)
    }
    out.result()
  }

  case class SitemapUrl(doc_id: Long, source: String, loc: String,
      lastmod: String, n_urls: Long)

  /** REAL sitemap round-trip: per domain the urlset is built from
    * that domain's docs, parsed back, and each URL row re-keys to its
    * doc. One task per domain — the protocol's own 50k-URL file cap
    * is the shard unit a crawl-scale pipeline splits on.
    *
    * Plan: one shuffle (groupByKey on the ~20 domains), then
    * partition-local build+parse+explode. */
  def sitemapIngest(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents
      .select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroups { (src, rows) =>
        val ids = rows.map(_._1).toSeq.sorted
        val parsed = parseSitemap(buildSitemap(src, ids))
        require(parsed.length == ids.length,
          s"$src: parsed ${parsed.length} of ${ids.length} urls")
        parsed.iterator.zip(ids.iterator).map { case ((loc, lastmod), d) =>
          require(loc == locRaw(d, src), s"$src: loc round-trip drifted for $d")
          SitemapUrl(d, src, loc, lastmod, ids.length.toLong)
        }
      }.toDF()
  }
}
