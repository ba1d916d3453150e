package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt crawl filtering (RFC 9309) — the FIRST curation gate a
  * compliant crawl pipeline applies, before any dedup or quality
  * scoring: parse each domain's robots.txt, select the `User-agent:
  * *` group, and evaluate every URL against the group's Allow/
  * Disallow prefix rules with LONGEST-MATCH-WINS semantics (an Allow
  * that is more specific than a Disallow re-permits the subtree —
  * the rule interplay real robots files rely on).
  */
object Robots {

  /** Synthesize a realistic robots.txt for crawl domain `n`: three
    * user-agent groups (a specific bot, the wildcard group, a
    * blocked-everything bot), comments, blank lines, and a
    * Crawl-delay directive the parser must skip. Only the wildcard
    * group's rules apply to this crawler — selecting the wrong group
    * blocks everything or nothing and breaks the oracle hash. */
  private[graft] def synthesizeRobotsTxt(n: Int): String = {
    val d = n % 10
    val d2 = (n + 3) % 10
    s"""# robots for crawl domain src$n
       |User-agent: googlebot
       |Disallow: /nope/
       |
       |User-agent: *
       |Crawl-delay: 2
       |Disallow: /doc/$d
       |Allow: /doc/$d$d2
       |
       |User-agent: badbot
       |Disallow: /
       |""".stripMargin
  }

  /** Parse a robots.txt into the `(rule, type)` list of the wildcard
    * (`*`) user-agent group: line-based, comments (#) and blank
    * lines skipped, directive names case-insensitive, consecutive
    * User-agent lines form ONE group (per RFC 9309 §2.2.1), unknown
    * directives (Crawl-delay, Sitemap, …) ignored. Empty Disallow
    * values are dropped — an empty pattern matches nothing under
    * longest-match and real files use it to mean "allow all". */
  private[graft] def parseRobots(txt: String): Seq[(String, String)] = {
    val rules = Seq.newBuilder[(String, String)]
    var groupAgents = List.empty[String]
    var inGroupHeader = false // consecutive User-agent lines accumulate
    txt.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val i = line.indexOf(':')
        if (i > 0) {
          val directive = line.substring(0, i).trim.toLowerCase
          val value = line.substring(i + 1).trim
          directive match {
            case "user-agent" =>
              groupAgents = if (inGroupHeader) value :: groupAgents else List(value)
              inGroupHeader = true
            case "allow" | "disallow" =>
              inGroupHeader = false
              if (groupAgents.contains("*") && value.nonEmpty)
                rules += ((value, directive))
            case _ => inGroupHeader = false // Crawl-delay, Sitemap, …
          }
        }
      }
    }
    rules.result()
  }

  /** Evaluate every document URL against its domain's parsed
    * robots.txt. Output per doc: path, the longest matching rule (or
    * null), and the allow verdict — no match means allowed, else the
    * longest rule's type decides (rule lengths are distinct by
    * construction, so the RFC's allow-wins tie-break never fires
    * silently).
    *
    * Plan: the per-DOMAIN parse runs once over the ~20 distinct
    * sources and broadcasts; the per-doc work is a broadcast join +
    * prefix test + one keyed max — at 100 TB the robots side stays
    * tiny (one row per domain) while the URL side streams. */
  /** The wide per-source rules frame the streaming crawl gate joins
    * against: (source, disallow_rule, allow_rule) — one row per
    * domain from the same parse as [[robotsFilter]]. */
  def wideRules(spark: SparkSession, sources: Seq[String]): DataFrame = {
    import spark.implicits._
    sources.map { src =>
      val n = src.stripPrefix("src").toInt
      val rules = parseRobots(synthesizeRobotsTxt(n))
      (src,
        rules.collectFirst { case (r, "disallow") => r }.get,
        rules.collectFirst { case (r, "allow") => r }.get)
    }.toDF("source", "disallow_rule", "allow_rule")
  }

  def robotsFilter(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val sources = documents.select(col("source")).distinct()
      .as[String]
      .flatMap { src =>
        val n = src.stripPrefix("src").toInt
        parseRobots(synthesizeRobotsTxt(n)).map { case (rule, typ) =>
          (src, rule, typ)
        }
      }
      .toDF("source", "rule", "typ")
    val docs = documents
      .select(col("doc_id"), col("source"),
        concat(lit("/doc/"), col("doc_id")).as("path"))
    docs.join(broadcast(sources), Seq("source"))
      .withColumn("mlen",
        when(col("path").startsWith(col("rule")), length(col("rule"))))
      .groupBy(col("doc_id"), col("path"))
      .agg(max(when(col("mlen").isNotNull,
        struct(col("mlen"), col("typ"), col("rule")))).as("best"))
      .select(col("doc_id"), col("path"),
        col("best.rule").as("best_rule"),
        when(col("best").isNull || col("best.typ") === "allow", 1)
          .otherwise(0).cast("int").as("allowed"))
  }
}
