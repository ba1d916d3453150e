package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextFns._

/** Broadcast Bloom sketch over the corpus' MinHash band keys — the
  * join-free ingest-time near-dup screen: "does this incoming doc share
  * ANY LSH band with the existing corpus?" answered per row against an
  * 8 KiB bitset instead of a join against the O(corpus × bands) index.
  *
  * Construction is one map-combinable aggregate (per 64-bit word a
  * `bit_or` of contributions — the network carries word partials, never
  * keys), folded into a single-row `array<long>` frame that broadcasts
  * into batch or stream-static plans alike. Probing is a stateless
  * per-row expression over the doc's 32 band-key hashes — codegen'd
  * higher-order functions, no UDF, no state, no shuffle.
  *
  * False positives are possible (that is the Bloom contract: a flagged
  * doc proceeds to exact verification, a clean doc provably shares no
  * band); all arithmetic is deterministic and mirrored bit-for-bit by
  * the DuckDB oracle.
  */
object Bloom {

  /** Bitset geometry: 1024 longs = 65536 bits; 3 probe positions per
    * key. Sized for the test corpora; production sizes m by corpus
    * cardinality (same plan shape, larger array). */
  val Words = 1024
  val Bits: Long = Words * 64L
  private val A = Seq(3L, 1299709L, 15485863L)
  private val B = Seq(17L, 101L, 1009L)

  /** One hash per MinHash band: a single long key for the (band, k1,
    * k2) bucket identity used by [[Dedup.minhashBands]]. NULL-signature
    * bands (docs under 3 words) are dropped. */
  private def bandKeyExpr: String =
    s"""filter(transform(sequence(0, ${NumBands - 1}), b ->
          CASE WHEN element_at(sig, 2*b + 1) IS NOT NULL
                AND element_at(sig, 2*b + 2) IS NOT NULL
          THEN (CAST(b AS BIGINT) * 1315423911 + element_at(sig, 2*b + 1) * 31
                + element_at(sig, 2*b + 2)) % $P
          ELSE CAST(NULL AS BIGINT) END), kh -> kh IS NOT NULL)"""

  /** (doc_id, keys array&lt;long&gt;): the 32 band-key hashes per doc. */
  def bandKeys(documents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents
      .select(col("doc_id"), expr(shingleHashes("text")).as("hashes"))
      .select(col("doc_id"), expr(minhashSig("hashes")).as("sig"))
      .select(col("doc_id"), expr(bandKeyExpr).as("keys"))
  }

  private def pos(j: Int, kh: String): String =
    s"((($kh) * ${A(j)} + ${B(j)}) % $P) % $Bits"

  /** Build the sketch: ONE row, `bloom: array<long>` of [[Words]]
    * words. Word contributions bit_or-combine map-side; the final
    * global aggregate is a ≤ [[Words]]-row reduction. */
  def build(documents: DataFrame): DataFrame =
    bandKeys(documents)
      .select(explode(col("keys")).as("kh"))
      .select(explode(expr(
        s"""transform(sequence(0, 2), j ->
              CASE j ${(0 to 2).map(j => s"WHEN $j THEN ${pos(j, "kh")}").mkString(" ")} END)"""))
        .as("p"))
      .groupBy(expr("cast(p div 64 as int)").as("word"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(p % 64 as int)))").as("bits"))
      .groupBy()
      .agg(map_from_entries(collect_list(struct(col("word"), col("bits")))).as("m"))
      .select(expr(
        s"transform(sequence(0, ${Words - 1}), w -> coalesce(element_at(m, cast(w as int)), 0L))")
        .as("bloom"))

  /** Flag every probe doc whose band keys hit the sketch: adds
    * `n_hit_bands` (bands with all 3 bits set) and `maybe_dup`.
    * `bloomFrame` is [[build]]'s single row — broadcast, so the probe
    * side never shuffles; works identically on a streaming frame
    * (stream-static, stateless). */
  def probe(documents: DataFrame, bloomFrame: DataFrame): DataFrame = {
    val hit = (0 to 2).map { j =>
      val p = pos(j, "kh")
      s"(element_at(bloom, cast(($p) div 64 as int) + 1) & shiftleft(cast(1 as bigint), cast(($p) % 64 as int))) != 0"
    }.mkString(" AND ")
    bandKeys(documents)
      .crossJoin(broadcast(bloomFrame))
      .withColumn("n_hit_bands", expr(s"size(filter(keys, kh -> $hit))"))
      .select(col("doc_id"), col("n_hit_bands"),
        (col("n_hit_bands") > 0).as("maybe_dup"))
  }

  /** Batch query form (oracled): the even-id half of the corpus is the
    * existing index, the odd-id half is the incoming probe set — the
    * deterministic stand-in for "corpus so far" vs "tonight's crawl". */
  def screenQuery(documents: DataFrame): DataFrame =
    probe(documents.filter(col("doc_id") % 2 === 1),
      build(documents.filter(col("doc_id") % 2 === 0)))
}
