package graft.llm

import graft.SparkSpec
import graft.dedup.Dedup
import graft.similarity.Ann
import graft.text.TextAnalysis
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class LlmSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today", "en"),
    (1L, "the quick brown fox jumps over the lazy dog again and again tomorrow", "en"),
    (2L, "der hund und die katze und das pferd ist hier", "de"),
    (3L, "completely different words about spark catalyst tungsten execution engines", "en"),
    (4L, "the quick brown fox jumps over the lazy dog again and again today", "en") // exact dup of 0
  ).toDF("doc_id", "text", "lang")

  test("exact dedup groups identical normalized text") {
    val out = Dedup.exact(docs).orderBy("canonical_id").collect()
    assert(out.length === 4)
    assert(out.head.getAs[Long]("canonical_id") === 0L)
    assert(out.head.getAs[Long]("group_size") === 2L)
  }

  test("jaccard near-dup pairs find the planted near-duplicates and the exact dup") {
    val pairs = Dedup.jaccardPairs(docs, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // one word differs
    assert(pairs.contains((0L, 4L))) // identical
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc
  }

  test("simhash of identical docs collides at hamming 0") {
    val pairs = Dedup.simhashPairs(docs, 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 4L)))
  }

  test("4-band simhash candidates are complete: output equals brute force at hamming <= 3") {
    import graft.text.TextFns._
    graft.functions.GraftFunctions.register(spark)
    val corpus = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val banded = Dedup.simhashPairs(corpus)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sigs = corpus.selectExpr("doc_id",
      s"${simhash(s"transform(${tokens("text")}, t -> ${polyHash("t")})")} AS sim")
    val a = sigs.select($"doc_id".as("id_a"), $"sim".as("sa"))
    val b = sigs.select($"doc_id".as("id_b"), $"sim".as("sb"))
    val brute = a.crossJoin(b).filter($"id_a" < $"id_b")
      .filter(expr("bit_count(sa ^ sb) <= 3"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded === brute, "pigeonhole banding must find exactly the brute-force pairs")
  }

  test("language id picks the profile with most stopword hits") {
    val out = TextAnalysis.langId(docs).select("doc_id", "predicted")
      .as[(Long, String)].collect().toMap
    assert(out(0L) === "en")
    assert(out(2L) === "de")
  }

  test("brute-force ANN ranks by cosine with deterministic ties") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0.0f, 1.0f), 1),
      (3L, Array(1.0f, 0.05f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = Ann.bruteTopK(vecs, k = 3, nQueries = 1)
      .orderBy("rank").select("nb_id").as[Long].collect()
    assert(out.toSeq === Seq(3L, 1L, 2L))
  }

  test("block-join embedding dedup equals exact all-pairs; LSH variant is a high-precision subset") {
    val embs = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Dedup.embeddingPairs(embs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size === 66) // verified against the DuckDB all-pairs oracle
    // block decomposition must be invariant to the block count
    val otherB = Dedup.embeddingPairs(embs, nBlocks = 7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(otherB === exact)
    val lsh = Dedup.embeddingPairsLsh(embs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    // deterministic hyperplanes -> recall is a fixed property of the data;
    // floor documents the banding math (r=6,b=8 at tau=0.4 is recall-capped)
    assert(lsh.size.toDouble / exact.size >= 0.2, s"lsh recall ${lsh.size}/${exact.size}")
  }

  test("multimodal metadata extracts byte length and magic prefix") {
    val out = Multimodal.metadata(docs).filter($"doc_id" === 0).collect().head
    assert(out.getAs[Int]("n_bytes") === 65)
    assert(out.getAs[String]("magic") === "74686520") // "the "
    assert(out.getAs[String]("modality") === "image")
  }

  test("multimodal feature extraction runs partition-local with stable output") {
    val feats = Multimodal.featureExtract(spark, docs).collect()
    assert(feats.length === 5)
    val f0 = feats.find(_.doc_id == 0L).get
    val f4 = feats.find(_.doc_id == 4L).get
    assert(f0.feature.toSeq === f4.feature.toSeq) // same payload -> same stub feature
    assert(f0.feature.forall(v => v >= 0f && v < 1f))
  }
}
