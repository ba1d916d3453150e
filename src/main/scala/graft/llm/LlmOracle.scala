package graft.llm

import graft.text.TextFns.{P, NumHashes, NumBands, SimHashBits}
import graft.text.TextAnalysis.Profiles

/** DuckDB oracle SQL for the LLM-pipeline operators. The hash
  * primitives mirror graft.text.TextFns bit-for-bit (polynomial hashes
  * over code points, left folds in index order). */
object LlmOracle {

  /** Polynomial rolling hash of a string expression (DuckDB). */
  private def ph(s: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length($s) + 1), " +
      s"i -> unicode($s[i]))), (acc, ch) -> (acc * 31 + ch) % $P)"

  private val toks = "string_split(lower(text), ' ')"
  private val toksD = "string_split(lower(d.text), ' ')"

  private val shingles: String =
    s"""CASE WHEN len(sw) >= 3
        THEN list_distinct([sw[i] || ' ' || sw[i+1] || ' ' || sw[i+2]
                            for i in range(1, len(sw) - 1)])
        ELSE [] END"""

  private val shCte: String = s"""
    sw_t AS (SELECT doc_id, $toks AS sw FROM documents),
    sh_t AS (SELECT doc_id, $shingles AS sh FROM sw_t),
    hash_t AS (SELECT doc_id, sh, list_transform(sh, s -> ${ph("s")}) AS hashes FROM sh_t)"""

  private val sigCte: String = s"""
    sig_t AS (
      SELECT doc_id, list_transform(range(0, $NumHashes),
        i -> list_min(list_transform(hashes, h -> (h * (1 + 2*i) + i * 12289) % $P))) AS sig
      FROM hash_t),
    band_t AS (
      SELECT doc_id, unnest(range(0, $NumBands)) AS band, sig FROM sig_t),
    band_k AS (
      SELECT doc_id, band, sig[2*band + 1] AS k1, sig[2*band + 2] AS k2
      FROM band_t WHERE sig[2*band + 1] IS NOT NULL AND sig[2*band + 2] IS NOT NULL),
    cand_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_bands
      FROM band_k a JOIN band_k b
        ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2 AND a.doc_id < b.doc_id
      GROUP BY 1, 2)"""

  val qDedupExact: String = s"""
    WITH keyed AS (
      SELECT doc_id, ${ph("regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')")} AS key
      FROM documents)
    SELECT min(doc_id) AS canonical_id, key, count(*) AS group_size
    FROM keyed GROUP BY key ORDER BY canonical_id"""

  val qDedupMinhashBands: String = s"""
    WITH $shCte, $sigCte
    SELECT id_a, id_b, n_bands FROM cand_pairs ORDER BY id_a, id_b"""

  /** Mirrors Dedup.lshBucketStats: bucket census + candidate-pair
    * mass per band. */
  val qLshBucketStats: String = s"""
    WITH $shCte, $sigCte,
    bkts AS (
      SELECT band, k1, k2, CAST(count(*) AS BIGINT) AS sz
      FROM band_k GROUP BY 1, 2, 3)
    SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
      CAST(sum(sz) AS BIGINT) AS n_rows,
      max(sz) AS max_bucket,
      round(quantile_cont(sz, 0.99) + 1e-9, 4) AS p99_bucket,
      CAST(sum((sz * (sz - 1)) // 2) AS BIGINT) AS candidate_pairs
    FROM bkts GROUP BY 1 ORDER BY band"""

  /** Exact Jaccard ≥ 0.5 pairs over a (doc_id, hashes) table — shared
    * by the pair query, the components closure and the corpus-clean
    * composition so a threshold/epsilon tweak can never make the
    * oracles disagree. */
  private def jpairsOver(t: String): String = s"""
    SELECT id_a, id_b, jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        round(len(list_intersect(a.hashes, b.hashes))::DOUBLE /
          (len(a.hashes) + len(b.hashes) - len(list_intersect(a.hashes, b.hashes))) + 1e-9, 6) AS jaccard
      FROM $t a JOIN $t b ON a.doc_id < b.doc_id)
    WHERE jaccard >= 0.5"""

  private val jpairsBody: String = jpairsOver("hash_t")

  /** Exact Jaccard pairs — the LSH+verify Spark path must equal this
    * (collision probability ≈ 1 − 1e-4 at the 0.5 threshold). */
  val qDedupJaccard: String = s"""
    WITH $shCte
    $jpairsBody ORDER BY id_a, id_b"""

  /** Mirrors Dedup.incrementalDedup: exhaustive increment×index exact
    * Jaccard (the engine's prefix-filtered probe must equal this —
    * complete recall at the threshold), argmax per increment doc with
    * the (jaccard DESC, idx_id) tie-break on 6-dp-rounded scores. */
  val qDedupIncremental: String = s"""
    WITH $shCte,
    pairs AS (
      SELECT a.doc_id AS inc_id, b.doc_id AS idx_id,
        round(len(list_intersect(a.hashes, b.hashes))::DOUBLE /
          (len(a.hashes) + len(b.hashes)
            - len(list_intersect(a.hashes, b.hashes))) + 1e-9, 6) AS jaccard
      FROM hash_t a JOIN hash_t b
        ON a.doc_id % 10 = 0 AND b.doc_id % 10 != 0),
    kept AS (SELECT * FROM pairs WHERE jaccard >= 0.5),
    best AS (
      SELECT inc_id AS doc_id, idx_id AS best_match, jaccard AS best_jaccard
      FROM (SELECT *, row_number() OVER (PARTITION BY inc_id
              ORDER BY jaccard DESC, idx_id) AS rn FROM kept)
      WHERE rn = 1)
    SELECT d.doc_id, b.best_match IS NOT NULL AS is_dup,
      b.best_match, b.best_jaccard
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
    LEFT JOIN best b USING (doc_id)
    ORDER BY d.doc_id"""

  /** Mirrors Dedup.thresholdSweep: one pair pass at the loosest τ,
    * ×|τ| rollup. */
  val qDedupSweep: String = s"""
    WITH $shCte,
    jp AS ($jpairsBody),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    ex AS (SELECT jp.*, unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS t FROM jp),
    f AS (SELECT t, id_a, id_b FROM ex WHERE jaccard >= t)
    SELECT f.t, CAST(count(*) AS BIGINT) AS n_pairs,
      CAST(count(DISTINCT f.id_b) AS BIGINT) AS n_dup_docs,
      round(count(DISTINCT f.id_b) / nd.n_docs::DOUBLE + 1e-9, 6)
        AS dup_share
    FROM f, nd GROUP BY f.t, nd.n_docs ORDER BY f.t"""

  /** Mirrors Dedup.containmentPairs: brute all-pairs containment of
    * the smaller shingle set in the larger (the engine's ProbeCount
    * prefix join must equal this exactly — complete recall). */
  val qDedupContainment: String = s"""
    WITH $shCte
    SELECT id_a, id_b, sz_a, sz_b, containment FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        len(a.hashes) AS sz_a, len(b.hashes) AS sz_b,
        round(len(list_intersect(a.hashes, b.hashes))::DOUBLE /
          least(len(a.hashes), len(b.hashes)) + 1e-9, 6) AS containment
      FROM hash_t a JOIN hash_t b ON a.doc_id < b.doc_id)
    WHERE containment >= 0.8 ORDER BY id_a, id_b"""

  /** Connected components of the exact Jaccard near-dup graph:
    * transitive min-label closure via a recursive CTE (the engine's
    * distributed label propagation must agree exactly). */
  val qDedupComponents: String = s"""
    WITH RECURSIVE $shCte,
    jpairs AS (SELECT id_a, id_b FROM ($jpairsBody)),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM jpairs
      UNION ALL SELECT id_b, id_a FROM jpairs),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.id = e.dst),
    comp AS (SELECT id AS doc_id, min(lbl) AS comp FROM reach GROUP BY 1),
    sizes AS (SELECT comp, count(*) AS comp_size FROM comp GROUP BY 1)
    SELECT c.doc_id, c.comp, s.comp_size
    FROM comp c JOIN sizes s USING (comp) ORDER BY c.doc_id"""

  private val simhashExpr: String =
    s"""list_reduce(list_prepend(0::BIGINT, list_transform(range(0, $SimHashBits),
        j -> CASE WHEN list_reduce(list_prepend(0::BIGINT,
               list_transform(thashes, h -> ((h >> j) & 1) * 2 - 1)), (a, b) -> a + b) > 0
             THEN (1::BIGINT << j) ELSE 0::BIGINT END)), (a, b) -> a + b)"""

  val qDedupSimhash: String = s"""
    WITH th AS (SELECT doc_id,
      list_transform($toks, t -> (${ph("t")} + ((((${ph("t")} * 48271) % 2147483647) & 1073741823) << 30))) AS thashes
      FROM documents),
    sims AS (SELECT doc_id, $simhashExpr AS sim FROM th),
    keyed AS (
      SELECT doc_id, sim, 0 AS band, sim & 32767 AS bucket FROM sims
      UNION ALL SELECT doc_id, sim, 1, (sim >> 15) & 32767 FROM sims
      UNION ALL SELECT doc_id, sim, 2, (sim >> 30) & 32767 FROM sims
      UNION ALL SELECT doc_id, sim, 3, (sim >> 45) & 32767 FROM sims),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        bit_count(xor(a.sim, b.sim)) AS hamming
      FROM keyed a JOIN keyed b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b"""

  private val normCte: String = """
    n_t AS (
      SELECT vec_id, embedding,
        sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)), (a, b) -> a + b)) AS nrm
      FROM embeddings)"""

  private val dotAB: String =
    """list_reduce(list_prepend(0.0::DOUBLE,
       list_transform(range(1, len(a.embedding) + 1),
         i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)), (x, y) -> x + y)"""

  val qDedupEmbedding: String = s"""
    WITH $normCte
    SELECT id_a, id_b, cosine FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        round($dotAB / (a.nrm * b.nrm) + 1e-9, 6) AS cosine
      FROM n_t a JOIN n_t b ON a.vec_id < b.vec_id)
    WHERE cosine >= 0.4 ORDER BY id_a, id_b"""

  /** Mirrors Dedup.embeddingIncremental: exhaustive increment×index
    * exact cosine (the engine's block join must equal this), argmax
    * per increment vector on the 6-dp-rounded score. */
  val qEmbedIncremental: String = s"""
    WITH $normCte,
    pairs AS (
      SELECT a.vec_id AS inc_id, b.vec_id AS idx_id,
        round($dotAB / (a.nrm * b.nrm) + 1e-9, 6) AS cosine
      FROM n_t a JOIN n_t b
        ON a.vec_id % 10 = 0 AND b.vec_id % 10 != 0),
    kept AS (SELECT * FROM pairs WHERE cosine >= 0.4),
    best AS (
      SELECT inc_id AS vec_id, idx_id AS best_match, cosine AS best_cosine
      FROM (SELECT *, row_number() OVER (PARTITION BY inc_id
              ORDER BY cosine DESC, idx_id) AS rn FROM kept)
      WHERE rn = 1)
    SELECT v.vec_id, b.best_match IS NOT NULL AS is_dup,
      b.best_match, b.best_cosine
    FROM (SELECT vec_id FROM embeddings WHERE vec_id % 10 = 0) v
    LEFT JOIN best b USING (vec_id)
    ORDER BY v.vec_id"""

  /** Mirrors Cluster.dbscan: brute ε-pairs (cos ≥ 0.4, rounded like
    * the engine), degree-threshold cores, recursive min-label closure
    * over core-core edges, min-cluster border attachment. */
  val qDbscan: String = s"""
    WITH RECURSIVE $normCte,
    pairs AS MATERIALIZED (
      SELECT id_a, id_b FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          round($dotAB / (a.nrm * b.nrm) + 1e-9, 6) AS cosine
        FROM n_t a JOIN n_t b ON a.vec_id < b.vec_id)
      WHERE cosine >= 0.4),
    adj AS (
      SELECT id_a AS vec_id, id_b AS nb FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
    deg AS (SELECT vec_id, count(*) AS n_nb FROM adj GROUP BY 1),
    core AS (SELECT vec_id FROM deg WHERE n_nb >= 3),
    core_edges AS (
      SELECT p.id_a, p.id_b FROM pairs p
      JOIN core c1 ON c1.vec_id = p.id_a
      JOIN core c2 ON c2.vec_id = p.id_b),
    cedges AS (
      SELECT id_a AS src, id_b AS dst FROM core_edges
      UNION ALL SELECT id_b, id_a FROM core_edges),
    reach(id, lbl) AS (
      SELECT vec_id, vec_id FROM core
      UNION
      SELECT e.src, r.lbl FROM cedges e JOIN reach r ON r.id = e.dst),
    comp AS (SELECT id AS vec_id, min(lbl) AS cluster FROM reach GROUP BY 1),
    border AS (
      SELECT a.vec_id, min(c.cluster) AS nb_cluster
      FROM adj a JOIN comp c ON c.vec_id = a.nb
      GROUP BY 1)
    SELECT e.vec_id,
      CASE WHEN m.cluster IS NOT NULL THEN 'core'
           WHEN b.nb_cluster IS NOT NULL THEN 'border'
           ELSE 'noise' END AS role,
      coalesce(m.cluster, b.nb_cluster, -1) AS cluster
    FROM embeddings e
    LEFT JOIN comp m ON m.vec_id = e.vec_id
    LEFT JOIN border b ON b.vec_id = e.vec_id
    ORDER BY e.vec_id"""

  val qAnnTopk: String = s"""
    WITH $normCte,
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS nb_id,
        $dotAB / (a.nrm * b.nrm) AS cosine
      FROM n_t a JOIN n_t b ON a.vec_id < 10 AND a.vec_id != b.vec_id)
    SELECT query_id, rank, nb_id, round(cosine + 1e-9, 6) AS cosine FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nb_id) AS rank
      FROM scored)
    WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Mirrors Ann.mmrRerank: top-20 candidates for query vec_id 0,
    * 6-dp rel/sim quantization, 9 unrolled greedy MMR rounds (λ=0.7,
    * (1.0 - 0.7) kept as arithmetic so both engines compute the same
    * IEEE complement), winner per round by 10-dp MMR then id. */
  val qMmrRerank: String = {
    val rounds = (2 to 10).map { i =>
      s"""sel$i AS MATERIALIZED (
      SELECT * FROM sel${i - 1}
      UNION ALL
      SELECT nb_id, $i AS step, rel FROM (
        SELECT c.nb_id, c.rel,
          round(0.7 * c.rel - (1.0 - 0.7) * max(p.sim) + 1e-9, 10) AS mmr
        FROM cand c
        JOIN pair p ON p.a = c.nb_id
          AND p.b IN (SELECT nb_id FROM sel${i - 1})
        WHERE c.nb_id NOT IN (SELECT nb_id FROM sel${i - 1})
        GROUP BY c.nb_id, c.rel
        ORDER BY mmr DESC, c.nb_id LIMIT 1))"""
    }.mkString(",\n    ")
    s"""
    WITH $normCte,
    q AS (SELECT embedding, nrm FROM n_t WHERE vec_id = 0),
    cand AS MATERIALIZED (
      SELECT b.vec_id AS nb_id, b.embedding, b.nrm,
        round($dotAB / (a.nrm * b.nrm) + 1e-9, 6) AS rel
      FROM n_t b, q a WHERE b.vec_id != 0
      ORDER BY rel DESC, nb_id LIMIT 20),
    pair AS MATERIALIZED (
      SELECT a.nb_id AS a, b.nb_id AS b,
        round($dotAB / (a.nrm * b.nrm) + 1e-9, 6) AS sim
      FROM cand a JOIN cand b ON a.nb_id != b.nb_id),
    sel1 AS MATERIALIZED (
      SELECT nb_id, 1 AS step, rel FROM cand ORDER BY rel DESC, nb_id LIMIT 1),
    $rounds
    SELECT step, nb_id AS vec_id, rel FROM sel10 ORDER BY step"""
  }

  /** Mirrors Ann.hardNegatives: label-filtered cosine top-5 for the
    * dense-id query sample. */
  val qHardNegatives: String = s"""
    WITH nl AS (
      SELECT vec_id, label, embedding,
        sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)),
          (a, b) -> a + b)) AS nrm
      FROM embeddings),
    scored AS (
      SELECT a.vec_id AS query_id, a.label AS q_label,
        b.vec_id AS nb_id, b.label AS nb_label,
        $dotAB / (a.nrm * b.nrm) AS cosine
      FROM nl a JOIN nl b ON a.vec_id < 10 AND a.vec_id != b.vec_id
        AND a.label != b.label)
    SELECT query_id, q_label, rank, nb_id, nb_label,
      round(cosine + 1e-9, 6) AS cosine FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, nb_id) AS INT) AS rank
      FROM scored)
    WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Mirrors Cluster.classBalance: effective-number-of-samples
    * weights, mean-1 normalized over classes. */
  val qClassBalance: String = """
    WITH counts AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY 1),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_total,
        CAST(count(*) AS BIGINT) AS n_classes
      FROM counts),
    eff AS (
      SELECT c.label, c.n,
        round(c.n / CAST(t.n_total AS DOUBLE) + 1e-9, 6) AS share,
        round((1.0 - pow(0.999, c.n)) / (1.0 - 0.999) + 1e-9, 4) AS eff_n,
        t.n_classes
      FROM counts c CROSS JOIN tot t),
    w AS (SELECT *, 1.0 / eff_n AS w_raw FROM eff),
    ws AS (SELECT sum(w_raw) AS w_sum FROM w)
    SELECT w.label, w.n, w.share, w.eff_n,
      round(w.w_raw * w.n_classes / s.w_sum + 1e-9, 6) AS weight
    FROM w CROSS JOIN ws s
    ORDER BY w.label"""

  private def profList(words: Seq[String]): String =
    words.mkString("['", "', '", "']")

  val qTextLangid: String = {
    val scores = Profiles.map { case (l, ws) =>
      s"len(list_filter($toks, t -> list_contains(${profList(ws)}, t))) AS score_$l"
    }.mkString(",\n        ")
    val maxS = Profiles.map(p => s"score_${p._1}").mkString("greatest(", ", ", ")")
    val pred = Profiles.map { case (l, _) =>
      s"WHEN score_$l >= $maxS AND score_$l > 0 THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    s"""
    WITH scored AS (
      SELECT doc_id, lang,
        $scores
      FROM documents)
    SELECT *, $pred AS predicted FROM scored ORDER BY doc_id"""
  }

  /** Quality features as a reusable CTE block (quality_t): shared by
    * q_text_quality and q_quality_sample. */
  private val qualityCte: String = {
    val stop = s"len(list_filter($toks, t -> list_contains(${profList(Profiles.head._2)}, t)))::DOUBLE"
    s"""f AS (
      SELECT doc_id, length(text) AS n_chars_m, len($toks) AS n_tokens,
        round((length(text) - len($toks) + 1)::DOUBLE / len($toks) + 1e-9, 6) AS mean_word_len,
        round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
          / length(text) + 1e-9, 6) AS punct_ratio,
        round($stop / len($toks) + 1e-9, 6) AS stopword_ratio
      FROM documents),
    quality_t AS (
      SELECT *, round(least(1.0, n_tokens / 100.0) * (1.0 - punct_ratio) *
        (0.5 + least(0.5, stopword_ratio * 2.0)) + 1e-9, 6) AS quality_score
      FROM f)"""
  }

  val qTextQuality: String = s"""
    WITH $qualityCte
    SELECT * FROM quality_t ORDER BY doc_id"""

  val qQualitySample: String = s"""
    WITH $qualityCte,
    ranked AS (
      SELECT d.lang, q.doc_id, q.quality_score,
        row_number() OVER (PARTITION BY d.lang
          ORDER BY q.quality_score DESC, q.doc_id) AS rank,
        count(*) OVER (PARTITION BY d.lang) AS n_lang
      FROM quality_t q JOIN documents d USING (doc_id))
    SELECT doc_id, lang, quality_score, rank
    FROM ranked WHERE rank <= ceil(n_lang * 0.5)
    ORDER BY doc_id"""

  val qTextTokens: String = s"""
    SELECT doc_id, len($toks) AS n_ws_tokens,
      len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_re_tokens
    FROM documents ORDER BY doc_id"""

  val qTextFingerprint: String = s"""
    WITH $shCte
    SELECT d.doc_id, ${ph("d.text")} AS doc_hash,
      list_min(h.hashes) AS min_shingle_hash,
      list_max(h.hashes) AS max_shingle_hash
    FROM documents d JOIN hash_t h ON d.doc_id = h.doc_id
    ORDER BY d.doc_id"""

  /** Shannon entropy of the per-doc code-point distribution — the
    * Spark side folds counts in ascending code-point order inside one
    * generated loop; summation-order drift is absorbed by the +1e-9
    * round-6 convention. */
  val qTextEntropy: String = """
    WITH chars AS (
      SELECT doc_id, substring(text, i, 1) AS ch
      FROM documents, unnest(range(1, length(text) + 1)) AS t(i)),
    freq AS (
      SELECT doc_id, ch, count(*)::DOUBLE AS c FROM chars GROUP BY 1, 2),
    ent AS (
      SELECT f.doc_id,
        round(-sum((f.c / t.n) * log2(f.c / t.n)) + 1e-9, 6) AS entropy
      FROM freq f JOIN (SELECT doc_id, sum(c) AS n FROM freq GROUP BY 1) t
        USING (doc_id)
      GROUP BY f.doc_id)
    SELECT d.doc_id, length(d.text) AS n_chars,
      coalesce(e.entropy, 0.0) AS entropy
    FROM documents d LEFT JOIN ent e USING (doc_id)
    ORDER BY d.doc_id"""

  /** Unigram log-prob proxy: ln() last-ulp drift between engines is
    * absorbed by the +1e-9 round-6 convention (terms are O(1), docs
    * are a few hundred tokens). */
  val qTextLogprob: String = s"""
    WITH tok AS (
      SELECT doc_id, unnest($toks) AS tok FROM documents),
    tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
    cf AS (SELECT tok, sum(c)::BIGINT AS cf FROM tc GROUP BY 1),
    tot AS (SELECT sum(cf)::DOUBLE AS n_corpus FROM cf)
    SELECT tc.doc_id, sum(tc.c)::BIGINT AS n_tokens,
      round(-sum(tc.c * ln(cf.cf / t.n_corpus)) / sum(tc.c) + 1e-9, 6)
        AS mean_neglogprob
    FROM tc JOIN cf USING (tok), tot t
    GROUP BY tc.doc_id ORDER BY tc.doc_id"""

  val qTextBigrams: String = s"""
    WITH sw AS (SELECT doc_id, $toks AS w FROM documents),
    bg AS (
      SELECT doc_id, unnest(CASE WHEN len(w) >= 2
        THEN [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
        ELSE [] END) AS bigram
      FROM sw)
    SELECT bigram, count(*) AS n, count(DISTINCT doc_id) AS df
    FROM bg GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 20"""

  /** Mirrors TextAnalysis.langSourceMi: joint/marginal cells, PMI and
    * MI contributions over the lang×source matrix. */
  val qLangSourceMi: String = """
    WITH cells AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2),
    m AS (
      SELECT *,
        sum(n) OVER (PARTITION BY lang) AS n_lang,
        sum(n) OVER (PARTITION BY source) AS n_src,
        sum(n) OVER () AS total
      FROM cells),
    p AS (
      SELECT lang, source, n,
        n / CAST(total AS DOUBLE) AS p,
        (n_lang / CAST(total AS DOUBLE)) * (n_src / CAST(total AS DOUBLE))
          AS p_ind
      FROM m)
    SELECT lang, source, n, round(p + 1e-9, 6) AS p,
      round(log2(p / p_ind) + 1e-9, 6) AS pmi,
      round(p * round(log2(p / p_ind) + 1e-9, 6) + 1e-9, 6) AS mi_contrib
    FROM p ORDER BY lang, source"""

  /** Mirrors TextAnalysis.cramersV: χ² + Cramér's V on the SAME
    * lang × source contingency as qLangSourceMi. */
  val qCramersV: String = """
    WITH cells AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2),
    m AS (
      SELECT *,
        sum(n) OVER (PARTITION BY lang) AS n_lang,
        sum(n) OVER (PARTITION BY source) AS n_src,
        sum(n) OVER () AS total
      FROM cells),
    x AS (
      SELECT n, n_lang * n_src / CAST(total AS DOUBLE) AS e, total
      FROM m),
    agg AS (
      SELECT sum((n - e) * (n - e) / e) AS chi2_raw,
        CAST(max(total) AS BIGINT) AS n,
        (SELECT CAST(count(DISTINCT lang) AS BIGINT) FROM documents) AS r,
        (SELECT CAST(count(DISTINCT source) AS BIGINT) FROM documents) AS c
      FROM x)
    SELECT n, r, c, (r - 1) * (c - 1) AS dof,
      round(chi2_raw + 1e-9, 6) AS chi2,
      round(sqrt(chi2_raw / (n * (least(r, c) - 1))) + 1e-9, 6) AS v
    FROM agg"""

  /** Mirrors TextAnalysis.gopherRules: per-doc token stats, the fixed
    * four-rule ladder, ×4 replication into one keyed rollup. */
  val qGopherRules: String = s"""
    WITH tf AS (
      SELECT doc_id, t.tok, CAST(count(*) AS BIGINT) AS cnt
      FROM documents, unnest($toks) AS t(tok)
      GROUP BY 1, 2),
    stats AS (
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        CAST(max(cnt) AS BIGINT) AS max_cnt,
        CAST(sum(CASE WHEN tok IN ('the', 'a', 'and', 'of', 'to')
          THEN cnt ELSE 0 END) AS BIGINT) AS stop_hits
      FROM tf GROUP BY 1),
    flags AS (
      SELECT s.doc_id, s.n_tokens, s.stop_hits,
        round((length(d.text) - s.n_tokens + 1) / CAST(s.n_tokens AS DOUBLE) + 1e-9, 6) AS mwl,
        round(s.max_cnt / CAST(s.n_tokens AS DOUBLE) + 1e-9, 6) AS top_share
      FROM stats s JOIN documents d USING (doc_id)),
    p AS (
      SELECT doc_id,
        (n_tokens >= 20 AND n_tokens <= 90) AS p1,
        (mwl >= 3.0 AND mwl <= 5.5) AS p2,
        (top_share <= 0.15) AS p3,
        (stop_hits >= 1) AS p4
      FROM flags),
    r AS (
      SELECT 1 AS rule_no, 'word_count' AS rule, p1 AS pass, p1 AS cum FROM p
      UNION ALL SELECT 2, 'mean_word_len', p2, p1 AND p2 FROM p
      UNION ALL SELECT 3, 'top_token_share', p3, p1 AND p2 AND p3 FROM p
      UNION ALL SELECT 4, 'stopword_presence', p4, p1 AND p2 AND p3 AND p4 FROM p)
    SELECT rule_no, rule, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(CASE WHEN NOT pass THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
      round(sum(CASE WHEN NOT pass THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE) + 1e-9, 6) AS fail_share,
      CAST(sum(CASE WHEN cum THEN 1 ELSE 0 END) AS BIGINT) AS cum_survivors
    FROM r GROUP BY 1, 2 ORDER BY rule_no"""

  /** Mirrors TextAnalysis.invertedSearch: term-filtered postings,
    * conjunctive HAVING, tf·idf ranking, deterministic top-20. */
  val qInvertedSearch: String = s"""
    WITH tf AS (
      SELECT doc_id, t.tok, CAST(count(*) AS BIGINT) AS cnt
      FROM documents, unnest($toks) AS t(tok)
      WHERE t.tok IN ('spark', 'query', 'window')
      GROUP BY 1, 2),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM documents),
    idf AS (
      SELECT tok,
        round(ln((SELECT n_corpus FROM n) / CAST(count(DISTINCT doc_id) AS DOUBLE)) + 1e-9, 6) AS idf
      FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
        CAST(count(DISTINCT tf.tok) AS BIGINT) AS n_terms,
        CAST(sum(tf.cnt) AS BIGINT) AS total_hits,
        round(sum(tf.cnt * i.idf) + 1e-9, 6) AS score
      FROM tf JOIN idf i USING (tok)
      GROUP BY 1)
    SELECT doc_id, n_terms, total_hits, score
    FROM scored WHERE n_terms = 3
    ORDER BY score DESC, doc_id LIMIT 20"""

  /** Mirrors TextAnalysis.bm25Search: disjunctive BM25 (k1=1.2,
    * b=0.75), per-term contributions rounded at 10 dp, deterministic
    * top-20. The k1+1 term stays an ARITHMETIC expression (1.2 + 1.0)
    * so both engines compute the same IEEE sum instead of parsing the
    * literal 2.2 (which rounds differently). */
  val qBm25: String = s"""
    WITH dl AS (
      SELECT doc_id, CAST(len($toks) AS BIGINT) AS dl FROM documents),
    stats AS (
      SELECT avg(dl) AS avgdl, CAST(count(*) AS BIGINT) AS n_corpus FROM dl),
    tf AS (
      SELECT doc_id, t.tok, CAST(count(*) AS BIGINT) AS tf
      FROM documents, unnest($toks) AS t(tok)
      WHERE t.tok IN ('spark', 'query', 'window')
      GROUP BY 1, 2),
    idf AS (
      SELECT tok,
        round(ln(1.0 + (s.n_corpus - count(DISTINCT doc_id) + 0.5)
          / (count(DISTINCT doc_id) + 0.5)) + 1e-9, 6) AS idf,
        s.avgdl
      FROM tf, stats s GROUP BY tok, s.n_corpus, s.avgdl),
    contrib AS (
      SELECT tf.doc_id, tf.tok, d.dl,
        round(i.idf * tf.tf * (1.2 + 1.0)
          / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / i.avgdl))
          + 1e-9, 10) AS c
      FROM tf JOIN idf i USING (tok) JOIN dl d USING (doc_id))
    SELECT doc_id, CAST(max(dl) AS BIGINT) AS dl,
      CAST(count(DISTINCT tok) AS BIGINT) AS n_terms,
      round(sum(c) + 1e-9, 6) AS score
    FROM contrib GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT 20"""

  /** Mirrors TextAnalysis.cmsHeavyHitters: polyhash-based affine hash
    * family, 4×512 bucket sums, min-estimate, exact top-20 report. */
  val qCmsHeavyHitters: String = {
    val as = Seq(31L, 131L, 1313L, 13131L)
    val bs = Seq(7L, 77L, 777L, 7777L)
    val projs = (0 until 4).map { j =>
      s"SELECT tok, cnt, $j AS j, ((h0 * ${as(j)} + ${bs(j)}) % $P) % 512 AS bucket FROM tfh"
    }.mkString("\n      UNION ALL ")
    s"""
    WITH tf AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT unnest($toks) AS tok FROM documents)
      WHERE len(tok) > 0 GROUP BY 1),
    tfh AS MATERIALIZED (
      SELECT tok, cnt, ${ph("tok")} AS h0 FROM tf),
    prj AS MATERIALIZED (
      $projs),
    cells AS (
      SELECT j, bucket, CAST(sum(cnt) AS BIGINT) AS cell
      FROM prj GROUP BY 1, 2),
    est AS MATERIALIZED (
      SELECT p.tok, p.cnt, CAST(min(c.cell) AS BIGINT) AS cms_est
      FROM prj p JOIN cells c USING (j, bucket)
      GROUP BY 1, 2),
    gl AS (
      SELECT round(avg((cms_est - cnt) / CAST(cnt AS DOUBLE)) + 1e-9, 6)
          AS mean_rel_overest,
        CAST(sum(CASE WHEN cms_est = cnt THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        CAST(count(*) AS BIGINT) AS vocab
      FROM est),
    top AS (
      SELECT * FROM est ORDER BY cnt DESC, tok LIMIT 20)
    SELECT t.tok, t.cnt, t.cms_est,
      round((t.cms_est - t.cnt) / CAST(t.cnt AS DOUBLE) + 1e-9, 6) AS rel_err,
      g.mean_rel_overest, g.n_exact, g.vocab
    FROM top t CROSS JOIN gl g
    ORDER BY t.cnt DESC, t.tok"""
  }

  /** Mirrors TextAnalysis.textrankKeywords: weighted pagerank over
    * the symmetrized adjacent-token graph, 10 unrolled rounds with
    * per-round 10-dp rounding, deterministic top-20. */
  val qTextrank: String = {
    val iters = (1 to 10).map { i =>
      s"""tr$i AS MATERIALIZED (
      SELECT n.word, n.n_nodes,
        round(0.15 / n.n_nodes + 0.85 * coalesce(c.in_sum, 0.0), 10) AS pr
      FROM tr${i - 1} n LEFT JOIN (
        SELECT e.w2 AS word, sum(p.pr * e.wt / d.wdeg) AS in_sum
        FROM edges e
        JOIN tr${i - 1} p ON p.word = e.w1
        JOIN wdeg d ON d.w1 = e.w1
        GROUP BY 1) c ON c.word = n.word)"""
    }.mkString(",\n    ")
    s"""
    WITH sw AS (SELECT $toks AS w FROM documents),
    bg AS (
      SELECT unnest(CASE WHEN len(w) >= 2
        THEN [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
        ELSE [] END) AS bigram
      FROM sw),
    split_bg AS (
      SELECT string_split(bigram, ' ')[1] AS w1,
             string_split(bigram, ' ')[2] AS w2
      FROM bg),
    fil AS (
      SELECT w1, w2 FROM split_bg
      WHERE len(w1) >= 3 AND len(w2) >= 3 AND w1 != w2),
    edges AS MATERIALIZED (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS wt FROM (
        SELECT w1, w2 FROM fil
        UNION ALL SELECT w2, w1 FROM fil)
      GROUP BY 1, 2),
    wdeg AS MATERIALIZED (
      SELECT w1, CAST(sum(wt) AS BIGINT) AS wdeg FROM edges GROUP BY 1),
    nodes AS (SELECT w1 AS word FROM wdeg),
    nn AS (SELECT count(*) AS n_nodes FROM nodes),
    tr0 AS MATERIALIZED (
      SELECT word, n_nodes, round(1.0 / n_nodes, 10) AS pr FROM nodes, nn),
    $iters
    SELECT word, round(pr + 1e-9, 8) AS textrank
    FROM tr10 ORDER BY textrank DESC, word LIMIT 20"""
  }

  /** Mirrors TextAnalysis.typeTokenRatio: per-doc lexical diversity
    * from the (doc, token) count frame. */
  val qTextTtr: String = s"""
    WITH tf AS (
      SELECT doc_id, t.tok, CAST(count(*) AS BIGINT) AS cnt
      FROM documents, unnest($toks) AS t(tok)
      GROUP BY 1, 2),
    agg AS (
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        CAST(count(*) AS BIGINT) AS n_types,
        CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      FROM tf GROUP BY 1)
    SELECT doc_id, n_tokens, n_types, n_hapax,
      round(n_types / CAST(n_tokens AS DOUBLE) + 1e-9, 6) AS ttr,
      round(n_hapax / CAST(n_types AS DOUBLE) + 1e-9, 6) AS hapax_share
    FROM agg ORDER BY doc_id"""

  val qTextRepetition: String = s"""
    WITH tc AS (
      SELECT doc_id, tok, count(*) AS c FROM (
        SELECT doc_id, unnest($toks) AS tok FROM documents)
      GROUP BY 1, 2),
    ts AS (
      SELECT doc_id, sum(c)::BIGINT AS n_tokens, max(c) AS top_c,
        count(*) AS n_distinct
      FROM tc GROUP BY 1),
    bc AS (
      SELECT doc_id, bigram, count(*) AS c FROM (
        SELECT doc_id, unnest(CASE WHEN len(w) >= 2
          THEN [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
          ELSE [] END) AS bigram
        FROM (SELECT doc_id, $toks AS w FROM documents))
      GROUP BY 1, 2),
    bs AS (
      SELECT doc_id, sum(c)::BIGINT AS n_bigrams, max(c) AS top_bg
      FROM bc GROUP BY 1)
    SELECT t.doc_id, t.n_tokens,
      round(t.top_c / t.n_tokens::DOUBLE + 1e-9, 6) AS top_word_share,
      round(1.0 - t.n_distinct / t.n_tokens::DOUBLE + 1e-9, 6) AS dup_word_share,
      round(b.top_bg / b.n_bigrams::DOUBLE + 1e-9, 6) AS top_bigram_share
    FROM ts t LEFT JOIN bs b USING (doc_id) ORDER BY t.doc_id"""

  val qTextTfidf: String = s"""
    WITH tc AS (
      SELECT doc_id, tok, count(*) AS c FROM (
        SELECT doc_id, unnest($toks) AS tok FROM documents)
      GROUP BY 1, 2),
    nt AS (SELECT doc_id, sum(c)::BIGINT AS n_tokens FROM tc GROUP BY 1),
    dfq AS (SELECT tok, count(*)::BIGINT AS df FROM tc GROUP BY 1),
    nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
    scored AS (
      SELECT tc.doc_id, tc.tok, dfq.df,
        round((tc.c / nt.n_tokens::DOUBLE) * ((nd.n_docs + 1.0) / (dfq.df + 1.0)) + 1e-9, 6) AS score
      FROM tc JOIN nt USING (doc_id) JOIN dfq USING (tok) CROSS JOIN nd)
    SELECT doc_id, rank, tok, score, df FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rank
      FROM scored)
    WHERE rank <= 3 ORDER BY doc_id, rank"""

  val qContamination: String = s"""
    WITH $shCte,
    tr AS (SELECT doc_id, unnest(hashes) AS h FROM hash_t WHERE doc_id % 20 != 0),
    ev AS (SELECT doc_id AS eval_id, unnest(hashes) AS h FROM hash_t WHERE doc_id % 20 = 0)
    SELECT doc_id, count(DISTINCT h) AS n_shared,
      count(DISTINCT eval_id) AS n_eval_docs
    FROM tr JOIN ev USING (h) GROUP BY 1 ORDER BY doc_id"""

  val qCorpusSplit: String = s"""
    WITH tagged AS (
      SELECT lang, CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT lang, ${ph("('split:' || doc_id::VARCHAR)")} % 10 AS b FROM documents)),
    g AS (SELECT lang, split, count(*) AS n FROM tagged GROUP BY 1, 2)
    SELECT lang, split, n,
      round(n / (sum(n) OVER (PARTITION BY lang))::DOUBLE + 1e-9, 6) AS share
    FROM g ORDER BY lang, split"""

  /** Corpus.clean composition: langid + quality gates first, then the
    * exact-Jaccard component closure over gate-PASSING docs only (the
    * canonical representative is always a surviving doc). */
  val qCorpusClean: String = {
    val scores = Profiles.map { case (l, ws) =>
      s"len(list_filter($toks, t -> list_contains(${profList(ws)}, t))) AS score_$l"
    }.mkString(",\n        ")
    val maxS = Profiles.map(p => s"score_${p._1}").mkString("greatest(", ", ", ")")
    val pred = Profiles.map { case (l, _) =>
      s"WHEN score_$l >= $maxS AND score_$l > 0 THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    val stop = s"len(list_filter($toks, t -> list_contains(${profList(Profiles.head._2)}, t)))::DOUBLE"
    s"""
    WITH RECURSIVE $shCte,
    lang_s AS (SELECT doc_id, $scores FROM documents),
    lang_p AS (SELECT doc_id, $pred AS predicted FROM lang_s),
    qual_f AS (
      SELECT doc_id, len($toks) AS n_tokens,
        round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
          / length(text) + 1e-9, 6) AS punct_ratio,
        round($stop / len($toks) + 1e-9, 6) AS stopword_ratio
      FROM documents),
    qual AS (
      SELECT doc_id, round(least(1.0, n_tokens / 100.0) * (1.0 - punct_ratio) *
        (0.5 + least(0.5, stopword_ratio * 2.0)) + 1e-9, 6) AS quality_score
      FROM qual_f),
    gated AS (
      SELECT d.doc_id, l.predicted, q.quality_score,
        CASE WHEN l.predicted != 'en' THEN 'lang'
             WHEN q.quality_score < 0.2 THEN 'quality' END AS gate_reason
      FROM documents d JOIN lang_p l USING (doc_id) JOIN qual q USING (doc_id)),
    p_hash AS (
      SELECT h.doc_id, h.hashes FROM hash_t h JOIN gated g USING (doc_id)
      WHERE g.gate_reason IS NULL),
    jp AS (${jpairsOver("p_hash")}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM jp
      UNION ALL SELECT id_b, id_a FROM jp),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM gated WHERE gate_reason IS NULL
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.id = e.dst),
    comp AS (SELECT id AS doc_id, min(lbl) AS comp FROM reach GROUP BY 1),
    sizes AS (SELECT comp, count(*) AS comp_size FROM comp GROUP BY 1)
    SELECT g.doc_id, g.predicted AS lang, g.quality_score,
      c.comp AS canonical_id, s.comp_size,
      coalesce(g.gate_reason,
        CASE WHEN g.doc_id != c.comp THEN 'duplicate' END) IS NULL AS keep,
      coalesce(g.gate_reason,
        CASE WHEN g.doc_id != c.comp THEN 'duplicate' END) AS drop_reason
    FROM gated g LEFT JOIN comp c USING (doc_id)
      LEFT JOIN sizes s ON s.comp = c.comp
    ORDER BY g.doc_id"""
  }

  /** Mirror of TextAnalysis.qualityClassifier: re-trains the logistic
    * regression to bit-identical weights (fixed rounds, every float
    * seam quantized `round(x + 1e-9, 6)`), then scores every doc. */
  val qQualityClassifier: String = {
    def share(ws: Seq[String]): String =
      s"round(len(list_filter($toks, t -> list_contains(${profList(ws)}, t)))" +
        s" / len($toks)::DOUBLE + 1e-9, 6)"
    val feat = s"""feat AS (
      SELECT doc_id,
        CASE WHEN lang = 'en' THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS y,
        1.0::DOUBLE AS x0,
        ${share(graft.text.TextAnalysis.Profiles(0)._2)} AS x1,
        ${share(graft.text.TextAnalysis.Profiles(1)._2)} AS x2,
        ${share(graft.text.TextAnalysis.Profiles(2)._2)} AS x3
      FROM documents)"""
    val sig = "round(1.0::DOUBLE / (1.0::DOUBLE + " +
      "exp(-(w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3))) + 1e-9, 6)"
    def pC(i: Int) = s"p_$i AS (SELECT f.*, $sig AS p FROM feat f, w_${i - 1} w)"
    def gC(i: Int) = s"g_$i AS (SELECT " +
      (0 to 3).map(j => s"round(avg((p - y) * x$j) + 1e-9, 6) AS g$j").mkString(", ") +
      s" FROM p_$i)"
    def wC(i: Int) = s"w_$i AS (SELECT " +
      (0 to 3).map(j => s"round(w.w$j - g.g$j + 1e-9, 6) AS w$j").mkString(", ") +
      s" FROM w_${i - 1} w, g_$i g)"
    val rounds = (1 to 3).map(i => Seq(pC(i), gC(i), wC(i)).mkString(",\n    "))
      .mkString(",\n    ")
    s"""
    WITH $feat,
    w_0 AS (SELECT 0.0::DOUBLE AS w0, 0.0::DOUBLE AS w1,
                   0.0::DOUBLE AS w2, 0.0::DOUBLE AS w3),
    $rounds
    SELECT f.doc_id, f.y, $sig AS score, $sig >= 0.5 AS pred
    FROM feat f, w_3 w ORDER BY f.doc_id"""
  }

  /** Mirror of Dedup.dupSpans (word-4-gram duplicated-span removal):
    * positional hashes with multiplicity, corpus df ≥ 2 marks duplicate
    * positions, run-grouping + interval-merge windows, per-doc rollup. */
  val qDedupSpans: String = s"""
    WITH sw_t AS (SELECT doc_id, $toks AS sw FROM documents),
    pos_t AS (
      SELECT doc_id,
        unnest(CASE WHEN len(sw) >= 4 THEN range(0, len(sw) - 3) ELSE [] END) AS pos,
        sw
      FROM sw_t),
    sstr_t AS (
      SELECT doc_id, pos,
        sw[pos+1] || ' ' || sw[pos+2] || ' ' || sw[pos+3] || ' ' || sw[pos+4] AS sstr
      FROM pos_t),
    hash_t2 AS (SELECT doc_id, pos, ${ph("sstr")} AS h FROM sstr_t),
    df_t AS (SELECT h, count(DISTINCT doc_id) AS df FROM hash_t2 GROUP BY h),
    dup_t AS (
      SELECT t.doc_id, t.pos FROM hash_t2 t JOIN df_t USING (h) WHERE df >= 2),
    isl AS (
      SELECT doc_id, pos,
        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM dup_t),
    iv AS (SELECT doc_id, min(pos) AS s, max(pos) + 3 AS e
           FROM isl GROUP BY doc_id, grp),
    mg_t AS (
      SELECT doc_id, s, e,
        max(e) OVER (PARTITION BY doc_id ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      FROM iv),
    fl AS (
      SELECT doc_id, s, e,
        CASE WHEN pm IS NULL OR s > pm + 1 THEN 1 ELSE 0 END AS nf
      FROM mg_t),
    gr AS (
      SELECT doc_id, s, e,
        sum(nf) OVER (PARTITION BY doc_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mg
      FROM fl),
    sp AS (SELECT doc_id, min(s) AS ss, max(e) AS se FROM gr GROUP BY doc_id, mg),
    per AS (
      SELECT doc_id, count(*)::BIGINT AS n_spans,
        sum(se - ss + 1)::BIGINT AS words_removed
      FROM sp GROUP BY doc_id)
    SELECT d.doc_id, len($toksD)::BIGINT AS n_words,
      coalesce(per.n_spans, 0)::BIGINT AS n_spans,
      coalesce(per.words_removed, 0)::BIGINT AS words_removed,
      round((len($toksD) - coalesce(per.words_removed, 0))
            / len($toksD)::DOUBLE + 1e-9, 6) AS keep_share
    FROM documents d LEFT JOIN per USING (doc_id)
    ORDER BY d.doc_id"""

  val qTextDupngrams: String = s"""
    WITH $shCte,
    ex AS (SELECT doc_id, unnest(hashes) AS h FROM hash_t),
    dfq AS (SELECT h, count(*) AS df FROM ex GROUP BY 1),
    per AS (
      SELECT ex.doc_id, count(*) AS n_shingles,
        sum(CASE WHEN dfq.df > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup
      FROM ex JOIN dfq USING (h) GROUP BY 1)
    SELECT d.doc_id,
      coalesce(p.n_shingles, 0)::BIGINT AS n_shingles,
      coalesce(p.n_dup, 0)::BIGINT AS n_dup,
      round(coalesce(p.n_dup, 0) / coalesce(p.n_shingles, 0)::DOUBLE + 1e-9, 6) AS dup_share
    FROM documents d LEFT JOIN per p USING (doc_id)
    ORDER BY d.doc_id"""

  val qPackSequences: String = s"""
    WITH t AS (
      SELECT doc_id, lang, len($toks) AS n_tokens FROM documents),
    c AS (
      SELECT doc_id, lang, n_tokens,
        sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t)
    SELECT lang, ((cum - n_tokens) // 256)::BIGINT AS bin,
      count(*) AS n_docs, sum(n_tokens)::BIGINT AS bin_tokens,
      min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM c GROUP BY 1, 2 ORDER BY lang, bin"""

  val qCorpusStats: String = s"""
    WITH t AS (SELECT lang, len($toks) AS n_tokens FROM documents)
    SELECT lang, count(*) AS n_docs,
      round(avg(n_tokens) + 1e-9, 6) AS mean_tokens,
      round(quantile_cont(n_tokens, 0.25) + 1e-9, 6) AS p25_tokens,
      round(quantile_cont(n_tokens, 0.5) + 1e-9, 6) AS p50_tokens,
      round(quantile_cont(n_tokens, 0.75) + 1e-9, 6) AS p75_tokens,
      min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
    FROM t GROUP BY 1 ORDER BY lang"""

  /** Deterministic k-means CTE chain (same seeding, fixed Lloyd
    * rounds, quantized centroids, lowest-cid tiebreak as
    * Cluster.kmeans); yields (cte block, final assignment table) so
    * the cluster and outlier oracles share one body. */
  private def kmeansCtes: (String, String) = {
    val k = 8; val iters = 2
    def dot(a: String, b: String): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($a) + 1), " +
        s"i -> $a[i] * $b[i])), (x, y) -> x + y)"
    def scoreCte(i: Int): String = s"""
    s$i AS (
      SELECT e.vec_id, c.cid,
        ${dot("e.emb", "c.cvec")} / (sqrt(${dot("e.emb", "e.emb")}) * sqrt(${dot("c.cvec", "c.cvec")})) AS cos
      FROM e CROSS JOIN c$i c),
    a$i AS (
      SELECT vec_id, cid AS cluster, cos FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
        FROM s$i)
      WHERE rn = 1)"""
    def reestCte(i: Int): String = s"""
    m$i AS (
      SELECT cluster AS cid, i, round(avg(emb[i]) + 1e-9, 6) AS v FROM (
        SELECT a$i.cluster, e.emb, unnest(range(1, len(e.emb) + 1)) AS i
        FROM a$i JOIN e USING (vec_id))
      GROUP BY 1, 2),
    c${i + 1} AS (SELECT cid, list(v ORDER BY i) AS cvec FROM m$i GROUP BY cid)"""
    val rounds = (0 until iters).map(i => scoreCte(i) + "," + reestCte(i)).mkString(",")
    (s"""
    e AS (
      SELECT vec_id::BIGINT AS vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
      FROM embeddings),
    c0 AS (SELECT vec_id::INT AS cid, emb AS cvec FROM e WHERE vec_id < $k),
    $rounds,
    ${scoreCte(iters)}""", s"a$iters")
  }

  val qEmbedCluster: String = {
    val (ctes, fin) = kmeansCtes
    s"""
    WITH $ctes
    SELECT vec_id, cluster, round(cos + 1e-9, 6) AS cosine
    FROM $fin ORDER BY vec_id"""
  }

  /** Outlier pruning on the kmeans assignment: rank over the QUANTIZED
    * cosine (vec_id tiebreak), integer 10%-cutoff — mirrors
    * Cluster.outliers. */
  val qEmbedOutliers: String = {
    val (ctes, fin) = kmeansCtes
    s"""
    WITH $ctes,
    q AS (SELECT vec_id, cluster, round(cos + 1e-9, 6) AS cosine FROM $fin),
    r AS (
      SELECT vec_id, cluster, cosine,
        row_number() OVER (PARTITION BY cluster ORDER BY cosine ASC, vec_id) AS rank_far,
        count(*) OVER (PARTITION BY cluster) AS n_cluster
      FROM q)
    SELECT vec_id, cluster, cosine, rank_far, n_cluster,
      rank_far * 10 <= n_cluster AS is_outlier
    FROM r ORDER BY vec_id"""
  }

  /** Mirrors TextAnalysis.heapsFit: first-occurrence vocab growth,
    * exact integer cumsums, log–log OLS over doc checkpoints. */
  val qHeapsFit: String = s"""
    WITH tok AS (
      SELECT doc_id::BIGINT AS doc_id, unnest($toks) AS token
      FROM documents),
    tokf AS (SELECT doc_id, token FROM tok WHERE len(token) > 0),
    new_types AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_new FROM (
        SELECT token, min(doc_id) AS doc_id FROM tokf GROUP BY 1)
      GROUP BY 1),
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok
      FROM tokf GROUP BY 1),
    cum AS (
      SELECT p.doc_id,
        sum(p.n_tok) OVER win AS cum_tok,
        sum(coalesce(n.n_new, 0)) OVER win AS cum_vocab
      FROM per_doc p LEFT JOIN new_types n USING (doc_id)
      WINDOW win AS (ORDER BY p.doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    pts AS (
      SELECT ln(cum_tok::DOUBLE) AS x, ln(cum_vocab::DOUBLE) AS y,
        cum_tok, cum_vocab
      FROM cum WHERE cum_tok > 0 AND cum_vocab > 0),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(max(cum_tok) AS BIGINT) AS total_tokens,
        CAST(max(cum_vocab) AS BIGINT) AS vocab,
        sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx, sum(y*y) AS syy,
        sum(x*y) AS sxy
      FROM pts),
    d AS (
      SELECT *, n_docs*sxx - sx*sx AS det, n_docs*syy - sy*sy AS dety
      FROM s)
    SELECT n_docs, total_tokens, vocab,
      CASE WHEN det > 0.0
        THEN round((n_docs*sxy - sx*sy) / det + 1e-9, 6) END AS heaps_beta,
      CASE WHEN det > 0.0
        THEN round((sy - (n_docs*sxy - sx*sy)/det*sx)/n_docs + 1e-9, 6)
      END AS log_k,
      CASE WHEN det > 0.0 AND dety > 0.0
        THEN round((n_docs*sxy - sx*sy)*(n_docs*sxy - sx*sy)/(det*dety)
          + 1e-9, 6) END AS r2
    FROM d"""

  /** Mirrors TextAnalysis.docNovelty: distinct (doc, type) collapse,
    * first-occurrence share per doc. */
  val qDocNovelty: String = s"""
    WITH tok AS (
      SELECT doc_id::BIGINT AS doc_id, unnest($toks) AS token
      FROM documents),
    types AS (
      SELECT doc_id, token FROM tok WHERE len(token) > 0 GROUP BY 1, 2),
    first AS (
      SELECT token, min(doc_id) AS first_doc FROM types GROUP BY 1),
    per AS (
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_types,
        CAST(sum(CASE WHEN f.first_doc = t.doc_id THEN 1 ELSE 0 END)
          AS BIGINT) AS n_new_types
      FROM types t JOIN first f USING (token) GROUP BY 1)
    SELECT doc_id, n_types, n_new_types,
      round(n_new_types / n_types::DOUBLE + 1e-9, 6) AS novelty
    FROM per ORDER BY doc_id"""

  /** Mirrors Cluster.silhouette: full k-cosine score table, own vs
    * best-other centroid, per-cluster rollup. */
  val qSilhouette: String = {
    val (ctes, fin) = kmeansCtes
    val score = "s" + fin.drop(1) // the score table behind the final assignment
    s"""
    WITH $ctes,
    second AS (
      SELECT s.vec_id, max(s.cos) AS cos2
      FROM $score s JOIN $fin b ON s.vec_id = b.vec_id AND s.cid != b.cluster
      GROUP BY 1),
    sil AS (
      SELECT b.cluster, round(b.cos - s.cos2 + 1e-9, 6) AS sil
      FROM $fin b JOIN second s USING (vec_id))
    SELECT cluster, CAST(count(*) AS BIGINT) AS n,
      round(avg(sil) + 1e-9, 6) AS mean_sil,
      round(min(sil) + 1e-9, 6) AS min_sil
    FROM sil GROUP BY 1 ORDER BY cluster"""
  }

  /** SemDeDup within the kmeans clusters — mirrors Cluster.semDedup:
    * per-cluster pair cosines quantized to 6dp before the τ compare,
    * keep = no lower-id same-cluster neighbor at cos ≥ τ. */
  val qSemDedup: String = {
    val (ctes, fin) = kmeansCtes
    val tau = 0.4
    s"""
    WITH $ctes,
    asg AS (SELECT vec_id, cluster FROM $fin),
    av AS (SELECT a.vec_id, a.cluster, e.emb FROM asg a JOIN e USING (vec_id)),
    pr AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b,
        round(${vdot("x.emb", "y.emb")} /
          (sqrt(${vdot("x.emb", "x.emb")}) * sqrt(${vdot("y.emb", "y.emb")}))
          + 1e-9, 6) AS cos
      FROM av x JOIN av y ON x.cluster = y.cluster AND x.vec_id < y.vec_id),
    dups AS (
      SELECT id_b AS vec_id, count(*) AS n_dup_lower, max(cos) AS max_cos
      FROM pr WHERE cos >= $tau GROUP BY 1)
    SELECT a.vec_id, a.cluster,
      coalesce(d.n_dup_lower, 0)::BIGINT AS n_dup_lower,
      coalesce(d.max_cos, 0.0) AS max_cos,
      d.vec_id IS NULL AS keep
    FROM asg a LEFT JOIN dups d ON a.vec_id = d.vec_id
    ORDER BY a.vec_id"""
  }

  val qCorpusSample: String = s"""
    WITH b AS (
      SELECT doc_id, lang, ${ph("('sample:' || doc_id::VARCHAR)")} % 1000 AS bucket
      FROM documents)
    SELECT doc_id, lang FROM b
    WHERE bucket < CASE WHEN lang = 'en' THEN 500 ELSE 1000 END
    ORDER BY doc_id"""

  /** Mirrors LlmQueries.piiPayload + TextAnalysis.piiScan. The regex
    * patterns are shared constants kept inside the Java-regex/RE2
    * agreement subset; DuckDB regexp_replace needs the explicit 'g'
    * flag to match Spark's replace-all semantics. */
  val qTextPii: String = {
    val em = graft.text.TextAnalysis.EmailRe
    val ip = graft.text.TextAnalysis.Ipv4Re
    val phn = graft.text.TextAnalysis.PhoneRe
    s"""
    WITH synth AS (
      SELECT event_id,
        (CASE WHEN event_type = 'view'
           THEN 'contact u' || CAST(user_id AS VARCHAR) || '@mail.net '
           ELSE 'anon ' END)
        || 'from '
        || (CASE WHEN event_id % 3 = 0
            THEN '10.0.' || CAST(user_id % 200 AS VARCHAR) || '.'
              || CAST(event_id % 250 AS VARCHAR)
            ELSE 'intranet' END)
        || (CASE WHEN event_id % 5 = 0
            THEN ' call +1-555-' || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END) AS payload
      FROM events)
    SELECT event_id,
      len(regexp_extract_all(payload, '$em')) AS n_emails,
      len(regexp_extract_all(payload, '$ip')) AS n_ipv4,
      len(regexp_extract_all(payload, '$phn')) AS n_phones,
      length(regexp_replace(regexp_replace(regexp_replace(
        payload, '$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'),
        '$phn', '<PHONE>', 'g')) AS redacted_len,
      len(regexp_extract_all(payload, '$em'))
        + len(regexp_extract_all(payload, '$ip'))
        + len(regexp_extract_all(payload, '$phn')) AS pii_total
    FROM synth ORDER BY event_id"""
  }

  val qTextChunks: String = s"""
    WITH starts AS (
      SELECT doc_id, text,
        unnest(range(1, greatest(length(text), 1) + 1, 150)) AS chunk_start
      FROM documents),
    c AS (SELECT doc_id, chunk_start, substr(text, chunk_start, 200) AS chunk
          FROM starts)
    SELECT doc_id, (chunk_start - 1) // 150 AS chunk_idx, chunk_start,
      length(chunk) AS chunk_len, ${ph("chunk")} AS chunk_hash
    FROM c ORDER BY doc_id, chunk_start"""

  /** weight mirrors Corpus.sourceMix: the integer rational
    * tot/(n_sources*n_tokens) rounded once — never a quotient of two
    * already-rounded doubles. */
  val qSourceMix: String = """
    WITH per AS (
      SELECT source, count(*) AS n_docs,
        CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    tot AS (SELECT sum(n_tokens) AS tot_tokens, count(*) AS n_sources FROM per)
    SELECT source, n_docs, n_tokens,
      round(CAST(n_tokens AS DOUBLE) / tot_tokens + 1e-9, 6) AS token_share,
      round(CAST(tot_tokens AS DOUBLE) / (n_sources * n_tokens) + 1e-9, 6) AS weight,
      least(CAST(1.0 AS DOUBLE),
        round(CAST(tot_tokens AS DOUBLE) / (n_sources * n_tokens) + 1e-9, 6)) AS sample_rate
    FROM per, tot ORDER BY source"""

  val qMultimodalMeta: String = """
    SELECT doc_id,
      CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      octet_length(encode(text)) AS n_bytes,
      hex(encode(substring(text, 1, 4))) AS magic,
      CASE WHEN doc_id % 3 = 0 THEN (doc_id * 37) % 1280 + 64 END AS width,
      CASE WHEN doc_id % 3 = 0 THEN (doc_id * 53) % 720 + 64 END AS height,
      CASE WHEN doc_id % 3 != 0 THEN round(((doc_id * 7) % 300 + 1) / 10.0 + 1e-9, 1) END AS duration_s
    FROM documents ORDER BY doc_id"""

  // Mirrors Multimodal.imageDecode: the engine round-trips each
  // image doc through a synthesized P6 PPM (pixel byte i =
  // (doc_id*31 + i*7) % 256) and a real header+pixel decode; the
  // oracle computes the identical channel statistics from the
  // generator's closed form — no byte parsing, so a bug in either
  // the encoder or the decoder breaks the hash match.
  val qImageDecode: String = """
    WITH img AS (
      SELECT doc_id, CAST(doc_id % 13 + 4 AS INT) AS width,
             CAST(doc_id % 7 + 4 AS INT) AS height
      FROM documents WHERE doc_id % 3 = 0),
    px AS (
      SELECT doc_id, width, height,
        unnest(range(0, width * height * 3)) AS i
      FROM img),
    ch AS (
      SELECT doc_id, width, height,
        CAST(width AS BIGINT) * height AS n_pixels,
        CAST(sum(CASE WHEN i % 3 = 0 THEN (doc_id * 31 + i * 7) % 256 END) AS BIGINT) AS sum_r,
        CAST(sum(CASE WHEN i % 3 = 1 THEN (doc_id * 31 + i * 7) % 256 END) AS BIGINT) AS sum_g,
        CAST(sum(CASE WHEN i % 3 = 2 THEN (doc_id * 31 + i * 7) % 256 END) AS BIGINT) AS sum_b
      FROM px GROUP BY 1, 2, 3),
    m AS (
      SELECT doc_id, width, height, n_pixels,
        round(sum_r / n_pixels::DOUBLE + 1e-9, 6) AS mean_r,
        round(sum_g / n_pixels::DOUBLE + 1e-9, 6) AS mean_g,
        round(sum_b / n_pixels::DOUBLE + 1e-9, 6) AS mean_b
      FROM ch)
    SELECT doc_id, width, height, n_pixels, mean_r, mean_g, mean_b,
      round(0.299 * mean_r + 0.587 * mean_g + 0.114 * mean_b + 1e-9, 6)
        AS luma
    FROM m ORDER BY doc_id"""

  /** Mirrors Multimodal.imageDecodePng: the engine round-trips a real
    * PNG (two IDAT chunks, per-row filters 0-4, CRC-verified walk,
    * Inflater) whose RAW pixels follow the same closed form as the
    * PPM variant — the oracle needs only the generator arithmetic, so
    * any encoder/decoder/filter bug breaks this hash match. */
  val qImageDecodePng: String = """
    WITH img AS (
      SELECT doc_id, CAST(doc_id % 11 + 4 AS INT) AS width,
             CAST(doc_id % 5 + 4 AS INT) AS height
      FROM documents WHERE doc_id % 3 = 0),
    px AS (
      SELECT doc_id, width, height,
        unnest(range(0, width * height * 3)) AS i
      FROM img),
    ch AS (
      SELECT doc_id, width, height,
        CAST(width AS BIGINT) * height AS n_pixels,
        CAST(sum(CASE WHEN i % 3 = 0 THEN (doc_id * 31 + i * 7) % 256 END) AS BIGINT) AS sum_r,
        CAST(sum(CASE WHEN i % 3 = 1 THEN (doc_id * 31 + i * 7) % 256 END) AS BIGINT) AS sum_g,
        CAST(sum(CASE WHEN i % 3 = 2 THEN (doc_id * 31 + i * 7) % 256 END) AS BIGINT) AS sum_b
      FROM px GROUP BY 1, 2, 3),
    m AS (
      SELECT doc_id, width, height, n_pixels,
        round(sum_r / n_pixels::DOUBLE + 1e-9, 6) AS mean_r,
        round(sum_g / n_pixels::DOUBLE + 1e-9, 6) AS mean_g,
        round(sum_b / n_pixels::DOUBLE + 1e-9, 6) AS mean_b
      FROM ch)
    SELECT doc_id, width, height, n_pixels, mean_r, mean_g, mean_b,
      round(0.299 * mean_r + 0.587 * mean_g + 0.114 * mean_b + 1e-9, 6)
        AS luma
    FROM m ORDER BY doc_id"""

  /** Mirrors Multimodal.imageDecodeBmp: the engine round-trips a real
    * Windows bitmap (24-bit BGR truecolor on even ids, 8-bit palette
    * with a 64-entry BGRA table on odd ids; bottom-up rows except
    * ids % 5 = 0 which are top-down; 4-byte row padding) whose
    * TOP-DOWN RGB raster is closed-form — the oracle reproduces the
    * decoded statistics from the generator arithmetic. The
    * row-weighted mean makes the bottom-up flip and the stride
    * position-sensitive: channel sums alone are permutation-invariant
    * and would not catch a row-order or padding bug. */
  val qImageDecodeBmp: String = """
    WITH img AS (
      SELECT doc_id, CAST(doc_id % 9 + 4 AS INT) AS width,
             CAST(doc_id % 8 + 4 AS INT) AS height,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 8 END AS INT) AS bpp
      FROM documents WHERE doc_id % 3 = 0),
    tc AS (
      SELECT doc_id, width, height, bpp,
        unnest(range(0, width * height * 3)) AS i
      FROM img WHERE bpp = 24),
    tcv AS (
      SELECT doc_id, width, height, bpp, (i // 3) // width AS y, i % 3 AS c,
        (doc_id * 37 + i * 11) % 256 AS v
      FROM tc),
    pl AS (
      SELECT doc_id, width, height, bpp,
        unnest(range(0, width * height)) AS p
      FROM img WHERE bpp = 8),
    plv0 AS (
      SELECT doc_id, width, height, bpp, p, p // width AS y,
        (doc_id * 37 + p * 11) % 64 AS j
      FROM pl),
    plv AS (
      SELECT doc_id, width, height, bpp, y, c,
        CASE c WHEN 0 THEN (doc_id * 3 + j * 7) % 256
               WHEN 1 THEN (doc_id * 5 + j * 11) % 256
               ELSE (doc_id * 7 + j * 13) % 256 END AS v
      FROM plv0, (SELECT unnest(range(0, 3)) AS c)),
    u AS (
      SELECT * FROM tcv UNION ALL SELECT * FROM plv),
    agg AS (
      SELECT doc_id, width, height, bpp,
        CAST(width AS BIGINT) * height AS n_pixels,
        CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_r,
        CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_g,
        CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_b,
        CAST(sum((y + 1) * v) AS BIGINT) AS wsum
      FROM u GROUP BY 1, 2, 3, 4),
    m AS (
      SELECT doc_id, width, height, bpp, n_pixels,
        round(sum_r / n_pixels::DOUBLE + 1e-9, 6) AS mean_r,
        round(sum_g / n_pixels::DOUBLE + 1e-9, 6) AS mean_g,
        round(sum_b / n_pixels::DOUBLE + 1e-9, 6) AS mean_b,
        round(wsum / (3.0 * n_pixels) + 1e-9, 6) AS row_wmean
      FROM agg)
    SELECT doc_id, width, height, bpp, n_pixels, mean_r, mean_g, mean_b,
      round(0.299 * mean_r + 0.587 * mean_g + 0.114 * mean_b + 1e-9, 6)
        AS luma,
      row_wmean
    FROM m ORDER BY doc_id"""

  /** Mirrors Multimodal.imageDecodeTiff: the engine round-trips a
    * real baseline TIFF (II little-endian on ids % 4 < 2, MM
    * big-endian otherwise; grayscale/RGB by parity; RowsPerStrip 3 ⇒
    * 2-3 strips; RGB BitsPerSample behind an offset) whose top-down
    * raster is closed-form; the oracle reproduces the decoded
    * statistics from the generator arithmetic — the row-weighted mean
    * makes the strip walk position-sensitive, and gray replicates
    * across the RGB channels exactly as the engine does. */
  val qImageDecodeTiff: String = """
    WITH img AS (
      SELECT doc_id, CAST(doc_id % 10 + 4 AS INT) AS width,
             CAST(doc_id % 6 + 4 AS INT) AS height,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS INT) AS photometric,
             CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS spp
      FROM documents WHERE doc_id % 3 = 0),
    rgb AS (
      SELECT doc_id, width, height, photometric,
        unnest(range(0, width * height * 3)) AS i
      FROM img WHERE spp = 3),
    rgbv AS (
      SELECT doc_id, width, height, photometric, (i // 3) // width AS y, i % 3 AS c,
        (doc_id * 41 + i * 13) % 256 AS v
      FROM rgb),
    gr AS (
      SELECT doc_id, width, height, photometric,
        unnest(range(0, width * height)) AS p
      FROM img WHERE spp = 1),
    grv AS (
      SELECT doc_id, width, height, photometric, p // width AS y, c,
        (doc_id * 41 + p * 13) % 256 AS v
      FROM gr, (SELECT unnest(range(0, 3)) AS c)),
    u AS (SELECT * FROM rgbv UNION ALL SELECT * FROM grv),
    agg AS (
      SELECT doc_id, width, height, photometric,
        CAST(width AS BIGINT) * height AS n_pixels,
        CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_r,
        CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_g,
        CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_b,
        CAST(sum((y + 1) * v) AS BIGINT) AS wsum
      FROM u GROUP BY 1, 2, 3, 4),
    m AS (
      SELECT doc_id, width, height, photometric,
        CAST((height + 2) // 3 AS INT) AS n_strips, n_pixels,
        round(sum_r / n_pixels::DOUBLE + 1e-9, 6) AS mean_r,
        round(sum_g / n_pixels::DOUBLE + 1e-9, 6) AS mean_g,
        round(sum_b / n_pixels::DOUBLE + 1e-9, 6) AS mean_b,
        round(wsum / (3.0 * n_pixels) + 1e-9, 6) AS row_wmean
      FROM agg)
    SELECT doc_id, width, height, photometric, n_strips, n_pixels,
      mean_r, mean_g, mean_b,
      round(0.299 * mean_r + 0.587 * mean_g + 0.114 * mean_b + 1e-9, 6)
        AS luma,
      row_wmean
    FROM m ORDER BY doc_id"""

  /** Mirrors Multimodal.imageDecodeIco: two icons per doc (24-bit and
    * 8-bit-palette DIBs inside the ICONDIR container); channel means
    * run over OPAQUE pixels only, so the AND-mask parse — its 32-BIT
    * row padding and bottom-up order — is load-bearing in the hash. */
  val qImageDecodeIco: String = """
    WITH icons AS (
      SELECT doc_id, k,
        CAST(CASE k WHEN 0 THEN doc_id % 6 + 4 ELSE doc_id % 4 + 3 END AS INT) AS s,
        CAST(CASE k WHEN 0 THEN 24 ELSE 8 END AS INT) AS bpp
      FROM documents, (SELECT unnest(range(0, 2)) AS k)
      WHERE doc_id % 3 = 0),
    px AS (
      SELECT doc_id, k, s, bpp, unnest(range(0, s * s)) AS p FROM icons),
    op AS (
      SELECT doc_id, k, s, bpp, p,
        (doc_id * 29 + k * 13 + p * 7) % 5 = 0 AS transp,
        CASE WHEN bpp = 8 THEN (doc_id * 43 + k * 97 + p * 19) % 64 END AS j
      FROM px),
    v AS (
      SELECT doc_id, k, s, bpp, p, transp, c,
        CASE WHEN bpp = 24 THEN (doc_id * 43 + k * 97 + (p * 3 + c) * 19) % 256
             ELSE CASE c WHEN 0 THEN (doc_id * 3 + j * 5) % 256
                         WHEN 1 THEN (doc_id * 5 + j * 7) % 256
                         ELSE (doc_id * 7 + j * 9) % 256 END END AS val
      FROM op, (SELECT unnest(range(0, 3)) AS c)),
    agg AS (
      SELECT doc_id, CAST(k AS INT) AS icon_idx, s AS size, bpp,
        CAST(s AS BIGINT) * s AS n_pixels,
        CAST(sum(CASE WHEN NOT transp AND c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_opaque,
        CAST(sum(CASE WHEN NOT transp AND c = 0 THEN val END) AS BIGINT) AS sum_r,
        CAST(sum(CASE WHEN NOT transp AND c = 1 THEN val END) AS BIGINT) AS sum_g,
        CAST(sum(CASE WHEN NOT transp AND c = 2 THEN val END) AS BIGINT) AS sum_b
      FROM v GROUP BY 1, 2, 3, 4, 5),
    m AS (
      SELECT doc_id, icon_idx, size, bpp, n_pixels, n_opaque,
        round(sum_r / n_opaque::DOUBLE + 1e-9, 6) AS mean_r,
        round(sum_g / n_opaque::DOUBLE + 1e-9, 6) AS mean_g,
        round(sum_b / n_opaque::DOUBLE + 1e-9, 6) AS mean_b
      FROM agg)
    SELECT doc_id, icon_idx, size, bpp, n_pixels, n_opaque,
      mean_r, mean_g, mean_b,
      round(0.299 * mean_r + 0.587 * mean_g + 0.114 * mean_b + 1e-9, 6) AS luma
    FROM m ORDER BY doc_id, icon_idx"""

  /** Mirrors Multimodal.imageCrossFormat: the oracle recomputes the
    * raster's polynomial byte hash closed-form; the ENGINE only emits
    * a row after requiring PNG/BMP/TIFF round-trips byte-equal, so
    * formats_agree = 1 is enforced, not assumed. */
  val qImageCrossFormat: String = s"""
    WITH img AS (
      SELECT doc_id, CAST(doc_id % 7 + 4 AS INT) AS width,
             CAST(doc_id % 5 + 4 AS INT) AS height
      FROM documents WHERE doc_id % 3 = 0),
    h AS (
      SELECT doc_id, width, height,
        list_reduce(list_prepend(0::BIGINT,
          list_transform(range(0, width * height * 3),
            i -> (doc_id * 47 + i * 29) % 256)),
          (acc, v) -> (acc * 31 + v) % $P) AS raster_hash
      FROM img)
    SELECT doc_id, width, height, CAST(3 AS INT) AS n_formats,
      CAST(raster_hash AS BIGINT) AS raster_hash,
      CAST(1 AS INT) AS formats_agree
    FROM h ORDER BY doc_id"""

  /** Mirrors Multimodal.imageExif: every field is closed-form id
    * arithmetic; the engine must recover them through the JPEG
    * segment walk + embedded-TIFF IFD chain (IFD0 → tag-34665
    * sub-IFD, ASCII/SHORT/LONG/RATIONAL types, inline-vs-offset). */
  val qImageExif: String = """
    SELECT doc_id,
      CASE WHEN doc_id % 4 < 2 THEN 'II' ELSE 'MM' END AS byte_order,
      CAST(doc_id % 8 + 1 AS INT) AS orientation,
      CAST((doc_id % 6) * 200 + 100 AS INT) AS iso,
      round(((doc_id % 40) * 5 + 180) / 10.0 + 1e-9, 2) AS focal_mm,
      'graftcam' || (doc_id % 3) AS make,
      'GX-' || (doc_id % 100) AS model,
      '2024:01:' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
        ' 10:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') || ':00' AS dt
    FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id"""

  /** Mirrors Multimodal.imageDecodeGif: the engine round-trips a real
    * GIF89a (64-entry global color table, two ancillary extensions,
    * ≤32-byte sub-blocks, genuine variable-width LZW) whose palette
    * indices and palette entries are both closed-form — the oracle
    * reproduces the decoded channel statistics straight from the
    * generator arithmetic, so any LZW, sub-block or palette bug
    * breaks this hash match. */
  val qImageDecodeGif: String = """
    WITH img AS (
      SELECT doc_id, CAST(doc_id % 12 + 4 AS INT) AS width,
             CAST(doc_id % 6 + 4 AS INT) AS height
      FROM documents WHERE doc_id % 3 = 0),
    px AS (
      SELECT doc_id, width, height,
        (doc_id * 31 + unnest(range(0, width * height)) * 7) % 64 AS j
      FROM img),
    ch AS (
      SELECT doc_id, width, height,
        CAST(width AS BIGINT) * height AS n_pixels,
        CAST(sum(j * 37 % 256) AS BIGINT) AS sum_r,
        CAST(sum(j * 59 % 256) AS BIGINT) AS sum_g,
        CAST(sum(j * 83 % 256) AS BIGINT) AS sum_b
      FROM px GROUP BY 1, 2, 3),
    m AS (
      SELECT doc_id, width, height, n_pixels,
        round(sum_r / n_pixels::DOUBLE + 1e-9, 6) AS mean_r,
        round(sum_g / n_pixels::DOUBLE + 1e-9, 6) AS mean_g,
        round(sum_b / n_pixels::DOUBLE + 1e-9, 6) AS mean_b
      FROM ch)
    SELECT doc_id, width, height, n_pixels, mean_r, mean_g, mean_b,
      round(0.299 * mean_r + 0.587 * mean_g + 0.114 * mean_b + 1e-9, 6)
        AS luma
    FROM m ORDER BY doc_id"""

  /** Mirrors Multimodal.gifComposite: the engine composites a real
    * partial-frame GIF (full-screen base, 3×3 patches, the full
    * disposal set 1/2/3, GCE TRANSPARENCY on (doc_id+f)%4==2 frames)
    * onto the logical screen; this oracle reproduces every canvas
    * pixel from the closed form — the source of pixel (x,y) at
    * display frame f is the LATEST covering OPAQUE frame pixel m ≤ f
    * whose effect persists (a disposal-3 frame counts only while it
    * displays, i.e. only when m == f; a transparency frame's pixel at
    * local offset (doc_id+f)%9 never covers), falling back to the
    * background palette index 0 when m < f carried disposal 2 (its
    * rect restores after it shows). Opaque pixels of a transparency
    * frame draw mod-63 indices (the engine synthesizer reserves 63 as
    * the transparent index). A blit-offset, coverage, disposal or
    * transparency bug breaks the hash via the per-position
    * inter-frame MAD. */
  val qGifComposite: String = """
    WITH img AS (
      SELECT doc_id, CAST(doc_id % 6 + 6 AS INT) AS w,
             CAST(doc_id % 4 + 6 AS INT) AS h,
             CAST(doc_id % 3 + 2 AS INT) AS nf
      FROM documents WHERE doc_id % 3 = 0),
    fr AS (
      SELECT doc_id, w, h, unnest(range(0, nf)) AS f FROM img),
    xy AS (
      SELECT doc_id, w, h, f, p % w AS x, p // w AS y
      FROM (SELECT doc_id, w, h, f, unnest(range(0, w * h)) AS p FROM fr)),
    cand AS (
      SELECT a.doc_id, a.w, a.h, a.f, a.x, a.y, b.f AS f2
      FROM xy a JOIN fr b ON a.doc_id = b.doc_id AND b.f <= a.f
        -- a disposal-3 frame's pixels persist only while it displays
        AND (b.f = a.f OR b.f = 0 OR (a.doc_id + b.f) % 4 <> 1)
      WHERE b.f = 0 OR (
        a.x >= (a.doc_id + b.f) % (a.w - 3)
        AND a.x <= (a.doc_id + b.f) % (a.w - 3) + 2
        AND a.y >= (a.doc_id + 2 * b.f) % (a.h - 3)
        AND a.y <= (a.doc_id + 2 * b.f) % (a.h - 3) + 2
        -- a transparency frame's transparent pixel never covers
        AND NOT ((a.doc_id + b.f) % 4 = 2
          AND (a.y - (a.doc_id + 2 * b.f) % (a.h - 3)) * 3
              + (a.x - (a.doc_id + b.f) % (a.w - 3))
              = (a.doc_id + b.f) % 9))),
    srcm AS (
      SELECT doc_id, w, h, f, x, y, max(f2) AS m
      FROM cand GROUP BY 1, 2, 3, 4, 5, 6),
    val AS (
      SELECT doc_id, w, h, f, x, y,
        CASE WHEN m < f AND m >= 1 AND (doc_id + m) % 4 = 0 THEN 0
             WHEN m >= 1 AND (doc_id + m) % 4 = 2 THEN
               (doc_id * 31 + m * 101
                + ((y - (doc_id + 2 * m) % (h - 3)) * 3
                   + (x - (doc_id + m) % (w - 3))) * 7) % 63
             ELSE (doc_id * 31 + m * 101 + (CASE WHEN m = 0 THEN y * w + x
               ELSE (y - (doc_id + 2 * m) % (h - 3)) * 3
                    + (x - (doc_id + m) % (w - 3)) END) * 7) % 64
        END AS j
      FROM srcm),
    rgbv AS (
      SELECT doc_id, w, h, f, x, y,
        j * 37 % 256 AS r, j * 59 % 256 AS g, j * 83 % 256 AS b
      FROM val),
    d AS (
      SELECT doc_id, w, h, f, r, g, b,
        lag(r) OVER wnd AS pr, lag(g) OVER wnd AS pg, lag(b) OVER wnd AS pb
      FROM rgbv WINDOW wnd AS (PARTITION BY doc_id, x, y ORDER BY f)),
    s AS (
      SELECT doc_id, w, h, CAST(f AS INT) AS frame_idx,
        CAST(sum(r) AS BIGINT) AS sum_r,
        CAST(sum(g) AS BIGINT) AS sum_g,
        CAST(sum(b) AS BIGINT) AS sum_b,
        CAST(sum(abs(r - pr) + abs(g - pg) + abs(b - pb)) AS BIGINT) AS sad
      FROM d GROUP BY 1, 2, 3, 4)
    SELECT doc_id, frame_idx,
      CAST((doc_id + frame_idx) % 10 + 1 AS INT) AS delay_cs,
      round(sum_r / (w * h)::DOUBLE + 1e-9, 6) AS mean_r,
      round(sum_g / (w * h)::DOUBLE + 1e-9, 6) AS mean_g,
      round(sum_b / (w * h)::DOUBLE + 1e-9, 6) AS mean_b,
      CASE WHEN frame_idx > 0
        THEN round(sad / (3.0 * w * h) + 1e-9, 6) END AS frame_mad
    FROM s ORDER BY doc_id, frame_idx"""

  /** Shared synthesized-URL expression for the web-curation oracles —
    * mirrors LlmQueries.urlPayload exactly (DuckDB strings do not
    * process backslash escapes, so the regexes below carry SINGLE
    * backslashes where the Spark SQL literals carry doubled ones). */
  private val urlExpr: String = """
    'https://' || CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END
      || CASE WHEN doc_id % 11 = 0 THEN 'SITE' ELSE 'site' END
      || CAST(doc_id % 5 AS VARCHAR) || '.example'
      || CAST(doc_id % 3 AS VARCHAR) || '.com/page-'
      || CAST(doc_id % 7 AS VARCHAR)
      || CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END
      || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&ref=rss' ELSE '' END"""

  private val curlExpr: String = """
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      lower(url), '^https?://', ''), '^www\.', ''), '\?.*$', ''), '/$', '')"""

  /** Mirrors Corpus.urlDedup: canonical-URL exact dedup (the C4/CCNet
    * first-dedup step) — anchored normalizations, min-id survivor per
    * canonical group. */
  val qDedupUrl: String = s"""
    WITH u AS (SELECT doc_id, $urlExpr AS url FROM documents),
    c AS (SELECT doc_id, $curlExpr AS curl FROM u)
    SELECT CAST(min(doc_id) AS BIGINT) AS canonical_id, curl AS url,
      CAST(count(*) AS BIGINT) AS group_size
    FROM c GROUP BY curl ORDER BY canonical_id"""

  /** Mirrors Corpus.domainStats: per normalized host the doc count,
    * distinct canonical URLs, within-domain dup share and corpus
    * share. */
  val qUrlDomains: String = s"""
    WITH u AS (SELECT doc_id, $urlExpr AS url FROM documents),
    c AS (SELECT doc_id, $curlExpr AS curl FROM u),
    h AS (SELECT doc_id, curl, regexp_extract(curl, '^([^/]+)', 1) AS host FROM c),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM h),
    g AS (SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(count(DISTINCT curl) AS BIGINT) AS n_urls
          FROM h GROUP BY host)
    SELECT host, n_docs, n_urls,
      round(1.0 - n_urls / n_docs::DOUBLE + 1e-9, 6) AS dup_share,
      round(n_docs / n_total::DOUBLE + 1e-9, 6) AS doc_share
    FROM g CROSS JOIN t ORDER BY host"""

  /** Mirrors Multimodal.gifFrames: the engine demuxes a real animated
    * GIF89a (NETSCAPE looping extension, per-frame Graphic Control
    * delays, per-frame LZW streams, INTERLACED odd frames whose
    * de-permutation the position-sensitive inter-frame MAD verifies,
    * and LOCAL color tables on (doc_id+f)%3==0 frames carrying the
    * f-shifted palette — the shift below breaks the hash if the
    * decoder reads the global table instead); delays, palette indices
    * and palette entries are closed-form, so every column reproduces
    * from the generator arithmetic. Frame 0's inter-frame diff is
    * NULL on both engines (the f-1 term in the `jp` expression is
    * garbage there and masked by the CASE). */
  val qGifFrames: String = """
    WITH img AS (
      SELECT doc_id, CAST(doc_id % 7 + 4 AS INT) AS w,
             CAST(doc_id % 5 + 4 AS INT) AS h,
             CAST(doc_id % 4 + 2 AS INT) AS nf
      FROM documents WHERE doc_id % 3 = 0),
    fr AS (
      SELECT doc_id, w, h, unnest(range(0, nf)) AS f FROM img),
    px AS (
      SELECT doc_id, w, h, f, unnest(range(0, w * h)) AS p FROM fr),
    jj AS (
      SELECT doc_id, w, h, f,
        (doc_id * 31 + f * 101 + p * 7) % 64
          + CASE WHEN (doc_id + f) % 3 = 0 THEN f ELSE 0 END AS j,
        (doc_id * 31 + (f - 1) * 101 + p * 7) % 64
          + CASE WHEN (doc_id + f - 1) % 3 = 0 THEN f - 1 ELSE 0 END AS jp
      FROM px),
    s AS (
      SELECT doc_id, w, h, CAST(f AS INT) AS frame_idx,
        CAST(sum(j * 37 % 256) AS BIGINT) AS sum_r,
        CAST(sum(j * 59 % 256) AS BIGINT) AS sum_g,
        CAST(sum(j * 83 % 256) AS BIGINT) AS sum_b,
        CAST(sum(abs(j * 37 % 256 - jp * 37 % 256)
               + abs(j * 59 % 256 - jp * 59 % 256)
               + abs(j * 83 % 256 - jp * 83 % 256)) AS BIGINT) AS sad
      FROM jj GROUP BY 1, 2, 3, 4)
    SELECT doc_id, frame_idx,
      CAST((doc_id + frame_idx) % 10 + 1 AS INT) AS delay_cs,
      round(sum_r / (w * h)::DOUBLE + 1e-9, 6) AS mean_r,
      round(sum_g / (w * h)::DOUBLE + 1e-9, 6) AS mean_g,
      round(sum_b / (w * h)::DOUBLE + 1e-9, 6) AS mean_b,
      CASE WHEN frame_idx > 0
        THEN round(sad / (3.0 * w * h) + 1e-9, 6) END AS frame_mad
    FROM s ORDER BY doc_id, frame_idx"""

  /** Mirrors Multimodal.imageDecodeJpeg: the engine round-trips a real
    * baseline JFIF (in-file Huffman tables, DC differential coding,
    * byte stuffing, float IDCT) whose planted quantized coefficients
    * are closed-form — the oracle reproduces the decoded pixels via
    * the two-term IDCT with the decoder's exact factor order and the
    * repo-wide round(+1e-9) discipline (generator margins verified
    * ≥0.017 from every rounding boundary, so libm ulp noise cannot
    * flip a pixel). Any bug in the Huffman coder, the DC prediction
    * chain, dequantization or the IDCT breaks this hash match. */
  val qImageDecodeJpeg: String = """
    WITH img AS (
      SELECT doc_id, CAST(8 * (doc_id % 3 + 1) AS INT) AS width,
             CAST(8 * (doc_id % 2 + 1) AS INT) AS height
      FROM documents WHERE doc_id % 3 = 0),
    blockidx AS (
      SELECT doc_id, width, height,
        unnest(range(0, (width // 8) * (height // 8))) AS b
      FROM img),
    blocks AS (
      SELECT doc_id, width, height,
        CAST(((doc_id * 7 + b * 3) % 21) - 10 AS INT) AS dc,
        CAST(((doc_id * 11 + b * 5) % 9) - 4 AS INT) AS ac
      FROM blockidx),
    pxs AS (
      SELECT doc_id, width, height,
        greatest(0, least(255, CAST(round(
          0.25 * ((1.0 / sqrt(2.0)) * (1.0 / sqrt(2.0)) * (dc * 16.0)
            + CASE WHEN ac = 0 THEN 0.0
                   ELSE (1.0 / sqrt(2.0)) * (ac * 11.0)
                        * cos((2 * x + 1) * pi() / 16) END)
          + 128 + 1e-9) AS INT))) AS p
      FROM blocks, range(0, 8) tx(x), range(0, 8) ty(y)),
    agg AS (
      SELECT doc_id, width, height,
        CAST(width AS BIGINT) * height AS n_pixels,
        CAST(sum(p) AS BIGINT) AS sum_gray,
        CAST(min(p) AS INT) AS min_gray, CAST(max(p) AS INT) AS max_gray
      FROM pxs GROUP BY 1, 2, 3)
    SELECT doc_id, width, height, n_pixels, sum_gray,
      round(sum_gray / n_pixels::DOUBLE + 1e-9, 6) AS mean_gray,
      min_gray, max_gray
    FROM agg ORDER BY doc_id"""

  /** Mirrors Multimodal.audioSpectrum: the DFT correlation sums run in
    * fixed point (samples exact ints, cos/sin quantized to 1e-6 via
    * floor(x·1e6 + 0.5) on the identical double — both engines build
    * the identical angle expression), so c_sum/s_sum are exact
    * integers regardless of summation order; the ENGINE computes them
    * from genuinely decoded RIFF bytes, this oracle from the
    * generator's closed form. */
  val qAudioSpectrum: String = """
    WITH aud AS (
      SELECT doc_id, CAST(((doc_id * 7) % 300 + 1) * 10 AS INT) AS n
      FROM documents WHERE doc_id % 3 = 1),
    idx AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM aud),
    t AS (
      SELECT doc_id, n, i, k,
        CAST((doc_id * 131 + i * 17) % 4001 - 2000 AS BIGINT) AS s
      FROM idx, range(1, 5) tk(k)),
    sums AS (
      SELECT doc_id, CAST(k AS INT) AS bin,
        CAST(sum(s * CAST(floor(cos(2 * pi() * k * i / n) * 1000000 + 0.5)
          AS BIGINT)) AS BIGINT) AS c_sum,
        CAST(sum(s * CAST(floor(sin(2 * pi() * k * i / n) * 1000000 + 0.5)
          AS BIGINT)) AS BIGINT) AS s_sum
      FROM t GROUP BY 1, 2)
    SELECT doc_id, bin, c_sum, s_sum,
      round(sqrt(CAST(c_sum AS DOUBLE) * CAST(c_sum AS DOUBLE)
        + CAST(s_sum AS DOUBLE) * CAST(s_sum AS DOUBLE)) / 1000000.0
        + 1e-9, 4) AS amp
    FROM sums ORDER BY doc_id, bin"""

  /** Mirrors Multimodal.videoScenes: per-consecutive-frame Y-plane
    * sum of absolute differences from the y4m generator's closed form
    * (the Y plane is the first w·h bytes of each C444 frame payload);
    * the engine folds genuinely demuxed planes — exact integer SADs,
    * so order never matters. */
  val qVideoScenes: String = """
    WITH vid AS (
      SELECT doc_id, CAST(doc_id % 6 + 2 AS INT) AS w,
             CAST(doc_id % 4 + 2 AS INT) AS h,
             CAST(doc_id % 5 + 2 AS INT) AS nf
      FROM documents WHERE doc_id % 3 = 2),
    fr AS (SELECT doc_id, w, h, unnest(range(1, nf)) AS f FROM vid),
    pxi AS (SELECT doc_id, w, h, f, unnest(range(0, w * h)) AS p FROM fr),
    d AS (
      SELECT doc_id, w, h, f,
        abs(CAST((doc_id * 29 + f * 101 + p * 13) % 256 AS BIGINT)
          - CAST((doc_id * 29 + (f - 1) * 101 + p * 13) % 256 AS BIGINT)) AS ad
      FROM pxi),
    s AS (
      SELECT doc_id, w, h, CAST(f AS INT) AS frame_idx,
        CAST(sum(ad) AS BIGINT) AS sum_abs_diff
      FROM d GROUP BY 1, 2, 3, 4)
    SELECT doc_id, frame_idx, sum_abs_diff,
      round(sum_abs_diff / (w * h)::DOUBLE + 1e-9, 6) AS mad,
      round(sum_abs_diff / (w * h)::DOUBLE + 1e-9, 6) > 122.0 AS is_cut
    FROM s ORDER BY doc_id, frame_idx"""

  /** Mirrors Multimodal.imagePhash: the 8×8 64-bit average-hash from
    * the pixel closed form through the identical integer arithmetic
    * (luma via (299r+587g+114b)//1000, integer cell means, integer
    * grid-mean threshold, MSB-first bit packing — the top bit lands in
    * the BIGINT sign, so the hash assembles from two 32-bit halves with
    * an explicit two's-complement wrap), then the all-pairs hamming
    * count the engine's banded join must reproduce exactly
    * (pigeonhole-complete at hamming ≤ 3; DuckDB bit_count is two's
    * complement, so negative hashes compare correctly). */
  val qImagePhash: String = """
    WITH img AS (
      SELECT doc_id, CAST(doc_id % 13 + 8 AS INT) AS w,
        CAST(doc_id % 7 + 8 AS INT) AS h
      FROM documents WHERE doc_id % 3 = 0),
    px AS (
      SELECT doc_id, w, h, unnest(range(0, w * h)) AS p FROM img),
    gr AS (
      SELECT doc_id,
        CAST(((p // w) * 8 // h) * 8 + (p % w) * 8 // w AS INT) AS c,
        (299 * ((doc_id * 31 + (p * 3 + 0) * 7) % 256)
         + 587 * ((doc_id * 31 + (p * 3 + 1) * 7) % 256)
         + 114 * ((doc_id * 31 + (p * 3 + 2) * 7) % 256)) // 1000 AS gray
      FROM px),
    cells AS (
      SELECT doc_id, c, CAST(sum(gray) // count(*) AS BIGINT) AS cv
      FROM gr GROUP BY 1, 2),
    thr AS (
      SELECT doc_id, CAST(sum(cv) // 64 AS BIGINT) AS t FROM cells GROUP BY 1),
    halves AS (
      SELECT doc_id,
        CAST(sum(CASE WHEN cv > t AND c < 32
          THEN CAST(1 AS BIGINT) << (31 - c) ELSE 0 END) AS BIGINT) AS hi,
        CAST(sum(CASE WHEN cv > t AND c >= 32
          THEN CAST(1 AS BIGINT) << (63 - c) ELSE 0 END) AS BIGINT) AS lo
      FROM cells JOIN thr USING (doc_id) GROUP BY 1),
    hs AS (
      SELECT doc_id, CAST((hi - CASE WHEN hi >= 2147483648
        THEN 4294967296 ELSE 0 END) * 4294967296 + lo AS BIGINT) AS phash
      FROM halves),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM hs a JOIN hs b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.phash, b.phash)) <= 3),
    cnts AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_near_dups
      FROM (SELECT id_a AS doc_id FROM pairs
            UNION ALL SELECT id_b AS doc_id FROM pairs)
      GROUP BY 1)
    SELECT h.doc_id, h.phash,
      coalesce(c.n_near_dups, CAST(0 AS BIGINT)) AS n_near_dups
    FROM hs h LEFT JOIN cnts c USING (doc_id)
    ORDER BY h.doc_id"""

  /** Mirrors TextAnalysis.cdcChunks: the same 4-char polynomial
    * rolling-hash boundaries (coefficients pre-reduced mod P on both
    * engines) and global exact-content chunk census. DuckDB lists are
    * 1-based where Spark arrays are 0-based, and range() is
    * end-exclusive where sequence() is inclusive. */
  val qCdcChunks: String = {
    val B = 257L; val P = 1000003L
    val c3 = B * B * B % P; val c2 = B * B % P
    val h = s"((ascii(text[i - 3]) * $c3 + ascii(text[i - 2]) * $c2" +
      s" + ascii(text[i - 1]) * $B + ascii(text[i])) % $P)"
    s"""
    WITH b AS (
      SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars,
        CASE WHEN length(text) >= 4 THEN
          list_filter(range(4, length(text) + 1),
            i -> $h % 16 = 0 AND i < length(text))
        ELSE [] END AS bounds
      FROM documents WHERE length(text) > 0),
    se AS (
      SELECT doc_id, text, n_chars,
        list_prepend(CAST(1 AS BIGINT), list_transform(bounds, x -> x + 1)) AS starts,
        list_append(bounds, CAST(length(text) AS BIGINT)) AS ends
      FROM b),
    ch AS (
      SELECT doc_id, n_chars,
        unnest(list_transform(range(1, len(starts) + 1),
          k -> substring(text, CAST(starts[CAST(k AS INT)] AS INT),
            CAST(ends[CAST(k AS INT)] - starts[CAST(k AS INT)] + 1 AS INT)))) AS chunk
      FROM se),
    census AS (
      SELECT chunk, CAST(count(*) AS BIGINT) AS global_cnt
      FROM ch GROUP BY 1),
    per_doc AS (
      SELECT c.doc_id, max(c.n_chars) AS n_chars,
        CAST(count(*) AS BIGINT) AS n_chunks,
        CAST(sum(CASE WHEN g.global_cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
      FROM ch c JOIN census g USING (chunk)
      GROUP BY 1)
    SELECT doc_id, n_chars, n_chunks,
      round(n_chars / n_chunks::DOUBLE + 1e-9, 6) AS mean_chunk_len,
      n_dup_chunks,
      round(n_dup_chunks / n_chunks::DOUBLE + 1e-9, 6) AS dup_chunk_share
    FROM per_doc ORDER BY doc_id"""
  }

  /** Mirrors TextAnalysis.charClasses: count = len − len(strip) with
    * identical regex char-classes. */
  /** Mirrors TextAnalysis.unicodeNormalize: decomposed sequences are
    * planted the same way on both sides (e → e+U+0301, o → o+U+0308
    * via chr(), so no literal-encoding ambiguity), then DuckDB's
    * utf8proc nfc_normalize stands against the engine's
    * java.text.Normalizer — md5 of the normalized text pins the two
    * independent Unicode implementations to byte agreement. */
  val qTextNormalize: String = """
    WITH raw AS (
      SELECT doc_id,
        replace(replace(text, 'e', 'e' || chr(769)), 'o', 'o' || chr(776)) AS r
      FROM documents),
    n AS (
      SELECT doc_id, r, nfc_normalize(r) AS nfc FROM raw)
    SELECT doc_id,
      CAST(length(r) AS BIGINT) AS len_raw,
      CAST(length(nfc) AS BIGINT) AS len_nfc,
      CAST(length(r) - length(nfc) AS BIGINT) AS n_composed,
      md5(nfc) AS md5_nfc
    FROM n ORDER BY doc_id"""

  /** Mirrors TextAnalysis.featureHash: the same polyhash primitive
    * feeds bucket = h mod 64 and sign = ±1 from (h div 64) mod 2;
    * both engines fold the signed bucket vector then its norms. */
  val qFeatureHash: String = s"""
    WITH tk AS (
      SELECT doc_id, unnest($toks) AS tok FROM documents),
    tf AS (SELECT doc_id, tok FROM tk WHERE len(tok) > 0),
    hb AS (SELECT doc_id, ${ph("tok")} AS h FROM tf),
    bx AS (
      SELECT doc_id, h % 64 AS bucket,
        CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END AS sgn
      FROM hb),
    vb AS (
      SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS v,
        CAST(count(*) AS BIGINT) AS cnt
      FROM bx GROUP BY 1, 2),
    agg AS (
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        CAST(sum(CASE WHEN v != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_buckets,
        CAST(sum(abs(v)) AS BIGINT) AS l1,
        round(sqrt(CAST(sum(v * v) AS DOUBLE)) + 1e-9, 6) AS l2,
        CAST(max(abs(v)) AS BIGINT) AS max_abs
      FROM vb GROUP BY 1)
    SELECT doc_id, n_tokens, n_buckets, l1, l2, max_abs,
      round(1.0 - l1 / n_tokens::DOUBLE + 1e-9, 6) AS cancel_share
    FROM agg ORDER BY doc_id"""

  /** Mirrors TextAnalysis.htmlMetrics — the synthetic page is the
    * same closed form on both sides; tag strip via the identical
    * backslash-free pattern with DuckDB's 'g' flag matching Spark's
    * replace-all default. */
  val qHtmlMetrics: String = """
    WITH h AS (
      SELECT doc_id,
        '<html><head><title>Doc ' || doc_id || '</title>' ||
        '<script>var x = 1;</script></head>' ||
        '<body><p>' || replace(substr(text, 1, 80), ' ', '</p><p>') || '</p>' ||
        COALESCE((SELECT string_agg('<a href="/doc/' || (doc_id * 7 + j * 13) % 100 ||
            '">link ' || j || '</a>', '' ORDER BY j)
          FROM (SELECT unnest(range(0, CAST(doc_id % 4 + 1 AS INT))) AS j)), '') ||
        '</body></html>' AS html
      FROM documents),
    m AS (
      SELECT doc_id, html,
        regexp_replace(html, '<[^>]*>', '', 'g') AS stripped
      FROM h)
    SELECT doc_id,
      CAST(length(html) - length(replace(html, '<', '')) AS BIGINT) AS n_tags,
      CAST((length(html) - length(replace(html, '<a ', ''))) / 3 AS BIGINT) AS n_links,
      regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
      CAST(length(stripped) AS BIGINT) AS text_len,
      CAST(length(html) AS BIGINT) AS html_len,
      round(length(stripped) / length(html)::DOUBLE + 1e-9, 6) AS text_share
    FROM m ORDER BY doc_id"""

  val qTextCharclass: String = """
    WITH c AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
        CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS n_upper,
        CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
        CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS BIGINT) AS n_space
      FROM documents WHERE length(text) > 0),
    c2 AS (
      SELECT *, n_chars - n_alpha - n_digit - n_space AS n_other FROM c)
    SELECT doc_id, n_chars, n_alpha, n_upper, n_digit, n_space, n_other,
      round(n_alpha / n_chars::DOUBLE + 1e-9, 6) AS alpha_share,
      round(n_upper / n_chars::DOUBLE + 1e-9, 6) AS upper_share,
      round(n_digit / n_chars::DOUBLE + 1e-9, 6) AS digit_share,
      round(n_space / n_chars::DOUBLE + 1e-9, 6) AS space_share,
      round(n_other / n_chars::DOUBLE + 1e-9, 6) AS other_share
    FROM c2 ORDER BY doc_id"""

  // Mirrors Multimodal.imageResize: box-filter 4x4 downsample of the
  // synthesized PPM — source pixel p maps to cell ((p%w)*4 div w,
  // (p div w)*4 div h), cell value = integer mean of its block. Pure
  // integer arithmetic on both engines.
  val qImageResize: String = """
    WITH img AS (
      SELECT doc_id, CAST(doc_id % 13 + 4 AS INT) AS w,
        CAST(doc_id % 7 + 4 AS INT) AS h
      FROM documents WHERE doc_id % 3 = 0),
    px AS (
      SELECT doc_id, w, h, unnest(range(0, w * h)) AS p FROM img),
    cell AS (
      SELECT doc_id,
        CAST((p % w) * 4 // w AS INT) AS cell_x,
        CAST((p // w) * 4 // h AS INT) AS cell_y,
        (doc_id * 31 + (p * 3 + 0) * 7) % 256 AS r,
        (doc_id * 31 + (p * 3 + 1) * 7) % 256 AS g,
        (doc_id * 31 + (p * 3 + 2) * 7) % 256 AS b
      FROM px)
    SELECT doc_id, cell_x, cell_y,
      CAST(sum(r) // count(*) AS INT) AS r,
      CAST(sum(g) // count(*) AS INT) AS g,
      CAST(sum(b) // count(*) AS INT) AS b
    FROM cell GROUP BY 1, 2, 3
    ORDER BY doc_id, cell_y, cell_x"""

  // Mirrors Multimodal.audioDecode: the engine round-trips each audio
  // doc through a synthesized RIFF/WAVE PCM16 clip (100 Hz, n =
  // ((id·7)%300+1)·10 samples, sample i = ((id·131 + i·17) % 4001) −
  // 2000) and a real chunk-walking decode; the oracle computes the
  // identical integer statistics from the generator's closed form —
  // no byte parsing, so a bug in either the encoder or the RIFF
  // parser breaks the hash match.
  val qAudioDecode: String = """
    WITH aud AS (
      SELECT doc_id, ((doc_id * 7) % 300 + 1) * 10 AS n
      FROM documents WHERE doc_id % 3 = 1),
    sm AS (
      SELECT doc_id, n, unnest(range(0, n)) AS i FROM aud),
    v AS (
      SELECT doc_id, n, i,
        ((doc_id * 131 + i * 17) % 4001) - 2000 AS s,
        CASE WHEN i > 0 THEN ((doc_id * 131 + (i - 1) * 17) % 4001) - 2000 END AS sp
      FROM sm),
    agg AS (
      SELECT doc_id, CAST(max(n) AS BIGINT) AS n_samples,
        CAST(sum(s) AS BIGINT) AS sum_amp,
        CAST(sum(s * s) AS BIGINT) AS sum_sq,
        CAST(max(abs(s)) AS INT) AS peak_abs,
        CAST(sum(CASE WHEN sp IS NOT NULL AND ((s >= 0) != (sp >= 0))
                 THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
      FROM v GROUP BY 1)
    SELECT doc_id, CAST(100 AS INT) AS sample_rate, n_samples,
      round(n_samples / CAST(100 AS DOUBLE) + 1e-9, 6) AS duration_s,
      round(sum_amp / n_samples::DOUBLE + 1e-9, 6) AS mean_amp,
      round(sqrt(sum_sq / n_samples::DOUBLE) + 1e-9, 6) AS rms,
      peak_abs, zero_crossings,
      round(zero_crossings / (n_samples - 1)::DOUBLE + 1e-9, 6) AS zcr
    FROM agg ORDER BY doc_id"""

  /** Mirrors Multimodal.audioDecodeMulaw: the engine round-trips a
    * G.711 μ-law WAV (fmt tag 7, 18-byte fmt chunk, mandatory fact
    * chunk, odd-size pad) and expands each companded byte; the oracle
    * reproduces the CCITT expansion — complement u = 255 − b, then
    * ((u mod 16)·8 + 132)·2^((u÷16) mod 8) − 132 with sign from
    * u ≥ 128 — from the generator's closed form, so a compander-table
    * or chunk-walk bug breaks the hash match. */
  val qAudioMulaw: String = """
    WITH aud AS (
      SELECT doc_id, ((doc_id * 13) % 240 + 4) * 5 AS n
      FROM documents WHERE doc_id % 3 = 1),
    sm AS (
      SELECT doc_id, n, unnest(range(0, n)) AS i FROM aud),
    d AS (
      SELECT doc_id, n, i,
        255 - ((doc_id * 131 + i * 29) % 256) AS u,
        255 - ((doc_id * 131 + (i - 1) * 29) % 256) AS up
      FROM sm),
    v AS (
      SELECT doc_id, n, i,
        CASE WHEN u >= 128 THEN 132 - (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)))
             ELSE (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))) - 132 END AS s,
        CASE WHEN i > 0 THEN
          CASE WHEN up >= 128 THEN 132 - (((up % 16) * 8 + 132) * (1 << ((up // 16) % 8)))
               ELSE (((up % 16) * 8 + 132) * (1 << ((up // 16) % 8))) - 132 END
        END AS sp
      FROM d),
    agg AS (
      SELECT doc_id, CAST(max(n) AS BIGINT) AS n_samples,
        CAST(sum(s) AS BIGINT) AS sum_amp,
        CAST(sum(s * s) AS BIGINT) AS sum_sq,
        CAST(max(abs(s)) AS INT) AS peak_abs,
        CAST(sum(CASE WHEN sp IS NOT NULL AND ((s >= 0) != (sp >= 0))
                 THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
      FROM v GROUP BY 1)
    SELECT doc_id, CAST(8000 AS INT) AS sample_rate, n_samples,
      round(n_samples / CAST(8000 AS DOUBLE) + 1e-9, 6) AS duration_s,
      round(sum_amp / n_samples::DOUBLE + 1e-9, 6) AS mean_amp,
      round(sqrt(sum_sq / n_samples::DOUBLE) + 1e-9, 6) AS rms,
      peak_abs, zero_crossings,
      round(zero_crossings / (n_samples - 1)::DOUBLE + 1e-9, 6) AS zcr
    FROM agg ORDER BY doc_id"""

  /** Mirrors Multimodal.audioDecodeAlaw: the E.711 A-law expansion —
    * XOR 0x55, then segment-cased mantissa scaling (seg 0: 16m+8,
    * seg 1: 16m+264, seg s≥2: (16m+264)·2^(s−1)), sign from bit 7 —
    * reproduced from the generator's closed form. */
  val qAudioAlaw: String = """
    WITH aud AS (
      SELECT doc_id, ((doc_id * 17) % 240 + 4) * 5 AS n
      FROM documents WHERE doc_id % 3 = 1),
    sm AS (
      SELECT doc_id, n, unnest(range(0, n)) AS i FROM aud),
    d AS (
      SELECT doc_id, n, i,
        xor((doc_id * 151 + i * 31) % 256, 85) AS a,
        CASE WHEN i > 0 THEN xor((doc_id * 151 + (i - 1) * 31) % 256, 85) END AS ap
      FROM sm),
    v AS (
      SELECT doc_id, n, i,
        CASE WHEN a >= 128 THEN 1 ELSE -1 END *
          (CASE (a // 16) % 8 WHEN 0 THEN (a % 16) * 16 + 8
                WHEN 1 THEN (a % 16) * 16 + 264
                ELSE ((a % 16) * 16 + 264) * (1 << ((a // 16) % 8 - 1)) END) AS s,
        CASE WHEN ap IS NULL THEN NULL ELSE
          CASE WHEN ap >= 128 THEN 1 ELSE -1 END *
            (CASE (ap // 16) % 8 WHEN 0 THEN (ap % 16) * 16 + 8
                  WHEN 1 THEN (ap % 16) * 16 + 264
                  ELSE ((ap % 16) * 16 + 264) * (1 << ((ap // 16) % 8 - 1)) END) END AS sp
      FROM d),
    agg AS (
      SELECT doc_id, CAST(max(n) AS BIGINT) AS n_samples,
        CAST(sum(s) AS BIGINT) AS sum_amp,
        CAST(sum(s * s) AS BIGINT) AS sum_sq,
        CAST(max(abs(s)) AS INT) AS peak_abs,
        CAST(sum(CASE WHEN sp IS NOT NULL AND ((s >= 0) != (sp >= 0))
                 THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
      FROM v GROUP BY 1)
    SELECT doc_id, CAST(8000 AS INT) AS sample_rate, n_samples,
      round(n_samples / CAST(8000 AS DOUBLE) + 1e-9, 6) AS duration_s,
      round(sum_amp / n_samples::DOUBLE + 1e-9, 6) AS mean_amp,
      round(sqrt(sum_sq / n_samples::DOUBLE) + 1e-9, 6) AS rms,
      peak_abs, zero_crossings,
      round(zero_crossings / (n_samples - 1)::DOUBLE + 1e-9, 6) AS zcr
    FROM agg ORDER BY doc_id"""

  /** Mirrors Multimodal.audioDecodeAiff: the engine round-trips a
    * real big-endian Audio IFF stream (FORM/AIFF, odd-padded ANNO,
    * COMM with the sample rate in an 80-bit IEEE extended float,
    * SSND cross-checked against numSampleFrames); the oracle
    * reproduces the sample closed form and pins the 11025 Hz rate the
    * engine must recover from the extended-float field. */
  val qAudioAiff: String = """
    WITH aud AS (
      SELECT doc_id, ((doc_id * 19) % 280 + 3) * 7 AS n
      FROM documents WHERE doc_id % 3 = 1),
    sm AS (
      SELECT doc_id, n, unnest(range(0, n)) AS i FROM aud),
    v AS (
      SELECT doc_id, n, i,
        ((doc_id * 137 + i * 19) % 4001) - 2000 AS s,
        CASE WHEN i > 0 THEN ((doc_id * 137 + (i - 1) * 19) % 4001) - 2000 END AS sp
      FROM sm),
    agg AS (
      SELECT doc_id, CAST(max(n) AS BIGINT) AS n_samples,
        CAST(sum(s) AS BIGINT) AS sum_amp,
        CAST(sum(s * s) AS BIGINT) AS sum_sq,
        CAST(max(abs(s)) AS INT) AS peak_abs,
        CAST(sum(CASE WHEN sp IS NOT NULL AND ((s >= 0) != (sp >= 0))
                 THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
      FROM v GROUP BY 1)
    SELECT doc_id, CAST(11025 AS INT) AS sample_rate, n_samples,
      round(n_samples / CAST(11025 AS DOUBLE) + 1e-9, 6) AS duration_s,
      round(sum_amp / n_samples::DOUBLE + 1e-9, 6) AS mean_amp,
      round(sqrt(sum_sq / n_samples::DOUBLE) + 1e-9, 6) AS rms,
      peak_abs, zero_crossings,
      round(zero_crossings / (n_samples - 1)::DOUBLE + 1e-9, 6) AS zcr
    FROM agg ORDER BY doc_id"""

  private val AdpcmStepSql: String = Seq(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
    .mkString("[", ",", "]")
  private val AdpcmIdxSql: String =
    Seq(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
      .mkString("[", ",", "]")

  /** Mirrors Multimodal.audioDecodeAdpcm — the STATEFUL oracle: every
    * sample depends on the whole nibble history since its block
    * header, so no per-element expression can reproduce it. The CTE
    * replays the identical IMA state machine (step table, shift-add
    * diff, ±32768 clamp, index clamp 0-88) as a recursive fold seeded
    * per block from the header (predictor, step index), accumulating
    * sum/sumsq/peak/zero-crossings in the recursion state, then a
    * window stitches sign continuity across block boundaries. */
  val qAudioAdpcm: String = s"""
    WITH RECURSIVE blk AS (
      SELECT doc_id, b,
        ((doc_id * 61 + b * 127) % 4001) - 2000 AS p0,
        CAST((doc_id + b * 7) % 89 AS INT) AS i0
      FROM documents, (SELECT unnest(range(0, 21)) AS b)
      WHERE doc_id % 3 = 1 AND b < (doc_id * 23) % 20 + 2),
    st AS (
      SELECT doc_id, b, 0 AS i,
        CAST(p0 AS BIGINT) AS pred, i0 AS idx,
        CAST(p0 AS BIGINT) AS sum_amp,
        CAST(p0 AS BIGINT) * p0 AS sum_sq,
        CAST(abs(p0) AS INT) AS peak,
        0::BIGINT AS zc,
        CASE WHEN p0 >= 0 THEN 1 ELSE 0 END AS firstsign,
        CASE WHEN p0 >= 0 THEN 1 ELSE 0 END AS prevsign
      FROM blk
      UNION ALL
      SELECT doc_id, b, i + 1, pred2, idx2,
        sum_amp + pred2, sum_sq + pred2 * pred2,
        greatest(peak, CAST(abs(pred2) AS INT)),
        zc + CASE WHEN (CASE WHEN pred2 >= 0 THEN 1 ELSE 0 END) != prevsign
             THEN 1 ELSE 0 END,
        firstsign,
        CASE WHEN pred2 >= 0 THEN 1 ELSE 0 END
      FROM (
        SELECT *, least(32767::BIGINT, greatest(-32768::BIGINT,
            pred + CASE WHEN nb4 >= 8 THEN -diff ELSE diff END)) AS pred2,
          least(88, greatest(0, idx + ($AdpcmIdxSql)[nb4 + 1])) AS idx2
        FROM (
          SELECT *, stp // 8 + CASE WHEN nb4 % 2 = 1 THEN stp // 4 ELSE 0 END
              + CASE WHEN (nb4 // 2) % 2 = 1 THEN stp // 2 ELSE 0 END
              + CASE WHEN (nb4 // 4) % 2 = 1 THEN stp ELSE 0 END AS diff
          FROM (
            SELECT *, CAST((doc_id * 7 + (b * 16 + i) * 3) % 16 AS INT) AS nb4,
              ($AdpcmStepSql)[idx + 1]::BIGINT AS stp
            FROM st WHERE i < 16)))),
    perblock AS (
      SELECT doc_id, b, sum_amp, sum_sq, peak, zc, firstsign,
        prevsign AS lastsign
      FROM st WHERE i = 16),
    stitched AS (
      SELECT doc_id, b, sum_amp, sum_sq, peak, zc,
        CASE WHEN lag(lastsign) OVER w IS NOT NULL
                  AND firstsign != lag(lastsign) OVER w THEN 1 ELSE 0 END
          AS boundary
      FROM perblock WINDOW w AS (PARTITION BY doc_id ORDER BY b)),
    agg AS (
      SELECT doc_id,
        CAST(count(*) * 17 AS BIGINT) AS n_samples,
        CAST(sum(sum_amp) AS BIGINT) AS sum_amp,
        CAST(sum(sum_sq) AS BIGINT) AS sum_sq,
        CAST(max(peak) AS INT) AS peak_abs,
        CAST(sum(zc) + sum(boundary) AS BIGINT) AS zero_crossings
      FROM stitched GROUP BY doc_id)
    SELECT doc_id, CAST(8000 AS INT) AS sample_rate, n_samples,
      round(n_samples / CAST(8000 AS DOUBLE) + 1e-9, 6) AS duration_s,
      round(sum_amp / n_samples::DOUBLE + 1e-9, 6) AS mean_amp,
      round(sqrt(sum_sq / n_samples::DOUBLE) + 1e-9, 6) AS rms,
      peak_abs, zero_crossings,
      round(zero_crossings / (n_samples - 1)::DOUBLE + 1e-9, 6) AS zcr
    FROM agg ORDER BY doc_id"""

  // Mirrors Multimodal.videoDecode: the engine round-trips each video
  // doc through a synthesized YUV4MPEG2 C444 clip (W = id%6+2, H =
  // id%4+2, id%5+2 frames at F25:1; plane byte p of frame f =
  // (id·29 + f·101 + p·13) % 256) and a real header+FRAME demux; the
  // oracle computes the identical Y-plane statistics (p < W·H) from
  // the generator's closed form.
  val qVideoDecode: String = """
    WITH vid AS (
      SELECT doc_id, CAST(doc_id % 6 + 2 AS INT) AS w,
        CAST(doc_id % 4 + 2 AS INT) AS h, CAST(doc_id % 5 + 2 AS INT) AS nf
      FROM documents WHERE doc_id % 3 = 2),
    fp AS (
      SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS f FROM vid),
    px AS (
      SELECT doc_id, w, h, nf, f, unnest(range(0, w * h)) AS p FROM fp),
    v AS (
      SELECT doc_id, w, h, nf, f, p,
        (doc_id * 29 + f * 101 + p * 13) % 256 AS y,
        CASE WHEN f > 0 THEN (doc_id * 29 + (f - 1) * 101 + p * 13) % 256 END AS yp
      FROM px),
    agg AS (
      SELECT doc_id, w AS width, h AS height, CAST(nf AS BIGINT) AS n_frames,
        CAST(sum(y) AS BIGINT) AS sum_y,
        CAST(sum(CASE WHEN yp IS NOT NULL THEN abs(y - yp) ELSE 0 END) AS BIGINT) AS sum_mad
      FROM v GROUP BY 1, 2, 3, 4)
    SELECT doc_id, width, height, n_frames, CAST(25.0 AS DOUBLE) AS fps,
      round(sum_y / (n_frames * width * height)::DOUBLE + 1e-9, 6) AS mean_y,
      round(sum_mad / ((n_frames - 1) * width * height)::DOUBLE + 1e-9, 6) AS frame_mad
    FROM agg ORDER BY doc_id"""

  // int8 scalar quantization error report: per-dim corpus bounds, then
  // per-vector left-fold (list ORDER BY i) of squared reconstruction
  // errors — same index order as Spark's aggregate() fold
  val qEmbedQuantize: String = """
    WITH el AS (
      SELECT vec_id::BIGINT AS vec_id, embedding,
        unnest(range(1, len(embedding) + 1)) AS i
      FROM embeddings),
    dim AS (
      SELECT i, min(embedding[i]::DOUBLE) AS lo, max(embedding[i]::DOUBLE) AS hi
      FROM el GROUP BY i),
    errs AS (
      SELECT e.vec_id, e.i,
        CASE WHEN d.hi = d.lo THEN CAST(0.0 AS DOUBLE)
             ELSE e.embedding[e.i]::DOUBLE - (d.lo +
               round((e.embedding[e.i]::DOUBLE - d.lo)
                     / ((d.hi - d.lo) / CAST(255.0 AS DOUBLE)) + 1e-9, 0)
               * ((d.hi - d.lo) / CAST(255.0 AS DOUBLE)))
        END AS err
      FROM el e JOIN dim d USING (i)),
    folded AS (
      SELECT vec_id, len(list(err ORDER BY i)) AS n_dims,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(list(err ORDER BY i), x -> x * x)), (a, b) -> a + b) AS sse,
        list_max(list_transform(list(err ORDER BY i), x -> abs(x))) AS mx
      FROM errs GROUP BY vec_id)
    SELECT vec_id, n_dims::BIGINT AS n_dims,
      round(sqrt(sse / n_dims) + 1e-9, 6) AS rmse,
      round(mx + 1e-9, 6) AS max_abs_err
    FROM folded ORDER BY vec_id"""

  /** Bloom ingest screen — mirrors graft.dedup.Bloom bit-for-bit:
    * band-key hash, 3 probe positions, 65536-bit sketch built from the
    * even-id corpus half, probed by the odd-id half. */
  val qDedupBloom: String = s"""
    WITH $shCte, $sigCte,
    bk AS (SELECT doc_id, band,
        (band * 1315423911 + k1 * 31 + k2) % $P AS kh FROM band_k),
    poss AS (SELECT unnest([((kh * 3 + 17) % $P) % 65536,
                           ((kh * 1299709 + 101) % $P) % 65536,
                           ((kh * 15485863 + 1009) % $P) % 65536]) AS p
      FROM bk WHERE doc_id % 2 = 0),
    words AS (SELECT p // 64 AS word,
        bit_or(CASE WHEN p % 64 = 63 THEN (-9223372036854775807 - 1)::BIGINT
               ELSE 1::BIGINT << ((p % 64)::INT) END) AS bits
      FROM poss GROUP BY 1),
    ppos AS (SELECT doc_id, band, unnest([((kh * 3 + 17) % $P) % 65536,
                           ((kh * 1299709 + 101) % $P) % 65536,
                           ((kh * 15485863 + 1009) % $P) % 65536]) AS p
      FROM bk WHERE doc_id % 2 = 1),
    chk AS (SELECT pp.doc_id, pp.band,
        count(*) FILTER (WHERE ((w.bits >> ((pp.p % 64)::INT)) & 1) = 1) AS nbits
      FROM ppos pp LEFT JOIN words w ON pp.p // 64 = w.word
      GROUP BY 1, 2),
    perdoc AS (SELECT doc_id,
        count(*) FILTER (WHERE nbits = 3) AS n_hit_bands
      FROM chk GROUP BY 1)
    SELECT d.doc_id,
      coalesce(perdoc.n_hit_bands, 0)::INT AS n_hit_bands,
      coalesce(perdoc.n_hit_bands, 0) > 0 AS maybe_dup
    FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
      LEFT JOIN perdoc USING (doc_id)
    ORDER BY d.doc_id"""

  /** DSIR importance weights: hashed unigram+bigram buckets, add-1
    * smoothed target(en)/raw log ratio — mirrors Corpus.dsirWeights. */
  val qDsirWeights: String = s"""
    WITH sw AS (SELECT doc_id, lang, $toks AS w FROM documents),
    feats AS (
      SELECT doc_id, lang, unnest(list_concat(w,
        CASE WHEN len(w) >= 2
          THEN [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
          ELSE [] END)) AS f
      FROM sw),
    fb AS (SELECT doc_id, lang, ${ph("f")} % 256 AS bucket FROM feats),
    dc AS (SELECT doc_id, lang, bucket, count(*) AS c FROM fb GROUP BY 1, 2, 3),
    bs AS (SELECT bucket, sum(c)::BIGINT AS cr,
        sum(CASE WHEN lang = 'en' THEN c ELSE 0 END)::BIGINT AS ct
      FROM dc GROUP BY 1),
    tot AS (SELECT sum(cr)::BIGINT AS nr, sum(ct)::BIGINT AS nt FROM bs)
    SELECT dc.doc_id, sum(dc.c)::BIGINT AS n_feats,
      round(sum(dc.c * (ln((bs.ct + 1)::DOUBLE / (t.nt + 256)::DOUBLE)
                      - ln((bs.cr + 1)::DOUBLE / (t.nr + 256)::DOUBLE)))
            / sum(dc.c) + 1e-9, 6) AS dsir_logweight
    FROM dc JOIN bs USING (bucket), tot t
    GROUP BY 1 ORDER BY 1"""

  /** Deterministic corpus shuffle: the oracle states the SPEC as one
    * global window — the engine's range-partition + prefix-sum route
    * must reproduce it exactly. */
  val qCorpusShuffle: String = s"""
    WITH keyed AS (SELECT doc_id,
        ((doc_id % $P) * 2654435761) % $P AS skey FROM documents),
    o AS (SELECT doc_id, skey,
        row_number() OVER (ORDER BY skey, doc_id) AS ord FROM keyed)
    SELECT doc_id, skey, ord, (ord - 1) % 8 AS shard
    FROM o ORDER BY doc_id"""

  /** Interpolated bigram LM score — mirrors TextAnalysis.bigramLogprob. */
  val qTextLogprob2: String = s"""
    WITH sw AS (SELECT doc_id, $toks AS w FROM documents),
    tok AS (SELECT doc_id, unnest(w) AS tok FROM sw),
    uni AS (SELECT tok, count(*)::BIGINT AS cu FROM tok GROUP BY 1),
    tot AS (SELECT sum(cu)::BIGINT AS n_corpus FROM uni),
    bg AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2
        THEN [{'w1': w[i], 'w2': w[i+1]} for i in range(1, len(w))]
        ELSE [] END) AS b FROM sw),
    bgd AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2, count(*)::BIGINT AS c
      FROM bg GROUP BY 1, 2, 3),
    cbc AS (SELECT w1, w2, sum(c)::BIGINT AS cb FROM bgd GROUP BY 1, 2)
    SELECT bgd.doc_id, sum(bgd.c)::BIGINT AS n_bigrams,
      round(sum(bgd.c * -ln((0.75)::DOUBLE * (cbc.cb::DOUBLE / u1.cu)
                          + (0.25)::DOUBLE * (u2.cu::DOUBLE / t.n_corpus)))
            / sum(bgd.c) + 1e-9, 6) AS mean_neglogprob2
    FROM bgd JOIN cbc USING (w1, w2)
      JOIN uni u1 ON bgd.w1 = u1.tok
      JOIN uni u2 ON bgd.w2 = u2.tok, tot t
    GROUP BY 1 ORDER BY 1"""

  /** Zipf vocabulary sweep: top-30 tokens with cumulative coverage. */
  val qVocabCoverage: String = s"""
    WITH tk AS (SELECT unnest($toks) AS tok FROM documents),
    cnt AS (SELECT tok, count(*) AS n FROM tk GROUP BY 1),
    tot AS (SELECT sum(n)::DOUBLE AS n_corpus FROM cnt),
    top AS (SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok) AS rank
            FROM cnt ORDER BY n DESC, tok LIMIT 30)
    SELECT rank, tok, n::BIGINT AS n,
      round(n / t.n_corpus + 1e-9, 6) AS share,
      round(sum(n) OVER (ORDER BY rank) / t.n_corpus + 1e-9, 6) AS cum_share
    FROM top, tot t ORDER BY rank"""

  /** Mirrors TextAnalysis.sourceJsd: (source, token) counts, top-200
    * vocab, Laplace-smoothed per-source distributions, pairwise JSD. */
  val qSourceJsd: String = s"""
    WITH counts AS (
      SELECT source, unnest($toks) AS tok FROM documents),
    c AS (SELECT source, tok, count(*) AS c FROM counts GROUP BY 1, 2),
    vocab AS (
      SELECT tok FROM (SELECT tok, sum(c) AS n FROM c GROUP BY 1)
      ORDER BY n DESC, tok LIMIT 200),
    srcs AS (SELECT DISTINCT source FROM documents),
    grid AS (
      SELECT s.source, v.tok, coalesce(c.c, 0) AS c
      FROM srcs s CROSS JOIN vocab v
      LEFT JOIN c ON c.source = s.source AND c.tok = v.tok),
    norm AS (
      SELECT source, sum(c) AS n_src, count(*) AS k_eff
      FROM grid GROUP BY 1),
    p AS (
      SELECT g.source, g.tok,
        (g.c + 1.0) / (n.n_src + n.k_eff) AS p
      FROM grid g JOIN norm n USING (source))
    SELECT a.source AS source_a, b.source AS source_b,
      round((sum(a.p * ln(a.p / ((a.p + b.p) / 2)))
           + sum(b.p * ln(b.p / ((a.p + b.p) / 2)))) / 2 + 1e-9, 6) AS jsd
    FROM p a JOIN p b ON a.tok = b.tok AND a.source < b.source
    GROUP BY 1, 2 ORDER BY source_a, source_b"""

  /** Cross-source near-dup contamination matrix over the exact-Jaccard
    * pair set (same body as q_dedup_jaccard). */
  val qDedupCrossSource: String = s"""
    WITH $shCte,
    jp AS ($jpairsBody),
    src AS (SELECT doc_id, source FROM documents),
    att AS (
      SELECT least(a.source, b.source) AS source_a,
             greatest(a.source, b.source) AS source_b, jp.jaccard
      FROM jp JOIN src a ON jp.id_a = a.doc_id
              JOIN src b ON jp.id_b = b.doc_id)
    SELECT source_a, source_b, count(*) AS n_pairs,
      round(avg(jaccard) + 1e-9, 6) AS mean_jaccard
    FROM att GROUP BY 1, 2 ORDER BY 1, 2"""

  /** JSONL round-trip: the oracle checksums the synthesized hostile
    * payload DIRECTLY from parquet; the Spark side must reproduce the
    * same checksums after an actual JSONL write+read (Sources
    * .jsonlRoundtrip) — any escaping loss breaks the match. */
  /** Mirrors Sources.jsonlGzRoundtrip — the gzip wire-format ingest;
    * payload salt (48-char slice, 3× char count) differs from
    * [[qIngestJsonl]] so the two ingest queries cannot share results. */
  val qIngestGzip: String = s"""
    WITH p AS (
      SELECT *, '"' || substr(text, 1, 48) || chr(92) || chr(10) || lang ||
        chr(9) || 'äπ中' || (n_chars * 3)::VARCHAR AS payload
      FROM documents)
    SELECT source, count(*) AS n_docs, sum(doc_id)::BIGINT AS sum_ids,
      sum(n_chars)::BIGINT AS sum_chars,
      sum(${ph("text")})::BIGINT AS text_sum,
      sum(${ph("payload")})::BIGINT AS payload_sum
    FROM p GROUP BY 1 ORDER BY source"""

  /** Mirrors Robots.robotsFilter: the oracle constructs the wildcard
    * group's expected rules closed-form (Disallow /doc/<d>, Allow
    * /doc/<d><d2>) — if the engine's parser selects the googlebot or
    * badbot group instead, every verdict flips and the hash breaks.
    * Longest-match via max_by over matching rule lengths. */
  val qRobotsFilter: String = """
    WITH d AS (
      SELECT doc_id, source, '/doc/' || doc_id AS path,
        CAST(substr(source, 4) AS INT) AS n
      FROM documents),
    rules AS (SELECT DISTINCT source, n FROM d),
    rx AS (
      SELECT source, rule, typ FROM rules, LATERAL (
        SELECT * FROM (VALUES
          ('/doc/' || (n % 10), 'disallow'),
          ('/doc/' || (n % 10) || ((n + 3) % 10), 'allow')) AS t(rule, typ))),
    m AS (
      SELECT d.doc_id, d.path, r.rule, r.typ,
        CASE WHEN starts_with(d.path, r.rule) THEN length(r.rule) END AS mlen
      FROM d JOIN rx r USING (source)),
    best AS (
      SELECT doc_id, path,
        max_by(rule, mlen) AS best_rule,
        max_by(typ, mlen) AS best_typ
      FROM m GROUP BY 1, 2)
    SELECT doc_id, path, best_rule,
      CAST(CASE WHEN best_typ IS NULL OR best_typ = 'allow' THEN 1 ELSE 0 END
        AS INT) AS allowed
    FROM best ORDER BY doc_id"""

  /** Mirrors Pdf.pdfIngest — the extracted lines are closed-form over
    * the documents table (the `doc (N)` line forces the PDF string
    * escape round-trip); structure counts and MediaBox are the
    * synthesized constants the xref-driven parse must recover. */
  val qIngestPdf: String = s"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS sw FROM documents),
    t AS (
      SELECT doc_id,
        'doc (' || doc_id || ')' || chr(10) ||
        array_to_string(sw[2:5], ' ') || chr(10) ||
        array_to_string(sw[6:9], ' ') AS txt
      FROM d)
    SELECT doc_id, CAST(6 AS INT) AS n_objects, CAST(1 AS INT) AS n_pages,
      CAST(612 AS INT) AS media_w, CAST(792 AS INT) AS media_h,
      CAST(3 AS INT) AS n_lines,
      CAST(${ph("txt")} AS BIGINT) AS text_hash
    FROM t ORDER BY doc_id"""

  /** Mirrors Sitemap.sitemapIngest — loc/lastmod closed-form; the
    * oracle states the UNESCAPED loc, so the engine's XML entity
    * round-trip (& → &amp; → &) is load-bearing on every row. */
  val qIngestSitemap: String = """
    SELECT doc_id, source,
      'http://' || source || '.example.com/doc/' || doc_id ||
        '?a=1&b=' || (doc_id % 5) AS loc,
      '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS lastmod,
      CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_urls
    FROM documents ORDER BY doc_id"""

  /** Mirrors Tar.tarIngest — entry contents are closed-form (120-char
    * text slice, key=value meta, arithmetic binary entry); the
    * engine must recover them through the checksum-verified 512-byte
    * header walk. */
  val qIngestTar: String = s"""
    WITH d AS (
      SELECT doc_id, substr(text, 1, 120) AS txt, lang,
        CAST(doc_id % 60 + 5 AS INT) AS nbin
      FROM documents),
    b AS (
      SELECT doc_id, txt, nbin,
        length(txt) + length('lang=' || lang || chr(10) || 'id=' || doc_id || chr(10))
          + nbin AS total_size,
        (SELECT CAST(sum((doc_id * 29 + i * 31) % 256) AS BIGINT)
         FROM (SELECT unnest(range(0, nbin)) AS i)) AS bin_sum
      FROM d)
    SELECT doc_id, CAST(3 AS INT) AS n_entries,
      CAST(total_size AS BIGINT) AS total_size,
      CAST(${ph("txt")} AS BIGINT) AS text_hash,
      bin_sum
    FROM b ORDER BY doc_id"""

  /** Mirrors Zip.zipIngest — entry contents are closed-form over the
    * documents table (100-char text slice, JSON meta, arithmetic
    * binary entry); compressed sizes are deliberately absent from
    * the contract (deflate-implementation-dependent). */
  val qIngestZip: String = s"""
    WITH d AS (
      SELECT doc_id, substr(text, 1, 100) AS txt, lang,
        CAST(doc_id % 50 + 10 AS INT) AS nbin
      FROM documents),
    b AS (
      SELECT doc_id, txt, nbin,
        length(txt) + length('{"id":' || doc_id || ',"lang":"' || lang || '"}')
          + nbin AS total_usize,
        (SELECT CAST(sum((doc_id * 19 + i * 23) % 256) AS BIGINT)
         FROM (SELECT unnest(range(0, nbin)) AS i)) AS bin_sum
      FROM d)
    SELECT doc_id, CAST(3 AS INT) AS n_entries,
      CAST(total_usize AS BIGINT) AS total_usize,
      CAST(${ph("txt")} AS BIGINT) AS text_hash,
      bin_sum
    FROM b ORDER BY doc_id"""

  /** Mirrors Warc.warcIngest — the oracle reconstructs the HTTP body
    * closed-form from the documents table (including the embedded
    * CRLFCRLF that defeats delimiter-based framing) and polyhashes
    * it; record count and status follow the id arithmetic. */
  val qIngestWarc: String = s"""
    WITH b AS (
      SELECT doc_id, source,
        '<html>' || chr(13) || chr(10) || chr(13) || chr(10) ||
        '<title>doc ' || doc_id || '</title>' || substr(text, 1, 60) ||
        '</html>' AS body
      FROM documents)
    SELECT doc_id,
      CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END AS INT) AS n_records,
      CAST(CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS INT) AS status,
      source || '.example.com' AS host,
      CAST(length(body) AS BIGINT) AS body_len,
      CAST(${ph("body")} AS BIGINT) AS body_hash
    FROM b ORDER BY doc_id"""

  val qIngestJsonl: String = s"""
    WITH p AS (
      SELECT *, '"' || substr(text, 1, 40) || chr(92) || chr(10) || lang ||
        chr(9) || 'äπ中' || n_chars::VARCHAR AS payload
      FROM documents)
    SELECT source, count(*) AS n_docs, sum(doc_id)::BIGINT AS sum_ids,
      sum(n_chars)::BIGINT AS sum_chars,
      sum(${ph("text")})::BIGINT AS text_sum,
      sum(${ph("payload")})::BIGINT AS payload_sum
    FROM p GROUP BY 1 ORDER BY source"""

  /** Mirrors TextAnalysis.tokenBurstiness: top-50 tokens, zero-
    * inclusive Fano factor from sum/sumsq/df + the doc total. */
  val qTokenBurstiness: String = s"""
    WITH tf AS (
      SELECT t.tok, doc_id, CAST(count(*) AS BIGINT) AS c
      FROM documents, unnest($toks) AS t(tok)
      GROUP BY 1, 2),
    by_tok AS (
      SELECT tok, CAST(sum(c) AS BIGINT) AS s,
        CAST(sum(c * c) AS BIGINT) AS ssq,
        CAST(count(*) AS BIGINT) AS df
      FROM tf GROUP BY 1),
    total AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY s DESC, tok) AS rnk
      FROM by_tok),
    m AS (
      SELECT tok, rnk, s, df,
        s / CAST(t.n_docs AS DOUBLE) AS mean_c,
        ssq / CAST(t.n_docs AS DOUBLE)
          - (s / CAST(t.n_docs AS DOUBLE)) * (s / CAST(t.n_docs AS DOUBLE))
          AS var_c
      FROM ranked, total t WHERE rnk <= 50)
    SELECT tok, rnk, s, df,
      round(mean_c + 1e-9, 6) AS mean_c,
      round(var_c / mean_c + 1e-9, 6) AS fano
    FROM m ORDER BY rnk"""

  /** Mirrors TextAnalysis.rboTokens: top-20 token rankings per
    * corpus half, depth-expanded rank-biased overlap (p = 0.9). */
  val qRbo: String = s"""
    WITH counts AS (
      SELECT doc_id % 2 = 0 AS even, t.tok, CAST(count(*) AS BIGINT) AS n
      FROM documents, unnest($toks) AS t(tok)
      GROUP BY 1, 2),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY even
        ORDER BY n DESC, tok) AS rnk
      FROM counts),
    top AS (SELECT * FROM ranked WHERE rnk <= 20),
    j AS (
      SELECT a.tok, greatest(a.rnk, b.rnk) AS d0
      FROM (SELECT tok, rnk FROM top WHERE even) a
      JOIN (SELECT tok, rnk FROM top WHERE NOT even) b USING (tok)),
    depths AS (
      SELECT d, CAST(count(*) AS BIGINT) AS overlap
      FROM j, unnest(range(j.d0, 21)) AS t(d)
      GROUP BY 1),
    terms AS (
      SELECT d, pow(0.9, d - 1) * overlap / d AS term FROM depths)
    SELECT 20 AS k, CAST(count(*) AS BIGINT) AS n_depths,
      round(0.09999999999999998 * sum(term) + 1e-9, 6) AS rbo
    FROM terms"""

  /** Mirrors TextAnalysis.readability: identical regex counts. */
  val qReadability: String = s"""
    WITH c AS (
      SELECT doc_id,
        CAST(len($toks) AS BIGINT) AS n_words,
        greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
          AS BIGINT)) AS n_sent,
        CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
          AS BIGINT) AS n_syl
      FROM documents),
    r AS (
      SELECT *, round(n_words / CAST(n_sent AS DOUBLE) + 1e-9, 6) AS wps,
        round(n_syl / CAST(n_words AS DOUBLE) + 1e-9, 6) AS spw
      FROM c WHERE n_words > 0)
    SELECT doc_id, n_words, n_sent, n_syl, wps, spw,
      round(206.835 - 1.015 * wps - 84.6 * spw + 1e-9, 4) AS flesch
    FROM r ORDER BY doc_id"""

  /** Mirrors Sources.bucketedRoundtrip: the engine routes events
    * through a bucketed+sorted catalog table and an exchange-free
    * keyed join; the oracle computes the identical integer-exact
    * checksums straight off parquet (value cents via trunc — Spark's
    * double→long cast truncates toward zero where a plain DuckDB CAST
    * would round). */
  val qIngestBucketed: String = """
    WITH a AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        CAST(sum(event_id) AS BIGINT) AS sum_ids,
        CAST(sum(CAST(trunc(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      FROM events GROUP BY 1),
    b AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_even_events
      FROM events WHERE event_id % 2 = 0 GROUP BY 1)
    SELECT user_id, n_events, sum_ids, value_cents, n_even_events
    FROM a JOIN b USING (user_id)
    ORDER BY user_id"""

  /** CSV round-trip: same checksum-from-parquet trick as
    * [[qIngestJsonl]] — the payload adds a comma to the gauntlet. */
  val qIngestCsv: String = s"""
    WITH p AS (
      SELECT *, '"' || substr(text, 1, 40) || ',' || chr(92) || chr(10) ||
        lang || chr(9) || 'äπ中' || n_chars::VARCHAR AS payload
      FROM documents)
    SELECT source, count(*) AS n_docs, sum(doc_id)::BIGINT AS sum_ids,
      sum(n_chars)::BIGINT AS sum_chars,
      sum(${ph("text")})::BIGINT AS text_sum,
      sum(${ph("payload")})::BIGINT AS payload_sum
    FROM p GROUP BY 1 ORDER BY source"""

  /** Mirrors Sources.orcRoundtrip: the CSV payload checksums plus the
    * typed-array element sum, computed straight off parquet. */
  val qIngestOrc: String = s"""
    WITH p AS (
      SELECT *, '"' || substr(text, 1, 40) || ',' || chr(92) || chr(10) ||
        lang || chr(9) || 'äπ中' || n_chars::VARCHAR AS payload
      FROM documents)
    SELECT source, count(*) AS n_docs, sum(doc_id)::BIGINT AS sum_ids,
      sum(${ph("text")})::BIGINT AS text_sum,
      sum(${ph("payload")})::BIGINT AS payload_sum,
      sum(${ph("text")} + n_chars::BIGINT + doc_id::BIGINT)::BIGINT AS arr_sum
    FROM p GROUP BY 1 ORDER BY source"""

  /** Index-order left-fold dot product (mirrors graft_dot). */
  private def vdot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($a) + 1), " +
      s"i -> $a[i] * $b[i])), (x, y) -> x + y)"

  private val PcaIters = 2

  /** Shared power-iteration CTE chain (mirrors Pca.centeredAndDirection
    * CTE-for-frame): quantized mean, content-free `1/√d` start,
    * per-round quantized direction re-estimate, norms as index-order
    * folds over already-quantized vectors. Ends at `v$PcaIters`. */
  private val pcaCtes: String = {
    def roundCte(i: Int): String = s"""
    p$i AS (SELECT c.vec_id, c.c, ${vdot("c.c", "v.v")} AS p FROM c CROSS JOIN v${i - 1} v),
    wt$i AS (
      SELECT i, round(sum(c[i] * p) + 1e-9, 6) AS w FROM (
        SELECT c, p, unnest(range(1, len(c) + 1)) AS i FROM p$i)
      GROUP BY 1),
    wv$i AS (SELECT list(w ORDER BY i) AS w FROM wt$i),
    v$i AS (SELECT list_transform(w, x -> round(x / sqrt(${vdot("w", "w")}) + 1e-9, 6)) AS v
            FROM wv$i)"""
    s"""e AS (
      SELECT vec_id::BIGINT AS vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
      FROM embeddings),
    mt AS (
      SELECT i, round(avg(emb[i]) + 1e-9, 6) AS m FROM (
        SELECT emb, unnest(range(1, len(emb) + 1)) AS i FROM e)
      GROUP BY 1),
    mv AS (SELECT list(m ORDER BY i) AS mvec FROM mt),
    c AS (
      SELECT vec_id, list_transform(range(1, len(emb) + 1), i -> emb[i] - mvec[i]) AS c
      FROM e CROSS JOIN mv),
    v0 AS (SELECT list_transform(mvec, x -> 1.0::DOUBLE / sqrt(len(mvec)::DOUBLE)) AS v
           FROM mv),
    ${(1 to PcaIters).map(roundCte).mkString(",")}"""
  }

  val qEmbedPca: String = s"""
    WITH $pcaCtes
    SELECT c.vec_id, round(${vdot("c.c", "v.v")} + 1e-9, 6) AS proj
    FROM c CROSS JOIN v$PcaIters v ORDER BY c.vec_id"""

  /** Mirrors Pca.whitenReport: residual from the ROUNDED projection,
    * removed energy share from the ROUNDED norms. */
  val qEmbedWhiten: String = s"""
    WITH $pcaCtes,
    base AS (
      SELECT c.vec_id, c.c, v.v, round(${vdot("c.c", "v.v")} + 1e-9, 6) AS proj
      FROM c CROSS JOIN v$PcaIters v),
    rr AS (
      SELECT vec_id, proj, c,
        list_transform(range(1, len(c) + 1), i -> c[i] - proj * v[i]) AS r
      FROM base),
    nr AS (
      SELECT vec_id, proj,
        round(sqrt(${vdot("c", "c")}) + 1e-9, 6) AS c_norm,
        round(sqrt(${vdot("r", "r")}) + 1e-9, 6) AS resid_norm
      FROM rr)
    SELECT vec_id, proj, c_norm, resid_norm,
      CASE WHEN c_norm > 0
           THEN round(1.0 - (resid_norm * resid_norm) / (c_norm * c_norm) + 1e-9, 6)
           ELSE 0.0 END AS removed_share
    FROM nr ORDER BY vec_id"""

  val qDedupClusterSizes: String = s"""
    WITH RECURSIVE $shCte,
    jpairs AS (SELECT id_a, id_b FROM ($jpairsBody)),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM jpairs
      UNION ALL SELECT id_b, id_a FROM jpairs),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.id = e.dst),
    comp AS (SELECT id AS doc_id, min(lbl) AS comp FROM reach GROUP BY 1),
    sizes AS (SELECT comp, count(*) AS comp_size FROM comp GROUP BY 1),
    bysize AS (
      SELECT comp_size, count(*) AS n_clusters,
        CAST(sum(comp_size) AS BIGINT) AS n_docs
      FROM sizes GROUP BY 1)
    SELECT comp_size, n_clusters, n_docs, n_docs - n_clusters AS dup_docs
    FROM bysize ORDER BY comp_size"""

  val qLangidConfusion: String = {
    val scores = Profiles.map { case (l, ws) =>
      s"len(list_filter($toks, t -> list_contains(${profList(ws)}, t))) AS score_$l"
    }.mkString(",\n        ")
    val maxS = Profiles.map(p => s"score_${p._1}").mkString("greatest(", ", ", ")")
    val pred = Profiles.map { case (l, _) =>
      s"WHEN score_$l >= $maxS AND score_$l > 0 THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    s"""
    WITH scored AS (
      SELECT doc_id, lang,
        $scores
      FROM documents),
    labeled AS (SELECT lang, $pred AS predicted FROM scored),
    cells AS (
      SELECT lang, predicted, count(*) AS n
      FROM labeled GROUP BY 1, 2)
    SELECT lang, predicted, n,
      round(n / (sum(n) OVER (PARTITION BY lang))::DOUBLE + 1e-9, 6)
        AS recall_share
    FROM cells ORDER BY lang, predicted"""
  }

  /** Mirrors TextAnalysis.cohensKappa: marginal-product p_e over
    * classes present on both sides of the confusion matrix. */
  val qCohensKappa: String = {
    val scores = Profiles.map { case (l, ws) =>
      s"len(list_filter($toks, t -> list_contains(${profList(ws)}, t))) AS score_$l"
    }.mkString(",\n        ")
    val maxS = Profiles.map(p => s"score_${p._1}").mkString("greatest(", ", ", ")")
    val pred = Profiles.map { case (l, _) =>
      s"WHEN score_$l >= $maxS AND score_$l > 0 THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    s"""
    WITH scored AS (
      SELECT doc_id, lang,
        $scores
      FROM documents),
    labeled AS (SELECT lang, $pred AS predicted FROM scored),
    cells AS (
      SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
      FROM labeled GROUP BY 1, 2),
    agree AS (
      SELECT CAST(sum(n) AS BIGINT) AS total,
        CAST(sum(CASE WHEN lang = predicted THEN n ELSE 0 END) AS BIGINT)
          AS n_agree
      FROM cells),
    rows_m AS (
      SELECT lang AS cls, CAST(sum(n) AS BIGINT) AS row_t
      FROM cells GROUP BY 1),
    cols_m AS (
      SELECT predicted AS cls, CAST(sum(n) AS BIGINT) AS col_t
      FROM cells GROUP BY 1),
    pe AS (
      SELECT a.total, a.n_agree,
        sum(r.row_t * c.col_t
          / CAST(a.total * a.total AS DOUBLE)) AS pe_raw
      FROM rows_m r JOIN cols_m c USING (cls), agree a
      GROUP BY 1, 2),
    k AS (
      SELECT total, n_agree,
        round(n_agree / CAST(total AS DOUBLE) + 1e-9, 6) AS p_o,
        round(pe_raw + 1e-9, 6) AS p_e
      FROM pe)
    SELECT total AS n_docs, n_agree, p_o, p_e,
      round((p_o - p_e) / (1.0 - p_e) + 1e-9, 6) AS kappa
    FROM k"""
  }

  val qMinhashCalibration: String = s"""
    WITH $shCte, $sigCte,
    sorted AS (SELECT doc_id, list_sort(hashes) AS sh FROM hash_t),
    scored AS (
      SELECT p.id_a, p.id_b, p.n_bands,
        round(len(list_filter(range(1, $NumHashes + 1),
            i -> sa.sig[i] = sb.sig[i])) / CAST($NumHashes AS DOUBLE) + 1e-9, 6)
          AS est,
        round(len(list_intersect(ha.sh, hb.sh)) /
            CAST(len(ha.sh) + len(hb.sh) - len(list_intersect(ha.sh, hb.sh)) AS DOUBLE)
          + 1e-9, 6) AS exact
      FROM cand_pairs p
      JOIN sig_t sa ON sa.doc_id = p.id_a
      JOIN sig_t sb ON sb.doc_id = p.id_b
      JOIN sorted ha ON ha.doc_id = p.id_a
      JOIN sorted hb ON hb.doc_id = p.id_b)
    SELECT id_a, id_b, n_bands, est, exact,
      round(abs(est - exact) + 1e-9, 6) AS abs_err
    FROM scored ORDER BY id_a, id_b"""

  val qBpePairs: String = s"""
    WITH tk AS (SELECT unnest($toks) AS tok FROM documents),
    pairs AS (
      SELECT unnest(CASE WHEN length(tok) >= 2
        THEN list_transform(range(1, length(tok)), i -> tok[i:i+1])
        ELSE [] END) AS pair
      FROM tk),
    counts AS (SELECT pair, count(*) AS n FROM pairs GROUP BY 1),
    ranked AS (
      SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair) AS rank
      FROM counts)
    SELECT rank, pair, n FROM ranked WHERE rank <= 20 ORDER BY rank"""

  /** Mirrors TextAnalysis.oovRate. */
  val qOovRate: String = s"""
    WITH tk AS (SELECT doc_id, unnest($toks) AS tok FROM documents),
    cnt AS (SELECT tok, count(*) AS n FROM tk GROUP BY 1),
    top AS (SELECT tok FROM cnt ORDER BY n DESC, tok LIMIT 30)
    SELECT tk.doc_id, count(*) AS n_tokens,
      CAST(sum(CASE WHEN top.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      round(sum(CASE WHEN top.tok IS NULL THEN 1 ELSE 0 END)
        / count(*)::DOUBLE + 1e-9, 6) AS oov_share
    FROM tk LEFT JOIN top ON tk.tok = top.tok
    GROUP BY tk.doc_id ORDER BY doc_id"""

  /** Mirrors Corpus.sampleWeighted (priority sampling, w/u keys). */
  val qSampleWeighted: String = s"""
    WITH p AS (
      SELECT doc_id, n_chars,
        round(n_chars::DOUBLE /
          (((${ph("('wsample:' || doc_id::VARCHAR)")} % 1000000) + 0.5) / 1000000.0)
          + 1e-9, 6) AS priority
      FROM documents),
    r AS (
      SELECT doc_id, n_chars, priority,
        row_number() OVER (ORDER BY priority DESC, doc_id) AS rank
      FROM p)
    SELECT rank, doc_id, n_chars AS weight, priority
    FROM r WHERE rank <= 100 ORDER BY rank"""

  /** Mirrors TextAnalysis.classifierRoc: the classifier body as a
    * subquery, a 19-row threshold frame, integer confusion counts off
    * the quantized scores. */
  /** Mirrors TextAnalysis.calibration: fixed-width score bins off the
    * shared classifier CTE, reliability columns. */
  val qCalibration: String = s"""
    WITH scored AS (SELECT y, score FROM ($qQualityClassifier)),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM scored),
    b AS (
      SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin, y, score
      FROM scored),
    agg AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
        round(avg(score) + 1e-9, 6) AS mean_score,
        round(avg(y) + 1e-9, 6) AS pos_rate
      FROM b GROUP BY 1)
    SELECT bin, n, round(n / t.n_total::DOUBLE + 1e-9, 6) AS share,
      mean_score, pos_rate,
      round(abs(mean_score - pos_rate) + 1e-9, 6) AS gap
    FROM agg, tot t ORDER BY bin"""

  /** Mirrors TextAnalysis.gainsLift: score-histogram deciles (equal
    * scores share a decile), cumulative capture and lift. */
  val qGainsLift: String = s"""
    WITH scored AS (SELECT y, score FROM ($qQualityClassifier)),
    hist AS (
      SELECT score, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
      FROM scored GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
      CAST(sum(n_pos) AS BIGINT) AS pos_total FROM hist),
    cum AS (
      SELECT h.*, t.n_total, t.pos_total,
        CAST(sum(h.n) OVER w AS BIGINT) AS cum_n,
        CAST(sum(h.n_pos) OVER w AS BIGINT) AS cum_pos
      FROM hist h CROSS JOIN tot t
      WINDOW w AS (ORDER BY h.score DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    banded AS (
      SELECT *, CAST(least(ceil(10 * cum_n / CAST(n_total AS DOUBLE)), 10) AS INT)
        AS decile
      FROM cum),
    g AS (
      SELECT decile, CAST(sum(n) AS BIGINT) AS n,
        CAST(max(cum_n) AS BIGINT) AS cum_n,
        CAST(max(cum_pos) AS BIGINT) AS cum_pos,
        CAST(max(n_total) AS BIGINT) AS n_total,
        CAST(max(pos_total) AS BIGINT) AS pos_total
      FROM banded GROUP BY 1)
    SELECT decile, n, cum_n, cum_pos,
      round(cum_pos / CAST(pos_total AS DOUBLE) + 1e-9, 6) AS capture,
      round((cum_pos / CAST(cum_n AS DOUBLE))
        / (pos_total / CAST(n_total AS DOUBLE)) + 1e-9, 4) AS lift
    FROM g ORDER BY decile"""

  val qClassifierRoc: String = s"""
    WITH scored AS (SELECT y, score FROM ($qQualityClassifier)),
    th AS (SELECT i * 5 / 100.0 AS t FROM (SELECT unnest(range(1, 20)) AS i)),
    cm AS (
      SELECT t,
        CAST(sum(CASE WHEN score > t AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(sum(CASE WHEN score > t AND y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(sum(CASE WHEN score <= t AND y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        CAST(sum(CASE WHEN score <= t AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM scored CROSS JOIN th GROUP BY t)
    SELECT round(t + 1e-9, 2) AS t, tp, fp, tn, fn,
      round(tp / greatest(tp + fn, 1)::DOUBLE + 1e-9, 6) AS tpr,
      round(fp / greatest(fp + tn, 1)::DOUBLE + 1e-9, 6) AS fpr,
      round(tp / greatest(tp + fp, 1)::DOUBLE + 1e-9, 6) AS precision_
    FROM cm ORDER BY t"""

  /** Mirrors TextAnalysis.bigramPmi: tf-idf-shaped counts, rounded
    * pmi, lexicographic tiebreak top-k. */
  val qBigramPmi: String = s"""
    WITH sw AS (SELECT $toks AS w FROM documents),
    uni AS (SELECT tok, count(*) AS cu FROM (
      SELECT unnest(w) AS tok FROM sw) GROUP BY 1),
    tot AS (SELECT sum(cu)::DOUBLE AS n_corpus FROM uni),
    bi AS (
      SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS cab FROM (
        SELECT unnest(CASE WHEN len(w) >= 2
          THEN [{'w1': w[i], 'w2': w[i+1]} for i in range(1, len(w))]
          ELSE [] END) AS b
        FROM sw)
      GROUP BY 1, 2 HAVING count(*) >= 5),
    pmi AS (
      SELECT bi.w1 || ' ' || bi.w2 AS bigram, bi.cab, ua.cu AS ca, ub.cu AS cb,
        round(ln(bi.cab * t.n_corpus / ua.cu / ub.cu) + 1e-9, 6) AS pmi
      FROM bi JOIN uni ua ON bi.w1 = ua.tok
        JOIN uni ub ON bi.w2 = ub.tok, tot t),
    top AS (SELECT * FROM pmi ORDER BY pmi DESC, bigram LIMIT 20)
    SELECT row_number() OVER (ORDER BY pmi DESC, bigram) AS rank,
      bigram, cab, ca, cb, pmi
    FROM top ORDER BY rank"""

  /** Mirrors TextAnalysis.heavyHitters: CMS cells, exact top-k, min
    * over row estimates — pure integer arithmetic. */
  val qHeavyHitters: String = s"""
    WITH tk AS (SELECT tok, ${ph("tok")} AS th FROM (
      SELECT unnest($toks) AS tok FROM documents)),
    jc AS (
      SELECT th, unnest(range(0, 3)) AS j FROM tk),
    cells AS (
      SELECT j, ((th * (1 + 2*j) + j * 12289) % $P) % 256 AS cell,
        count(*) AS c
      FROM jc GROUP BY 1, 2),
    topk AS (
      SELECT tok, th, count(*) AS n_exact FROM tk GROUP BY 1, 2
      ORDER BY n_exact DESC, tok LIMIT 15),
    probes AS (
      SELECT tok, n_exact, j,
        ((th * (1 + 2*j) + j * 12289) % $P) % 256 AS cell
      FROM (SELECT tok, th, n_exact, unnest(range(0, 3)) AS j FROM topk)),
    est AS (
      SELECT p.tok, p.n_exact, min(c.c) AS cms_estimate
      FROM probes p JOIN cells c ON p.j = c.j AND p.cell = c.cell
      GROUP BY 1, 2)
    SELECT row_number() OVER (ORDER BY n_exact DESC, tok) AS rank,
      tok, n_exact, cms_estimate, cms_estimate - n_exact AS overestimate
    FROM est ORDER BY rank"""

  /** Mirrors Corpus.langTemperature: quantized-p pow, lang-sorted fold
    * denominator. */
  val qLangTemperature: String = s"""
    WITH per_lang AS (
      SELECT lang, CAST(sum(len($toks)) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM per_lang),
    shared AS (
      SELECT lang, n_tokens,
        round(n_tokens / tot_tokens::DOUBLE + 1e-9, 6) AS p,
        round(pow(round(n_tokens / tot_tokens::DOUBLE + 1e-9, 6), 0.3) + 1e-9, 6)
          AS q_raw
      FROM per_lang CROSS JOIN tot),
    denom AS (
      SELECT list_reduce(list_prepend(0.0::DOUBLE, list(q_raw ORDER BY lang)),
        (a, x) -> a + x) AS denom
      FROM shared)
    SELECT lang, n_tokens, p,
      round(q_raw / denom + 1e-9, 6) AS q,
      round(round(q_raw / denom + 1e-9, 6) / p + 1e-9, 6) AS boost
    FROM shared CROSS JOIN denom ORDER BY lang"""

  /** Mirrors Dedup.bandsEval: MinHash band candidates vs exact-Jaccard
    * ground truth, one precision/recall row. */
  val qBandsEval: String = s"""
    WITH $shCte, $sigCte,
    exact AS (SELECT id_a, id_b FROM ($jpairsBody)),
    bands AS (SELECT id_a, id_b FROM cand_pairs),
    j AS (
      SELECT (e.id_a IS NOT NULL)::INT AS in_exact,
        (b.id_a IS NOT NULL)::INT AS in_band
      FROM exact e FULL OUTER JOIN bands b
        ON e.id_a = b.id_a AND e.id_b = b.id_b)
    SELECT CAST(sum(in_band) AS BIGINT) AS n_band_pairs,
      CAST(sum(in_exact) AS BIGINT) AS n_exact_pairs,
      CAST(sum(in_band * in_exact) AS BIGINT) AS n_hits,
      round(sum(in_band * in_exact) / sum(in_band)::DOUBLE + 1e-9, 6)
        AS band_precision,
      round(sum(in_band * in_exact) / sum(in_exact)::DOUBLE + 1e-9, 6)
        AS band_recall
    FROM j"""

  /** Mirrors Corpus.stratifiedSample: per-source hash-ordered top-n. */
  val qStratifiedSample: String = s"""
    WITH keyed AS (
      SELECT source, doc_id,
        ${ph("('strat:' || doc_id::VARCHAR)")} AS skey
      FROM documents),
    r AS (
      SELECT source, doc_id, skey,
        row_number() OVER (PARTITION BY source ORDER BY skey, doc_id) AS rn
      FROM keyed)
    SELECT source, rn, doc_id, skey FROM r WHERE rn <= 10
    ORDER BY source, rn"""

  /** Mirrors TextAnalysis.bpeApply: round-1 winner merged greedily
    * (leftmost non-overlapping `replace`, placeholder chr(1)), then
    * the adjacent symbol-pair recount. */
  val qBpeApply: String = s"""
    WITH tk AS (SELECT unnest($toks) AS tok FROM documents),
    p1 AS (
      SELECT unnest(CASE WHEN length(tok) >= 2
        THEN list_transform(range(1, length(tok)), i -> tok[i:i+1])
        ELSE [] END) AS pair
      FROM tk),
    m AS (SELECT pair AS merge_pair FROM (
      SELECT pair, count(*) AS n FROM p1 GROUP BY 1) ORDER BY n DESC, pair LIMIT 1),
    t AS (SELECT replace(tok, merge_pair, chr(1)) AS t, merge_pair
          FROM tk CROSS JOIN m),
    pp AS (
      SELECT merge_pair, unnest(CASE WHEN length(t) >= 2 THEN
        list_transform(range(1, length(t)), i ->
          (CASE WHEN t[i:i] = chr(1) THEN merge_pair ELSE t[i:i] END) || '+' ||
          (CASE WHEN t[i+1:i+1] = chr(1) THEN merge_pair ELSE t[i+1:i+1] END))
        ELSE [] END) AS pair
      FROM t),
    cnt AS (SELECT merge_pair, pair, count(*) AS n FROM pp GROUP BY 1, 2),
    ranked AS (
      SELECT merge_pair, pair, n, row_number() OVER (ORDER BY n DESC, pair) AS rank
      FROM cnt)
    SELECT rank, merge_pair, pair, n FROM ranked WHERE rank <= 20 ORDER BY rank"""

  val qCcnetBuckets: String = s"""
    WITH tok AS (
      SELECT doc_id, unnest($toks) AS tok FROM documents),
    tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
    cf AS (SELECT tok, sum(c)::BIGINT AS cf FROM tc GROUP BY 1),
    tot AS (SELECT sum(cf)::DOUBLE AS n_corpus FROM cf),
    lp AS (
      SELECT tc.doc_id,
        round(-sum(tc.c * ln(cf.cf / t.n_corpus)) / sum(tc.c) + 1e-9, 6)
          AS mean_neglogprob
      FROM tc JOIN cf USING (tok), tot t
      GROUP BY tc.doc_id)
    SELECT d.doc_id, d.lang, lp.mean_neglogprob,
      CASE ntile(3) OVER (PARTITION BY d.lang
                          ORDER BY lp.mean_neglogprob, d.doc_id)
        WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
    FROM lp JOIN documents d USING (doc_id)
    ORDER BY d.doc_id"""

  val qTokenHist: String = s"""
    WITH per_doc AS (
      SELECT len($toks)::BIGINT AS n_tokens FROM documents
      WHERE len($toks) >= 1),
    agg AS (
      SELECT CAST(floor(log2(n_tokens)) AS BIGINT) AS bucket,
        count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total
      FROM per_doc GROUP BY 1)
    SELECT bucket, CAST(pow(2, bucket) AS BIGINT) AS bucket_lo,
      n_docs, n_tokens_total,
      round((sum(n_docs) OVER (ORDER BY bucket)) /
        (sum(n_docs) OVER ())::DOUBLE + 1e-9, 6) AS cum_share_docs
    FROM agg ORDER BY bucket"""

  /** Mirrors TextAnalysis.winnowing: positional word-3-gram hashes,
    * per-window-of-4 minima as pure list arithmetic (no unnest), the
    * distinct minima are the fingerprints. */
  val qWinnowing: String = s"""
    WITH sw_t AS (SELECT doc_id, $toks AS sw FROM documents),
    kg AS (
      SELECT doc_id,
        CASE WHEN len(sw) >= 3
          THEN [sw[i] || ' ' || sw[i+1] || ' ' || sw[i+2]
                for i in range(1, len(sw) - 1)]
          ELSE [] END AS kgrams
      FROM sw_t),
    hs_t AS (
      SELECT doc_id, list_transform(kgrams, s -> ${ph("s")}) AS hs FROM kg),
    wm AS (
      SELECT doc_id, len(hs) AS n_kgrams,
        CASE WHEN len(hs) >= 4
          THEN [list_min(hs[t:t+3]) for t in range(1, len(hs) - 2)]
          ELSE [] END AS wmins
      FROM hs_t)
    SELECT doc_id, n_kgrams,
      CAST(len(wmins) AS BIGINT) AS n_windows,
      CAST(len(list_distinct(wmins)) AS BIGINT) AS n_fp,
      CASE WHEN len(wmins) > 0
           THEN round(len(list_distinct(wmins)) / len(wmins)::DOUBLE + 1e-9, 6)
      END AS density
    FROM wm ORDER BY doc_id"""

  /** Mirrors TextAnalysis.fertility: quotients of exact integer sums
    * per language. */
  val qTokenizerFertility: String = s"""
    WITH per AS (
      SELECT lang, n_chars, len($toks) AS ws,
        len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re
      FROM documents)
    SELECT lang, count(*) AS n_docs,
      CAST(sum(ws) AS BIGINT) AS n_words,
      CAST(sum(re) AS BIGINT) AS n_subwords,
      CAST(sum(n_chars) AS BIGINT) AS n_chars,
      round(sum(re) / sum(ws)::DOUBLE + 1e-9, 6) AS fertility,
      round(sum(n_chars) / sum(ws)::DOUBLE + 1e-9, 6) AS chars_per_word,
      round(sum(ws) / count(*)::DOUBLE + 1e-9, 6) AS words_per_doc
    FROM per GROUP BY lang ORDER BY lang"""

  /** Mirrors Cluster.drift: per-dimension means of the even/odd
    * vec_id halves. */
  val qEmbedDrift: String = """
    WITH dims AS (
      SELECT unnest(range(0, (SELECT max(len(embedding)) FROM embeddings)))
        AS dim),
    cells AS (
      SELECT d.dim,
        count(CASE WHEN e.vec_id % 2 = 0
                    AND d.dim < len(e.embedding) THEN 1 END) AS n_even,
        count(CASE WHEN e.vec_id % 2 <> 0
                    AND d.dim < len(e.embedding) THEN 1 END) AS n_odd,
        round(avg(CASE WHEN e.vec_id % 2 = 0
                       THEN e.embedding[d.dim + 1] END) + 1e-9, 6) AS mean_even,
        round(avg(CASE WHEN e.vec_id % 2 <> 0
                       THEN e.embedding[d.dim + 1] END) + 1e-9, 6) AS mean_odd
      FROM embeddings e, dims d GROUP BY 1)
    SELECT dim, n_even, n_odd, mean_even, mean_odd,
      round(mean_odd - mean_even + 1e-9, 6) AS shift
    FROM cells ORDER BY dim"""

  /** Mirrors Cluster.langCentroid: per-language per-dimension mean
    * (6-dp quantized), index-order dot-product cosine. */
  val qLangCentroid: String = {
    def dot(a: String, b: String): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($a) + 1), " +
        s"i -> $a[i] * $b[i])), (x, y) -> x + y)"
    s"""
    WITH e AS (
      SELECT vec_id::BIGINT AS vec_id,
        list_transform(embedding, x -> x::DOUBLE) AS emb
      FROM embeddings),
    j AS (
      SELECT d.doc_id::BIGINT AS vec_id, d.lang, e.emb
      FROM documents d JOIN e ON e.vec_id = d.doc_id),
    m AS (
      SELECT lang, i, round(avg(emb[i]) + 1e-9, 6) AS v FROM (
        SELECT lang, emb, unnest(range(1, len(emb) + 1)) AS i FROM j)
      GROUP BY 1, 2),
    c AS (SELECT lang, list(v ORDER BY i) AS cvec FROM m GROUP BY lang)
    SELECT j.vec_id AS doc_id, j.lang,
      round(${dot("j.emb", "c.cvec")}
        / (sqrt(${dot("j.emb", "j.emb")}) * sqrt(${dot("c.cvec", "c.cvec")}))
        + 1e-9, 6) AS cos
    FROM j JOIN c USING (lang) ORDER BY doc_id"""
  }

  /** Mirrors Cluster.centroidDistances: per-lang centroid pairs,
    * cosine + Euclidean with graft_dot's left-fold order. */
  val qCentroidDist: String = {
    def dot(a: String, b: String): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($a) + 1), " +
        s"i -> $a[i] * $b[i])), (x, y) -> x + y)"
    s"""
    WITH e AS (
      SELECT vec_id::BIGINT AS vec_id,
        list_transform(embedding, x -> x::DOUBLE) AS emb
      FROM embeddings),
    j AS (
      SELECT d.lang, e.emb
      FROM documents d JOIN e ON e.vec_id = d.doc_id),
    m AS (
      SELECT lang, i, round(avg(emb[i]) + 1e-9, 6) AS v FROM (
        SELECT lang, emb, unnest(range(1, len(emb) + 1)) AS i FROM j)
      GROUP BY 1, 2),
    c AS (SELECT lang, list(v ORDER BY i) AS cvec FROM m GROUP BY lang),
    pr AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b,
        ${dot("a.cvec", "b.cvec")} AS dt,
        sqrt(${dot("a.cvec", "a.cvec")}) AS na,
        sqrt(${dot("b.cvec", "b.cvec")}) AS nb
      FROM c a JOIN c b ON a.lang < b.lang)
    SELECT lang_a, lang_b,
      round(dt / (na * nb) + 1e-9, 6) AS cosine,
      round(sqrt(greatest(0.0, na*na + nb*nb - 2.0*dt)) + 1e-9, 6) AS euclid
    FROM pr ORDER BY lang_a, lang_b"""
  }

  /** Mirrors Cluster.normStats: 6-dp vector norms, per-label stats. */
  val qEmbedNorms: String = """
    WITH n_t AS (
      SELECT label,
        round(sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)),
          (a, b) -> a + b)) + 1e-9, 6) AS nrm
      FROM embeddings)
    SELECT label, CAST(count(*) AS BIGINT) AS n,
      round(avg(nrm) + 1e-9, 4) AS mean_norm,
      round(quantile_cont(nrm, 0.5) + 1e-9, 6) AS p50_norm,
      min(nrm) AS min_norm, max(nrm) AS max_norm
    FROM n_t GROUP BY 1 ORDER BY label"""

  /** Mirrors TextAnalysis.zipfFit: top-k token counts, ln-ln
    * regression from the sufficient sums. */
  val qZipfFit: String = s"""
    WITH counts AS (
      SELECT tok, count(*) AS n FROM (
        SELECT unnest($toks) AS tok FROM documents)
      GROUP BY 1 ORDER BY n DESC, tok LIMIT 100),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rank
      FROM counts),
    pts AS (
      SELECT ln(rank::DOUBLE) AS x, ln(n::DOUBLE) AS y FROM ranked),
    sums AS (
      SELECT count(*) AS n_pts, sum(x) AS sx, sum(y) AS sy,
        sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
      FROM pts),
    d AS (
      SELECT *, n_pts * sxx - sx * sx AS det,
        n_pts * syy - sy * sy AS dety
      FROM sums)
    SELECT n_pts,
      CASE WHEN det > 0.0
           THEN round((n_pts * sxy - sx * sy) / det + 1e-9, 6)
      END AS zipf_exponent,
      CASE WHEN det > 0.0
           THEN round((sy - (n_pts * sxy - sx * sy) / det * sx) / n_pts
                + 1e-9, 6) END AS intercept,
      CASE WHEN det > 0.0 AND dety > 0.0
           THEN round((n_pts * sxy - sx * sy) * (n_pts * sxy - sx * sy)
                / (det * dety) + 1e-9, 6) END AS r2
    FROM d"""

  /** Mirrors TextAnalysis.prefixDups. */
  val qDedupPrefix: String = s"""
    WITH p AS (
      SELECT doc_id, array_to_string(($toks)[1:2], ' ') AS prefix
      FROM documents)
    SELECT prefix, count(*) AS n_docs, min(doc_id) AS first_doc
    FROM p GROUP BY 1 HAVING count(*) >= 2
    ORDER BY prefix"""

  val all: Map[String, String] = Map(
    "q_winnowing" -> qWinnowing,
    "q_embed_drift" -> qEmbedDrift,
    "q_lang_centroid" -> qLangCentroid,
    "q_zipf_fit" -> qZipfFit,
    "q_heaps_fit" -> qHeapsFit,
    "q_doc_novelty" -> qDocNovelty,
    "q_calibration" -> qCalibration,
    "q_dedup_sweep" -> qDedupSweep,
    "q_dedup_prefix" -> qDedupPrefix,
    "q_tokenizer_fertility" -> qTokenizerFertility,
    "q_ccnet_buckets" -> qCcnetBuckets,
    "q_bpe_pairs" -> qBpePairs,
    "q_bpe_apply" -> qBpeApply,
    "q_oov_rate" -> qOovRate,
    "q_sample_weighted" -> qSampleWeighted,
    "q_stratified_sample" -> qStratifiedSample,
    "q_lang_temperature" -> qLangTemperature,
    "q_bands_eval" -> qBandsEval,
    "q_heavy_hitters" -> qHeavyHitters,
    "q_bigram_pmi" -> qBigramPmi,
    "q_classifier_roc" -> qClassifierRoc,
    "q_embed_whiten" -> qEmbedWhiten,
    "q_semdedup" -> qSemDedup,
    "q_minhash_calibration" -> qMinhashCalibration,
    "q_dedup_cluster_sizes" -> qDedupClusterSizes,
    "q_langid_confusion" -> qLangidConfusion,
    "q_token_hist" -> qTokenHist,
    "q_vocab_coverage" -> qVocabCoverage,
    "q_source_jsd" -> qSourceJsd,
    "q_embed_pca" -> qEmbedPca,
    "q_dedup_cross_source" -> qDedupCrossSource,
    "q_ingest_jsonl" -> qIngestJsonl,
    "q_ingest_gzip" -> qIngestGzip,
    "q_ingest_warc" -> qIngestWarc,
    "q_ingest_zip" -> qIngestZip,
    "q_ingest_tar" -> qIngestTar,
    "q_ingest_sitemap" -> qIngestSitemap,
    "q_ingest_pdf" -> qIngestPdf,
    "q_robots_filter" -> qRobotsFilter,
    "q_ingest_csv" -> qIngestCsv,
    "q_ingest_orc" -> qIngestOrc,
    "q_ingest_bucketed" -> qIngestBucketed,
    "q_readability" -> qReadability,
    "q_rbo" -> qRbo,
    "q_token_burstiness" -> qTokenBurstiness,
    "q_cohens_kappa" -> qCohensKappa,
    "q_dedup_bloom" -> qDedupBloom,
    "q_dsir_weights" -> qDsirWeights,
    "q_corpus_shuffle" -> qCorpusShuffle,
    "q_text_logprob2" -> qTextLogprob2,
    "q_embed_quantize" -> qEmbedQuantize,
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_minhash_bands" -> qDedupMinhashBands,
    "q_dedup_jaccard" -> qDedupJaccard,
    "q_dedup_incremental" -> qDedupIncremental,
    "q_embed_incremental" -> qEmbedIncremental,
    // the snapshot-driven screens are value-identical to the
    // incremental ones (exact verification; only candidate generation
    // differs) — the oracles are reused verbatim
    "q_dedup_snapshot" -> qDedupIncremental,
    "q_dedup_snapshot_cycle" -> qDedupIncremental,
    "q_embed_snapshot" -> qEmbedIncremental,
    "q_dedup_containment" -> qDedupContainment,
    "q_dbscan" -> qDbscan,
    "q_dedup_components" -> qDedupComponents,
    // incremental maintenance equals the one-shot batch components
    "q_dedup_components_incr" -> qDedupComponents,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_dedup_embedding" -> qDedupEmbedding,
    "q_ann_topk" -> qAnnTopk,
    "q_mmr_rerank" -> qMmrRerank,
    "q_hard_negatives" -> qHardNegatives,
    "q_class_balance" -> qClassBalance,
    "q_gains_lift" -> qGainsLift,
    "q_text_langid" -> qTextLangid,
    "q_text_quality" -> qTextQuality,
    "q_text_tokens" -> qTextTokens,
    "q_text_fingerprint" -> qTextFingerprint,
    "q_text_entropy" -> qTextEntropy,
    "q_text_pii" -> qTextPii,
    "q_text_chunks" -> qTextChunks,
    "q_source_mix" -> qSourceMix,
    "q_text_logprob" -> qTextLogprob,
    "q_quality_sample" -> qQualitySample,
    "q_text_bigrams" -> qTextBigrams,
    "q_text_repetition" -> qTextRepetition,
    "q_text_ttr" -> qTextTtr,
    "q_lang_source_mi" -> qLangSourceMi,
    "q_cramers_v" -> qCramersV,
    "q_gopher_rules" -> qGopherRules,
    "q_inverted_search" -> qInvertedSearch,
    "q_bm25" -> qBm25,
    "q_textrank" -> qTextrank,
    "q_cms_heavy_hitters" -> qCmsHeavyHitters,
    "q_centroid_dist" -> qCentroidDist,
    "q_embed_norms" -> qEmbedNorms,
    "q_lsh_bucket_stats" -> qLshBucketStats,
    "q_text_tfidf" -> qTextTfidf,
    "q_dedup_spans" -> qDedupSpans,
    "q_quality_classifier" -> qQualityClassifier,
    "q_text_dupngrams" -> qTextDupngrams,
    "q_pack_sequences" -> qPackSequences,
    "q_corpus_stats" -> qCorpusStats,
    "q_embed_outliers" -> qEmbedOutliers,
    "q_contamination" -> qContamination,
    "q_corpus_split" -> qCorpusSplit,
    "q_corpus_clean" -> qCorpusClean,
    "q_corpus_sample" -> qCorpusSample,
    "q_embed_cluster" -> qEmbedCluster,
    "q_silhouette" -> qSilhouette,
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_image_decode" -> qImageDecode,
    "q_image_decode_png" -> qImageDecodePng,
    "q_image_decode_gif" -> qImageDecodeGif,
    "q_image_decode_bmp" -> qImageDecodeBmp,
    "q_image_decode_tiff" -> qImageDecodeTiff,
    "q_image_decode_ico" -> qImageDecodeIco,
    "q_image_exif" -> qImageExif,
    "q_image_cross_format" -> qImageCrossFormat,
    "q_gif_frames" -> qGifFrames,
    "q_gif_composite" -> qGifComposite,
    "q_dedup_url" -> qDedupUrl,
    "q_url_domains" -> qUrlDomains,
    "q_image_decode_jpeg" -> qImageDecodeJpeg,
    "q_audio_spectrum" -> qAudioSpectrum,
    "q_video_scenes" -> qVideoScenes,
    "q_image_phash" -> qImagePhash,
    // MIH candidate generation is complete for hamming <= 3 like the
    // banded one, so the verified output is identical
    "q_image_phash_mih" -> qImagePhash,
    "q_cdc_chunks" -> qCdcChunks,
    "q_text_charclass" -> qTextCharclass,
    "q_text_normalize" -> qTextNormalize,
    "q_feature_hash" -> qFeatureHash,
    "q_html_metrics" -> qHtmlMetrics,
    "q_image_resize" -> qImageResize,
    "q_audio_decode" -> qAudioDecode,
    "q_audio_mulaw" -> qAudioMulaw,
    "q_audio_alaw" -> qAudioAlaw,
    "q_audio_aiff" -> qAudioAiff,
    "q_audio_adpcm" -> qAudioAdpcm,
    "q_video_decode" -> qVideoDecode)
    // q_ann_lsh intentionally omitted: approximate → rows-only check
}
