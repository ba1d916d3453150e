package graft.text

/** Column-expression builders for text processing, written as Spark SQL
  * expression strings (all codegen'd higher-order functions — no UDFs).
  *
  * Every function here has a bit-identical DuckDB mirror in
  * `graft.llm.LlmOracle`: hashes are deterministic polynomial hashes
  * over code points (NOT murmur/xxhash, which differ between engines),
  * so the oracle can reproduce MinHash/SimHash/fingerprint results
  * value-for-value.
  */
object TextFns {
  /** Modulus for all polynomial hashes (fits multiplication by small
    * coefficients into a long without overflow). */
  val P = 1000000007L
  /** MinHash family: h_i(x) = (x*(1+2i) + i*12289) mod P. */
  val NumHashes = 64
  val NumBands = 32 // 2 rows per band
  /** SimHash signature width. The polynomial token hash only carries
    * ~30 usable bits (mod 1e9+7), so the upper 30 signature bits come
    * from an independent Lehmer step of the same hash — see
    * [[simhashTokenHash]]. 60 bits (not 64) keeps every intermediate
    * inside non-negative BIGINT range on both engines. */
  val SimHashBits: Int = graft.functions.SimHashText.Bits
  /** Band width for the 4-band pigeonhole bucketing: 4×15 bits. The
    * bucket key space (2^15 per band) must stay large relative to the
    * docs per shard, or per-bucket join fan-out turns quadratic — the
    * old 30-bit/8-bit layout collapsed to ≤256 buckets and scaled as
    * O(n²/256). */
  val SimHashBandBits = 15

  /** Polynomial rolling hash of a string expression: fold
    * (acc*31 + codepoint) mod P over the characters. Backed by the
    * native codegen'd graft.functions.PolyHash expression (requires
    * GraftFunctions.register on the session). */
  def polyHash(s: String): String = s"graft_polyhash($s)"

  /** Whitespace tokens of the lowercased text. */
  def tokens(s: String): String = s"split(lower($s), ' ')"

  /** Distinct word-3-gram shingles (empty for texts under 3 words). */
  def shingles(s: String): String = {
    val w = tokens(s)
    s"CASE WHEN size($w) >= 3 THEN array_distinct(transform(sequence(0, size($w) - 3), " +
      s"i -> concat(element_at($w, i + 1), ' ', element_at($w, i + 2), ' ', element_at($w, i + 3)))) " +
      "ELSE array() END"
  }

  /** Hashes of the distinct shingles. Backed by the native codegen'd
    * graft.functions.ShingleHashes expression (bit-identical to
    * `transform(${shingles(s)}, sh_w -> polyhash(sh_w))`, which is what
    * the DuckDB oracle mirrors — but one generated-code loop per row
    * instead of interpreted higher-order lambdas per shingle). The
    * coalesce restores the composed form's NULL-text behavior: an empty
    * shingle set, not a NULL row that would silently drop the doc from
    * the dedup pipeline. */
  def shingleHashes(s: String): String =
    s"coalesce(graft_shingle_hashes($s), cast(array() AS array<bigint>))"

  /** MinHash signature (array of NumHashes minima) over a column named
    * `hashes` (array<long> of shingle hashes). Backed by the native
    * codegen'd graft.functions.MinHashSig expression. */
  def minhashSig(hashesCol: String): String =
    s"graft_minhash_sig($hashesCol, $NumHashes)"

  /** 60-bit token hash for SimHash: low 30 bits are the polynomial
    * hash itself (< 2^30), high 30 bits an independent Lehmer LCG step
    * `(h*48271) mod (2^31-1)` of it — both stay inside BIGINT without
    * wraparound, so DuckDB (which errors on signed overflow) computes
    * the identical value. */
  def simhashTokenHash(h: String): String =
    s"($h + shiftleft((($h * 48271) % 2147483647) & 1073741823, 30))"

  /** SimHash over a column named `thashes` (array<long> of 60-bit
    * token hashes WITH multiplicity, see [[simhashTokenHash]]): bit j
    * set iff the majority of tokens have bit j set. */
  def simhash(thashesCol: String): String =
    s"aggregate(sequence(0, ${SimHashBits - 1}), 0L, (acc, j) -> acc + " +
      s"(CASE WHEN aggregate($thashesCol, 0L, (c, h) -> c + (shiftright(h, j) & 1) * 2 - 1) > 0 " +
      s"THEN shiftleft(1L, j) ELSE 0L END))"
}
