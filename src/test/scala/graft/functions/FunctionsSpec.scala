package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val P = 1000000007L

  test("native polyhash equals the interpreted higher-order expression") {
    GraftFunctions.register(spark)
    val interp = "aggregate(transform(sequence(1, length(s)), i -> ascii(substr(s, i, 1))), " +
      s"0L, (acc, ch) -> (acc * 31 + ch) % ${P}L)"
    val df = Seq("", "a", "hello world", "the quick brown fox", "x" * 500)
      .toDF("s")
      .withColumn("native", expr("graft_polyhash(s)"))
      .withColumn("interp", expr(interp))
    assert(df.filter($"native" =!= $"interp").count() === 0)
  }

  test("polyhash matches a hand-computed fold") {
    // "ab" -> ((0*31+97)%P)*31 + 98 = 97*31+98 = 3105
    assert(PolyHash.hash("ab") === 3105L)
    assert(PolyHash.hash("") === 0L)
  }

  test("native minhash signature equals the interpreted expression") {
    GraftFunctions.register(spark)
    val interp = s"transform(sequence(0, 63), i -> " +
      s"array_min(transform(h, x -> (x * (1 + 2*i) + i * 12289) % ${P}L)))"
    val df = Seq(Seq(5L, 999999L, 123456789L), Seq(42L))
      .toDF("h")
      .withColumn("native", expr("graft_minhash_sig(h, 64)"))
      .withColumn("interp", expr(interp))
    assert(df.filter(expr("native != interp")).count() === 0)
  }

  test("empty shingle set yields an all-null signature") {
    GraftFunctions.register(spark)
    val out = Seq(Seq.empty[Long]).toDF("h")
      .select(expr("graft_minhash_sig(h, 4)")).as[Seq[Option[Long]]].collect().head
    assert(out === Seq(None, None, None, None))
  }

  test("char entropy matches hand-computed distributions") {
    // "aab": p(a)=2/3, p(b)=1/3 -> H = -(2/3)log2(2/3) - (1/3)log2(1/3)
    val expected = -(2.0 / 3) * (math.log(2.0 / 3) / math.log(2)) -
      (1.0 / 3) * (math.log(1.0 / 3) / math.log(2))
    assert(math.abs(CharEntropy.entropy("aab") - expected) < 1e-12)
    assert(CharEntropy.entropy("") === 0.0)
    assert(CharEntropy.entropy("aaaa") === 0.0) // single symbol: no surprise
    assert(CharEntropy.entropy("ab") === 1.0)   // uniform over 2 symbols: 1 bit
    // supplementary code points count as ONE symbol each
    assert(CharEntropy.entropy("😀😀") === 0.0)
    GraftFunctions.register(spark)
    val viaSql = Seq("aab").toDF("s")
      .select(expr("graft_char_entropy(s)").as("h")).head.getDouble(0)
    assert(math.abs(viaSql - expected) < 1e-12)
  }

  test("nfc normalization composes decomposed sequences, is idempotent, passes nulls") {
    import org.apache.spark.unsafe.types.UTF8String
    val decE = "e\u0301" // e + COMBINING ACUTE -- two codepoints
    val preE = "\u00e9"  // precomposed e-acute -- one codepoint
    val decO = "o\u0308" // o + COMBINING DIAERESIS
    val preO = "\u00f6"  // precomposed o-diaeresis
    assert(NfcNormalize.nfc(UTF8String.fromString(decE)).toString === preE)
    // already-NFC input takes the fast path and returns the SAME object
    val clean = UTF8String.fromString("plain ascii")
    assert(NfcNormalize.nfc(clean) eq clean)
    // composition + idempotence through the SQL surface (codegen path)
    GraftFunctions.register(spark)
    val df = Seq(decE, decO, s"Am${decE}lie ${decO}ko", preE, "abc")
      .toDF("s")
      .withColumn("n", expr("graft_nfc(s)"))
      .withColumn("nn", expr("graft_nfc(graft_nfc(s))"))
      .withColumn("len_s", length($"s"))
      .withColumn("len_n", length($"n"))
    assert(df.filter($"n" =!= $"nn").count() === 0, "NFC must be idempotent")
    val byIn = df.collect().map(r => r.getString(0) -> r).toMap
    assert(byIn(decE).getString(1) === preE)
    assert(byIn(decE).getInt(3) === 2 && byIn(decE).getInt(4) === 1)
    assert(byIn(decO).getString(1) === preO)
    assert(byIn(s"Am${decE}lie ${decO}ko").getString(1) === s"Am${preE}lie ${preO}ko")
    assert(byIn(preE).getString(1) === preE) // precomposed unchanged
    assert(byIn("abc").getString(1) === "abc")
    // null passthrough
    val nul = Seq[String](null).toDF("s").select(expr("graft_nfc(s)")).head
    assert(nul.isNullAt(0))
  }

  test("extensions class injects every graft function without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
