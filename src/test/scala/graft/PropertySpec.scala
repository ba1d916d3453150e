package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.TimestampPeriod
import graft.functions.{CharEntropy, PolyHash, MinHashSig}
import java.time.LocalDate

/** Property-style tests over seeded random samples (deterministic). */
class PropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  private def randPeriod(): TimestampPeriod = {
    val a = LocalDate.of(2020, 1, 1).plusDays(rnd.nextInt(3650))
    val b = LocalDate.of(2020, 1, 1).plusDays(rnd.nextInt(3650))
    if (a.isAfter(b)) TimestampPeriod(Some(b), Some(a)) else TimestampPeriod(Some(a), Some(b))
  }

  test("period union is commutative; inner within operands, outer contains them") {
    (1 to 500).foreach { _ =>
      val p = randPeriod(); val q = randPeriod()
      assert(p.union(q) === q.union(p))
      assert(p.union(q, "outer") === q.union(p, "outer"))
      val inner = p.union(q)
      if (!inner.isEmpty) assert(p.contains(inner) && q.contains(inner))
      val outer = p.union(q, "outer")
      assert(outer.contains(p) && outer.contains(q))
    }
  }

  test("polyhash matches a BigInt model on arbitrary ASCII strings") {
    val P = BigInt(1000000007L)
    (1 to 500).foreach { _ =>
      val s = (1 to rnd.nextInt(80)).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
      val model = s.foldLeft(BigInt(0))((acc, c) => (acc * 31 + c.toInt) mod P)
      assert(PolyHash.hash(s) === model.toLong)
    }
  }

  test("GIF LZW round-trips arbitrary index streams at every code size") {
    // 200 seeded-random cases across the full minCode range, with
    // lengths crossing every width-growth boundary and (for small
    // alphabets) the 4096-entry dictionary reset; plus skewed streams
    // (run-length-heavy) that maximize KwKwK hits
    (1 to 200).foreach { i =>
      val minCode = 2 + rnd.nextInt(7) // 2..8
      val n = 1 << minCode
      val len = 1 + rnd.nextInt(6000)
      val seq = new Array[Byte](len)
      var j = 0
      var cur = rnd.nextInt(n)
      while (j < len) {
        // 60% repeat the previous symbol → long runs → KwKwK pressure
        if (rnd.nextInt(10) >= 6) cur = rnd.nextInt(n)
        seq(j) = cur.toByte
        j += 1
      }
      val dec = graft.multimodal.Multimodal.lzwDecode(
        graft.multimodal.Multimodal.lzwEncode(seq, minCode), minCode, len)
      assert(java.util.Arrays.equals(dec, seq), s"case $i (minCode $minCode, len $len)")
    }
  }

  test("char entropy is non-negative, bounded by log2(distinct), permutation-invariant") {
    (1 to 300).foreach { _ =>
      val s = (1 to 1 + rnd.nextInt(120)).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
      val h = CharEntropy.entropy(s)
      val distinct = s.toSet.size
      assert(h >= 0.0)
      assert(h <= math.log(distinct.toDouble) / math.log(2.0) + 1e-12)
      // counts fold in sorted code-point order -> order of the input
      // text cannot change even the last ulp
      val shuffled = rnd.shuffle(s.toList).mkString
      assert(CharEntropy.entropy(shuffled) === h)
    }
  }

  test("morton interleave is injective, positive, and bit-exact invertible") {
    import graft.functions.InterleaveBits._
    def unspread(z0: Long): Long = {
      // inverse of spread: gather the even bits back together
      var x = z0 & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0f0f0f0f0f0f0f0fL
      x = (x | (x >> 4)) & 0x00ff00ff00ff00ffL
      x = (x | (x >> 8)) & 0x0000ffff0000ffffL
      x = (x | (x >> 16)) & 0x00000000ffffffffL
      x
    }
    val pairs = scala.collection.mutable.HashSet.empty[(Long, Long)]
    val codes = scala.collection.mutable.HashSet.empty[Long]
    (1 to 2000).foreach { _ =>
      val a = rnd.nextLong(1L << 20)
      val b = rnd.nextLong(1L << 20)
      val z = morton(a, b)
      assert(z >= 0, "z-code must stay in the positive long range")
      assert(unspread(z) === a, "even bits must decode to the first column")
      assert(unspread(z >> 1) === b, "odd bits must decode to the second column")
      pairs += ((a, b)); codes += z
    }
    // injectivity: distinct pairs -> distinct codes (collisions would
    // interleave unrelated rows in the clustered layout)
    assert(codes.size === pairs.size)
    // locality: quadrant prefix — top bits of z order by top bits of inputs
    assert(morton(0, 0) < morton(1 << 19, 0))
    assert(morton(0, 0) < morton(0, 1 << 19))
  }

  test("minhash signature values stay below the modulus and shrink under union") {
    (1 to 200).foreach { _ =>
      val a = Array.fill(1 + rnd.nextInt(50))(rnd.nextLong(1000000007L))
      val b = Array.fill(1 + rnd.nextInt(50))(rnd.nextLong(1000000007L))
      val sa = MinHashSig.sig(a, 16)
      val sab = MinHashSig.sig(a ++ b, 16)
      sa.zip(sab).foreach { case (x, y) =>
        assert(x >= 0 && x < 1000000007L)
        assert(y <= x) // adding elements can only lower each minimum
      }
    }
  }

  test("G.711 companders are total, bounded, and odd-symmetric over all 256 codes") {
    import graft.multimodal.Multimodal
    (0 until 256).foreach { b =>
      val mu = Multimodal.mulawToLinear(b.toByte)
      val al = Multimodal.alawToLinear(b.toByte)
      assert(mu >= -32124 && mu <= 32124, s"mu-law $b out of range: $mu")
      assert(al >= -32256 && al <= 32256, s"A-law $b out of range: $al")
      // sign symmetry: flipping bit 7 negates (mu-law exactly; A-law
      // has no zero so magnitudes match with sign flipped)
      assert(Multimodal.mulawToLinear((b ^ 0x80).toByte) === -mu)
      assert(Multimodal.alawToLinear((b ^ 0x80).toByte) === -al)
    }
    // the compander is monotone in the code: walking the negative
    // half from 0x7F (silence) down to 0x00 (peak) never increases
    val muNeg = (0 to 127).map(b => Multimodal.mulawToLinear((b ^ 0x7f).toByte))
    assert(muNeg === muNeg.sorted.reverse, "mu-law negative branch not monotone")
    assert(muNeg.head === 0 && muNeg.last === -32124)
  }

  test("80-bit extended float round-trips arbitrary positive rates") {
    import graft.multimodal.Multimodal
    (1 to 500).foreach { _ =>
      val r = 1L + rnd.nextLong(9999999L)
      assert(Multimodal.ext80Decode(Multimodal.ext80Encode(r), 0) === r, s"rate $r")
    }
  }

  test("ZIP and TAR round-trip arbitrary doc contents byte-exactly") {
    import graft.sources.{Zip, Tar}
    (1 to 60).foreach { _ =>
      val id = rnd.nextLong(100000L)
      // random printable text incl. spaces (the entry slices take(N))
      val text = (1 to (5 + rnd.nextInt(200)))
        .map(_ => (32 + rnd.nextInt(95)).toChar).mkString
      val lang = Seq("en", "de", "zh", "es", "fr")(rnd.nextInt(5))
      val zents = Zip.parseZip(Zip.synthesizeZip(id, text, lang))
      assert(new String(zents.head._2, "UTF-8") === text.take(100), s"zip id $id")
      val tents = Tar.parseTar(Tar.synthesizeTar(id, text, lang))
      assert(new String(tents.head._2, "UTF-8") === text.take(120), s"tar id $id")
      assert(new String(tents(1)._2, "UTF-8") === s"lang=$lang\nid=$id\n")
    }
  }

  test("NFC normalization is idempotent and length-non-increasing on random BMP text") {
    import graft.functions.NfcNormalize
    import org.apache.spark.unsafe.types.UTF8String
    (1 to 300).foreach { _ =>
      // mix ASCII, precomposed latin-1, and combining marks
      val s = (1 to rnd.nextInt(60)).map { _ =>
        rnd.nextInt(4) match {
          case 0 => (97 + rnd.nextInt(26)).toChar.toString
          case 1 => (0xc0 + rnd.nextInt(0x40)).toChar.toString // latin-1 letters
          case 2 => (0x300 + rnd.nextInt(0x20)).toChar.toString // combining marks
          case _ => " "
        }
      }.mkString
      val once = NfcNormalize.nfc(UTF8String.fromString(s)).toString
      val twice = NfcNormalize.nfc(UTF8String.fromString(once)).toString
      assert(once === twice, s"not idempotent on ${s.map(_.toInt.toHexString)}")
      assert(once.codePointCount(0, once.length) <= s.codePointCount(0, s.length),
        "NFC composition must not add codepoints")
      assert(once === java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }
}
