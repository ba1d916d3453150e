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
}
