package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the TextOps kernels against naive Scala reference
  * implementations — pure JVM, no Spark session. Generators are sampled
  * over fixed seeds (the scalatest/scalacheck bridge isn't on the offline
  * classpath) — property-shaped and reproducible.
  */
class TextOpsPropertiesSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1L to n).flatMap(seed => gen.apply(Gen.Parameters.default, Seed(seed)))

  private def arr(xs: Seq[Long]) = new GenericArrayData(xs.toArray)

  test("slidingMin equals the naive window minimum for random arrays and widths") {
    val gen = for {
      xs <- Gen.listOf(Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))
      w <- Gen.choose(1, 6)
    } yield (xs, w)
    for ((xs, w) <- samples(gen, 200)) {
      val naive = xs.sliding(w).filter(_.length == w).map(_.min).toSeq
      val got = TextOps.slidingMin(arr(xs), w).toSeq
      assert(got == naive, s"xs=$xs w=$w")
    }
  }

  test("wordNgrams equals the naive mkString join for random word lists") {
    val word = Gen.stringOfN(3, Gen.alphaNumChar)
    val gen = for {
      ws <- Gen.listOf(word)
      n <- Gen.choose(1, 4)
    } yield (ws, n)
    for ((ws, n) <- samples(gen, 200)) {
      val naive = ws.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
      val got = TextOps.wordNgrams(
        new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any]), n)
        .toSeq.map(_.toString)
      assert(got == naive, s"ws=$ws n=$n")
    }
  }

  test("minhashSig is permutation-invariant and monotone under union") {
    val gen = Gen.listOf(Gen.choose(0L, 4294967295L))
    for (xs <- samples(gen, 100)) {
      val sig = TextOps.minhashSig(arr(xs), 8).toSeq
      // permutation invariance: min over a set ignores order
      val shuffled = scala.util.Random.javaRandomToRandom(
        new java.util.Random(42)).shuffle(xs)
      assert(TextOps.minhashSig(arr(shuffled), 8).toSeq == sig)
      // adding elements can only lower (or keep) each band minimum
      val sup = TextOps.minhashSig(arr(xs ++ Seq(17L, 4242L)), 8).toSeq
      sig.zip(sup).foreach { case (a, b) => assert(b <= a) }
    }
  }

  test("gramHashes length and prefix bounds hold for random unicode text") {
    val gen = for {
      s <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('é'), Gen.const('漢')))
        .map(_.mkString)
      k <- Gen.choose(1, 7)
    } yield (s, k)
    for ((s, k) <- samples(gen, 200)) {
      val out = TextOps.gramHashes(UTF8String.fromString(s), k,
        UTF8String.fromString(":t"), 15)
      val expectedLen = math.max(0, s.codePointCount(0, s.length) - k + 1)
      assert(out.length == expectedLen, s"s='$s' k=$k")
      out.foreach(h => assert(h >= 0 && h < (1L << 60))) // 15 nibbles
      // equal grams hash equally: hash of a self-repeating string's windows
      if (out.length >= 2 && s.nonEmpty && s.distinct.length == 1)
        assert(out.distinct.length == 1)
    }
  }

  test("simhash32 of a multiset equals simhash32 with votes computed naively") {
    val gen = Gen.listOf(Gen.choose(0L, (1L << 32) - 1))
    for (xs <- samples(gen, 200)) {
      val naive = (0 until 32).map { j =>
        val votes = xs.map(h => if (((h >> j) & 1L) == 1L) 1 else -1).sum
        if (votes >= 0) 1L << j else 0L
      }.sum
      assert(TextOps.simhash32(arr(xs)) == naive, s"xs=$xs")
    }
  }

  test("simhash64 of a multiset equals simhash64 with votes computed naively") {
    val gen = Gen.listOf(Gen.choose(0L, (1L << 60) - 1))
    for (xs <- samples(gen, 200)) {
      val naive = (0 until 64).map { j =>
        val votes = xs.map(h => if (((h >>> j) & 1L) == 1L) 1 else -1).sum
        if (votes >= 0) 1L << j else 0L
      }.sum
      assert(TextOps.simhash64(arr(xs)) == naive, s"xs=$xs")
    }
  }

  test("bandHashes rejects short signatures instead of reading out of bounds") {
    val e = intercept[IllegalArgumentException] {
      TextOps.bandHashes(arr(Seq(1L, 2L, 3L)), 4, 2, 15)
    }
    assert(e.getMessage.contains("signature"))
  }
}
