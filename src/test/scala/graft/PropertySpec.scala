package graft

import graft.imaging.{ImageOps, SyntheticImages}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generator property tests (SURVEY.md §5.2.3), sampled with a
  * fixed seed (no scalatest-scalacheck bridge in the offline cache —
  * generators are driven directly).
  */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    var seed = Seed(42L)
    (1 to n).map { _ =>
      val v = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
  }

  private val dims = for {
    w <- Gen.choose(1, 96); h <- Gen.choose(1, 96)
  } yield (w, h)

  private val rgb = for {
    r <- Gen.choose(0, 255); g <- Gen.choose(0, 255); b <- Gen.choose(0, 255)
  } yield (r, g, b)

  test("histogram mass = w*h per band; extrema bound mean/median; entropy bounded") {
    samples(Gen.zip(dims, rgb), 25).foreach { case ((w, h), (r, g, b)) =>
      val s = ImageOps.statistics(SyntheticImages.solid(w, h, r, g, b)).get
      (0 until 3).foreach { band =>
        assert(s.histogram.slice(band * 256, (band + 1) * 256).sum == w * h)
        assert(s.extrema(band)(0) <= s.median(band) && s.median(band) <= s.extrema(band)(1))
        assert(s.extrema(band)(0) <= s.mean(band) + 1e-9 &&
          s.mean(band) <= s.extrema(band)(1) + 1e-9)
        assert(s.stddev(band) >= 0.0)
      }
      assert(s.entropy >= 0.0 && s.entropy <= math.log(768) / math.log(2) + 1e-9)
    }
  }

  test("metadata dimensions round-trip for arbitrary sizes") {
    samples(dims, 25).foreach { case (w, h) =>
      val m = ImageOps.metadata(SyntheticImages.gradient(w, h)).get
      assert(m.width == w && m.height == h && m.layers == 3)
    }
  }

  test("exif splice round-trips arbitrary ASCII tag values") {
    val ascii = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    samples(Gen.zip(ascii, ascii), 25).foreach { case (make, model) =>
      val jpeg = SyntheticImages.withExif(
        SyntheticImages.solid(8, 8, 1, 2, 3),
        Seq(0x010F -> make, 0x0110 -> model))
      val e = graft.imaging.ExifReader.read(jpeg)
      assert(e.tags("Make") == make && e.tags("Model") == model)
    }
  }

  test("rolling-hash fold: appending a char is an O(1) update") {
    def roll(s: String): Long =
      s.map(_.toLong).reduceLeft((h, a) => (h * 31 + a) % 1000000007L)
    val texts = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    samples(Gen.zip(texts, Gen.alphaLowerChar), 50).foreach { case (s, c) =>
      assert(roll(s + c) == (roll(s) * 31 + c.toLong) % 1000000007L)
    }
  }

  test("jaccard is symmetric, bounded, 1 iff equal sets") {
    val sets = Gen.nonEmptyListOf(Gen.choose(0, 50)).map(_.toSet)
    samples(Gen.zip(sets, sets), 50).foreach { case (a, b) =>
      val j = a.intersect(b).size.toDouble / a.union(b).size
      assert(j >= 0.0 && j <= 1.0)
      if (a == b) assert(j == 1.0)
      assert(j == b.intersect(a).size.toDouble / b.union(a).size)
    }
  }
}
