package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{DctFeatureExtractor, SyntheticMedia}

/** The perceptual DCT featurizer (pHash family): the properties that make
 * it a real embedding rather than a byte hash — container invariance,
 * resize robustness, noise robustness, separation of unlike content — plus
 * the Spark plumbing into the ANN cosine operators (mirrors q62). */
class DctFeatureSpec extends AnyFunSuite {
  import TestSpark._

  private val ex = new DctFeatureExtractor(32, 8)

  private def feats(blobs: Array[Byte]*): Array[Array[Float]] =
    ex.extract(blobs.toArray)

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
    s // inputs are unit-normalized by the extractor
  }

  test("dim, unit norm, and determinism") {
    assert(ex.dim === 65) // 63 AC coefficients + 2 reserved flat dims
    val blob = SyntheticMedia.image("png", 40, 40, seed = 3L)
    val Array(a, b) = feats(blob, blob)
    assert(a.length === 65)
    assert(a.takeRight(2).forall(_ === 0f), "textured: reserved dims zero")
    assert(a.toSeq === b.toSeq)
    val norm = math.sqrt(a.map(v => v.toDouble * v).sum)
    assert(math.abs(norm - 1.0) < 1e-4)
  }

  test("container invariance: PNG and BMP of the same raster embed identically") {
    // same seeded raster through two different lossless encoders — a byte
    // hash diverges completely; the decode-first featurizer must not
    val png = SyntheticMedia.image("png", 48, 48, seed = 5L)
    val bmp = SyntheticMedia.image("bmp", 48, 48, seed = 5L)
    assert(!java.util.Arrays.equals(png, bmp))
    val Array(a, b) = feats(png, bmp)
    assert(cosine(a, b) > 0.9999)
  }

  test("resize robustness: the same linear ramp at 2x resolution embeds on the same axis") {
    // gradientImage rows are a linear ramp in y; after DC drop, unit
    // normalization cancels the slope, so 64x64 and 32x32 renditions of
    // the ramp must embed nearly identically despite sharing no bytes
    val small = SyntheticMedia.gradientImage("png", 32, 32, base = 10)
    val big = SyntheticMedia.gradientImage("png", 64, 64, base = 10)
    val Array(a, b) = feats(small, big)
    assert(cosine(a, b) > 0.99, s"got ${cosine(a, b)}")
  }

  test("noise robustness: a few flipped pixels keep the embedding nearby") {
    val img = new java.awt.image.BufferedImage(48, 48,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var s = 99L
    for (y <- 0 until 48; x <- 0 until 48) {
      s = s * 6364136223846793005L + 1442695040888963407L
      img.setRGB(x, y, ((s >>> 40) & 0xFFFFFF).toInt)
    }
    def encode(i: java.awt.image.BufferedImage): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, "png", baos)
      baos.toByteArray
    }
    val clean = encode(img)
    for (k <- 0 until 12) img.setRGB(k * 3 % 48, k * 7 % 48, 0xFFFFFF)
    val noised = encode(img)
    val Array(a, b) = feats(clean, noised)
    val c = cosine(a, b)
    assert(c > 0.9 && c < 1.0, s"got $c")
  }

  test("unlike content embeds far; flat content embeds by luma angle") {
    val Array(a, b) = feats(
      SyntheticMedia.image("png", 48, 48, seed = 1L),
      SyntheticMedia.image("png", 48, 48, seed = 2L))
    assert(math.abs(cosine(a, b)) < 0.5, s"got ${cosine(a, b)}")
    val flat = feats(SyntheticMedia.gradientImage("png", 1, 40, base = 7)).head
    assert(flat.forall(v => !v.isNaN))
    // width-1 ramp still has vertical AC; a truly flat image is constant rows
    def flatPng(rgb: Int, side: Int = 16,
        noisePixel: Option[Int] = None): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(side, side,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until side; x <- 0 until side) img.setRGB(x, y, rgb)
      noisePixel.foreach(p => img.setRGB(side / 2, side / 2, p))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    // zero AC energy: NOT the zero vector (cosine of zero vectors is 0,
    // which would make byte-identical solid-color images undiscoverable by
    // cosineDedupPairs) — flats live in the two RESERVED dims as
    // (cos θ, sin θ) of the mean-luma angle, orthogonal by construction to
    // every textured image (which carries 0 there)
    val z = feats(flatPng(0x808080)).head
    // cos θ may be negative (θ spans [0, π]); sin θ > 0 for any non-extreme
    // brightness, and every AC dim must be exactly zero
    assert(z.last > 0f && z.dropRight(2).forall(_ === 0f),
      s"flat must embed in the reserved dims only, got ${z.toSeq}")
    assert(math.abs(z.map(x => x * x).sum - 1f) < 1e-4, "unit norm")
    // same-raster flats (different size, same color) embed identically...
    val z2 = feats(flatPng(0x808080, side = 32)).head
    assert(cosine(z, z2) > 0.999, "equal-color flats must pair as dups")
    // ...clearly-different-brightness flats land far below any dedup
    // threshold (θ spans [0, π]: Δluma 112 → Δθ ≈ 1.38 rad → cosine ≈ 0.2)...
    val dark = feats(flatPng(0x101010)).head
    assert(cosine(z, dark) < 0.5,
      s"different-brightness flats must not pair: ${cosine(z, dark)}")
    // ...VISIBLY different grays stay under the 0.99 dedup threshold
    // (Δluma 22 → Δθ ≈ 0.27 → cosine ≈ 0.96; the [0, π/2] mapping had
    // them at 0.991 — review find)...
    val dark2 = feats(flatPng(0x262626)).head
    assert(cosine(dark, dark2) < 0.99,
      s"16-vs-38 luma flats must not pair at 0.99: ${cosine(dark, dark2)}")
    // ...and a flat plus a SUB-VISIBLE noise copy (one pixel one luma
    // level off — a recompression artifact) takes the same flat path and
    // pairs at any threshold, instead of normalizing the noise into a
    // random orthogonal direction (the pre-existing norm cliff)
    val noisy = feats(flatPng(0x808080, noisePixel = Some(0x818181))).head
    // the blend keeps sub-visible noise within the 0.99 dedup threshold
    // of its clean flat (w ≈ ‖AC‖²/(size²/5)² stays ≲ 0.006 for a few
    // pixel-levels of localized energy) — a HARD flat/textured routing
    // threshold would make some noise amplitude embed orthogonally
    assert(cosine(z, noisy) > 0.99,
      s"flat vs sub-visible-noise copy must pair: ${cosine(z, noisy)}")
    // ...and the review's aliasing scenario cannot recur: a smooth
    // horizontal ramp concentrates ~0.99 of its AC energy in ONE kept
    // coefficient — on a shared simplex it cosine-matched a near-black
    // flat above the 0.99 dedup threshold; in the reserved-dims encoding
    // the two are exactly orthogonal
    val rampImg = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val l = x * 255 / 63; rampImg.setRGB(x, y, (l << 16) | (l << 8) | l)
    }
    val rbaos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rampImg, "png", rbaos)
    val ramp = feats(rbaos.toByteArray).head
    val nearBlack = feats(flatPng(0x030303)).head
    assert(math.abs(cosine(nearBlack, ramp)) < 1e-6,
      s"flat vs ramp must be orthogonal: ${cosine(nearBlack, ramp)}")
    assert(ex.extract(Array[Array[Byte]](null)).head === null)
  }

  test("spark plumbing: extractFeatures + ANN cosine pairs recover content groups") {
    import spark.implicits._
    // the q62 shape at spec scale: 12 ids, content keyed by id % 3, bytes
    // differing by container — the cosine-pair operator must emit exactly
    // the same-content pairs
    val ids = (0L until 12L).toDF("doc_id")
    val mkBlob = udf { (id: Long) =>
      SyntheticMedia.image(if (id % 2 == 0) "png" else "bmp", 48, 48, id % 3)
    }
    val bin = ids.withColumn("blob", mkBlob(col("doc_id")))
    val f = Multimodal.extractFeatures(bin, "blob", new DctFeatureExtractor(32, 8))
      .select(col("doc_id"), col("features"))
    val got = graft.ann.Ann.cosineDedupPairs(f, "doc_id", "features", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      a <- 0L until 12L; b <- 0L until 12L
      if a < b && a % 3 == b % 3
    } yield (a, b)).toSet
    assert(got === want)
  }
}
