package graft

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import graft.MultimodalOps.{MMFeat, MMFrame, MMHash, MMIn, MMResized, MMVec}

/** REAL image codec behind the [[MediaCodec]] seam (VERDICT r19 #1):
  * JDK ImageIO (headless, no JNI) decodes genuine PNG/JPEG payloads,
  * so every kernel below runs over DECODED PIXELS — this retires the
  * engine's last "stub by necessity" caveat. The Spark plumbing
  * (schema, mapPartitions batch shape, LSH pairing topology) is
  * exactly what [[StubMediaCodec]] ships; only the per-record kernels
  * change, which is the seam's whole contract.
  *
  * Kernel semantics (the decoded-pixel twins of the stub's byte
  * arithmetic; every one is integer-exact and platform-independent —
  * PNG is lossless, so decode(encode(px)) == px and nothing here
  * depends on encoder byte output):
  *  - [[decode]]: checksum = Σ integer luminance (299r+587g+114b)/1000
  *    over all pixels; thumb_mean = checksum / pixel count.
  *  - [[phash]]: 64-bit block-mean hash — the image resampled to an
  *    8×8 grid of rectangular pixel blocks, bit b = [block-b luminance
  *    mean > whole-image mean] via exact cross-multiplied integer
  *    compare (blockSum · nPixels > totalSum · blockPixels). Near-dup
  *    images (±1 pixel) move one block sum by ≤1, so their hashes sit
  *    within a few bits; downstream 16-bit-block LSH bucketing assumes
  *    exactly "near-dup ⇒ small hamming" (mm_phash's pairing runs
  *    UNCHANGED over these signatures — Round20Spec).
  *  - [[resize]]: REAL resample — Graphics2D bilinear draw to 256×256
  *    and a PNG re-encode; n_bytes is the re-encoded payload size,
  *    scale factors from the DECODED geometry (metadata width/height
  *    are advisory and often wrong in crawled corpora).
  *  - [[frames]]: a still image's flatMap shape — horizontal 32-row
  *    bands, every 4th band emitted with its luminance sum as the
  *    frame checksum (offset = first pixel index of the band).
  *  - [[embed]]: the 8×8 block-mean luminance grid (64 dims),
  *    mean-centered and L2-normalized — deterministic, so identical
  *    payloads map to identical unit vectors (mm_embed_knn's
  *    determinism contract).
  *
  * A payload ImageIO cannot decode fails LOUD (IllegalArgumentException
  * naming the doc) — a real pipeline routes non-images away before the
  * decode stage; silently faking features for garbage bytes is the one
  * thing a REAL codec must never do.
  *
  * Reference surface: charlotte holds packet decode to the real-bytes
  * standard (`__init__.py:482-528`); this holds media decode to the
  * same standard.
  */
object ImageIoCodec extends MediaCodec {

  // ImageIO defaults to DISK-cached image streams: every read/write
  // otherwise creates (and deletes) a temp file under java.io.tmpdir —
  // measured r20 as the dominant cost of the 10k-image sf0.1 codec
  // pass (per-record work, guide §1.2 step 2). In-memory payloads
  // never need the disk cache; this flips the process default to
  // MemoryCache streams (output unchanged — PNG bytes are written
  // through the same encoder either way).
  ImageIO.setUseCache(false)

  private def read(r: MMIn): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(r.payload))
    if (img == null)
      throw new IllegalArgumentException(
        s"doc ${r.doc_id}: payload (${r.payload.length} bytes) is not a " +
          "decodable image")
    img
  }

  /** Integer luminance in [0, 255]: (299 r + 587 g + 114 b) / 1000. */
  @inline private def lum(rgb: Int): Long = {
    val r = (rgb >> 16) & 0xff
    val g = (rgb >> 8) & 0xff
    val b = rgb & 0xff
    (299L * r + 587L * g + 114L * b) / 1000L
  }

  /** (totalLumSum, per-8x8-block lum sums, per-block pixel counts). */
  private def blockSums(img: BufferedImage)
      : (Long, Array[Long], Array[Long]) = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var tot = 0L
    var y = 0
    while (y < h) {
      val by = math.min(y * 8 / h, 7)
      var x = 0
      while (x < w) {
        val bx = math.min(x * 8 / w, 7)
        val l = lum(img.getRGB(x, y))
        tot += l
        val b = by * 8 + bx
        sums(b) += l
        counts(b) += 1
        x += 1
      }
      y += 1
    }
    (tot, sums, counts)
  }

  def decode(r: MMIn): MMFeat = {
    val img = read(r)
    val (tot, _, _) = blockSums(img)
    val n = img.getWidth.toLong * img.getHeight
    MMFeat(r.doc_id, r.payload.length.toLong, tot,
      if (n == 0) 0.0 else tot.toDouble / n)
  }

  def phash(r: MMIn): MMHash = {
    val img = read(r)
    val (tot, sums, counts) = blockSums(img)
    val n = img.getWidth.toLong * img.getHeight
    var sig = 0L
    var b = 0
    while (b < 64) {
      // exact cross-multiplied compare: mean_b > mean_total
      if (counts(b) > 0 && sums(b) * n > tot * counts(b)) sig |= (1L << b)
      b += 1
    }
    MMHash(r.doc_id, sig)
  }

  def resize(r: MMIn): MMResized = {
    val img = read(r)
    val (tw, th) = (256, 256)
    val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, tw, th, null)
    } finally g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    MMResized(r.doc_id, tw, th,
      tw.toDouble / img.getWidth, th.toDouble / img.getHeight,
      bos.size().toLong)
  }

  def frames(r: MMIn): Seq[MMFrame] = {
    val img = read(r)
    val w = img.getWidth
    val h = img.getHeight
    val band = 32
    val nBands = math.max(h / band, 1)
    (0 until nBands by 4).map { f =>
      val y0 = f * band
      val y1 = math.min(y0 + band, h)
      var s = 0L
      var y = y0
      while (y < y1) {
        var x = 0
        while (x < w) { s += lum(img.getRGB(x, y)); x += 1 }
        y += 1
      }
      MMFrame(r.doc_id, f, y0.toLong * w, s)
    }
  }

  def embed(r: MMIn): MMVec = {
    val img = read(r)
    val (tot, sums, counts) = blockSums(img)
    val n = img.getWidth.toLong * img.getHeight
    val v = new Array[Double](64)
    var d = 0
    while (d < 64) {
      if (counts(d) > 0)
        v(d) = sums(d).toDouble / counts(d) -
          (if (n == 0) 0.0 else tot.toDouble / n)
      d += 1
    }
    var norm = 0.0
    d = 0
    while (d < 64) { norm += v(d) * v(d); d += 1 }
    if (norm == 0.0) v(0) = 1.0
    else {
      val inv = 1.0 / math.sqrt(norm)
      d = 0
      while (d < 64) { v(d) *= inv; d += 1 }
    }
    MMVec(r.doc_id, v)
  }
}

/** Deterministic PNG generation for the real-codec entries and specs:
  * the testdata carries no binary media, so mm_phash_real renders one
  * genuine 32×32 PNG per document from its text bytes (an LCG over
  * the bytes — identical texts give identical images, any text change
  * scrambles every pixel) plus a ±1-pixel NEAR-DUP variant (lowest
  * blue bit of pixel (0,0) flipped — the canonical near-dup image
  * pair). All arithmetic is fixed-width integer, so the pixels — and,
  * PNG being lossless, everything the codec computes from them — are
  * platform-independent; nothing downstream depends on encoder byte
  * output.
  */
object ImageGen {

  // same disk-cache opt-out as ImageIoCodec (this object can be the
  // first ImageIO user on an executor classloader)
  ImageIO.setUseCache(false)

  /** 32×32 RGB pixels from an LCG seeded by the text bytes. */
  private def pixels(text: Array[Byte]): Array[Int] = {
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < text.length) {
      h = (h ^ (text(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    val px = new Array[Int](32 * 32)
    var p = 0
    while (p < px.length) {
      h = h * 6364136223846793005L + 1442695040888963407L
      px(p) = ((h >>> 24) & 0xffffffL).toInt
      p += 1
    }
    px
  }

  /** Encode `text`'s image as a real PNG; `perturb` flips the lowest
    * blue bit of pixel (0,0) — a ±1 near-dup of the base image.
    */
  def renderPng(text: Array[Byte], perturb: Boolean): Array[Byte] = {
    val px = pixels(text)
    if (perturb) px(0) ^= 1
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 32, 32, px, 0, 32)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
