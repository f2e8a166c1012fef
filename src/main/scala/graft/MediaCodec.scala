package graft

import graft.MultimodalOps.{MMFeat, MMFrame, MMHash, MMIn, MMResized, MMVec}

/** Pluggable media-codec seam for the mm_* operators (VERDICT r18
  * #8): the per-RECORD kernels behind the mapPartitions batch
  * plumbing. A real image/audio/video codec (JNI, javacpp-ffmpeg, a
  * model runtime) implements exactly these five functions and drops
  * in via [[MultimodalOps.installCodec]] without touching the oracled
  * Spark topology — schema, batch iterator shape, bucketing and
  * everything downstream stay as shipped.
  *
  * Contract per method (what the production implementation swaps in
  * for the deterministic stub arithmetic):
  *  - [[decode]]: decode + feature-extract one payload → scalar
  *    features (n_bytes, checksum → real content digests, thumb_mean
  *    → real thumbnail statistics).
  *  - [[phash]]: 64-bit perceptual signature. The stub keeps aHash's
  *    structure over raw bytes; a real codec feeds 8×8 DCT
  *    coefficients of the decoded image into the same
  *    block-mean-vs-global-mean bit rule. Downstream 16-bit-block LSH
  *    bucketing only assumes "near-dup ⇒ small hamming distance".
  *  - [[resize]]: target geometry + scale factors (+ the resampled
  *    payload size; the stub fakes the resample as a byte-count
  *    contraction).
  *  - [[frames]]: one-to-many frame sampling (the flatMap shape a
  *    video pipeline uses).
  *  - [[embed]]: payload → unit-norm embedding (the stub folds bytes
  *    into 64 dims; a real encoder runs the model). Identical
  *    payloads MUST map to identical vectors — mm_embed_knn's
  *    determinism relies on it.
  *
  * Implementations must be Serializable: the codec instance is
  * captured into the task closure at PLAN BUILD time (so one query
  * never mixes codecs mid-flight) and shipped to executors.
  */
trait MediaCodec extends Serializable {
  def decode(r: MMIn): MMFeat
  def phash(r: MMIn): MMHash
  def resize(r: MMIn): MMResized
  def frames(r: MMIn): Seq[MMFrame]
  def embed(r: MMIn): MMVec
}

/** The default deterministic STUB codec — real Spark plumbing, fake
  * byte arithmetic (the image/audio libs aren't in this container).
  * Deterministic by design so every mm_* entry stays DuckDB-oracled;
  * the oracle SQL in MultimodalOps.entries re-derives exactly this
  * arithmetic.
  */
object StubMediaCodec extends MediaCodec {

  /** Byte-sum checksum and a fake "thumbnail mean". */
  def decode(r: MMIn): MMFeat = {
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
    MMFeat(r.doc_id, r.payload.length.toLong, sum,
      if (r.payload.isEmpty) 0.0 else sum.toDouble / r.payload.length)
  }

  /** aHash structure over raw payload bytes: 64 equal-stride blocks,
    * bit i = [block-i mean > whole-payload mean], exact
    * cross-multiplied integer compare (blocksum·nb > total·blocklen).
    */
  def phash(r: MMIn): MMHash = {
    val nb = r.payload.length
    val stride = math.max(nb / 64, 1)
    var tot = 0L
    var i = 0
    while (i < nb) { tot += (r.payload(i) & 0xff); i += 1 }
    var sig = 0L
    var blk = 0
    while (blk < 64) {
      val st = blk * stride
      val en = math.min(st + stride, nb)
      if (st < nb) {
        var s = 0L
        var j = st
        while (j < en) { s += (r.payload(j) & 0xff); j += 1 }
        if (s * nb > tot * (en - st)) sig |= (1L << blk)
      }
      blk += 1
    }
    MMHash(r.doc_id, sig)
  }

  /** Real scale factors and output geometry for a 256×256 target; the
    * pixel resample is faked as a byte-count contraction.
    */
  def resize(r: MMIn): MMResized = {
    val (tw, th) = (256, 256)
    val sx = if (r.width == 0) 1.0 else tw.toDouble / r.width
    val sy = if (r.height == 0) 1.0 else th.toDouble / r.height
    MMResized(r.doc_id, tw, th, sx, sy,
      math.max(1L, (r.payload.length * sx * sy).toLong))
  }

  /** Fixed-stride frames, every 4th frame's offset + checksum. */
  def frames(r: MMIn): Seq[MMFrame] = {
    val stride = 32
    val nFrames = math.max(r.payload.length / stride, 1)
    (0 until nFrames by 4).map { f =>
      val off = f.toLong * stride
      var sum = 0L
      var i = off.toInt
      val end = math.min(i + stride, r.payload.length)
      while (i < end) { sum += (r.payload(i) & 0xff); i += 1 }
      MMFrame(r.doc_id, f, off, sum)
    }
  }

  /** Payload bytes folded into a deterministic 64-dim unit vector
    * (identical payloads → identical vectors, cosine 1).
    */
  def embed(r: MMIn): MMVec = {
    val v = new Array[Double](64)
    var i = 0
    while (i < r.payload.length) {
      val h = (r.payload(i) & 0xffL) * 2654435761L +
        i.toLong * 0x9e3779b97f4a7c15L
      v(((h % 64) + 64).toInt % 64) += ((h >> 8) & 0xff).toInt - 128
      i += 1
    }
    var norm = 0.0
    var d = 0
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
