package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media row: opaque bytes + typed metadata. The binary column is never
  * interpreted by Spark itself — only by the (pluggable) decoder. */
case class MediaRecord(
    doc_id: Long,
    media: Array[Byte],
    mime: String,
    width: Int,
    height: Int)

case class MediaFeatures(
    doc_id: Long,
    mime: String,
    byte_len: Long,
    checksum: Long,
    histogram: Array[Float])

/** Real decoded-pixel features: dimensions as the DECODER reports them plus
  * exact per-channel integer sums (integer-exact → engine-portable; a mean
  * would drag IEEE division into the compare). */
case class ImageFeatures(
    doc_id: Long,
    mime: String,
    width: Int,
    height: Int,
    sum_r: Long,
    sum_g: Long,
    sum_b: Long)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing — schema, partition-parallel batched iteration
  * (`mapPartitions` on a typed Dataset, the Scala analog of Python's
  * `mapInPandas`), column pruning of the heavy binary column until the decode
  * stage — is real and tested. IMAGE decode/resize are REAL as of round 12:
  * [[decodeImages]]/[[resizeImages]] run `javax.imageio` (base-JVM PNG/JPEG/
  * GIF/BMP codecs, headless-safe) over genuine encoded streams, verified
  * end-to-end by the mm_decode oracle. [[decodeStub]]/[[resizeStub]] remain
  * for OPAQUE mimes (audio/video, whose codecs the JVM lacks): deterministic
  * byte-level stand-ins around the same pipeline shape — swap in a codec
  * without touching the plumbing.
  */
object Multimodal {

  /** Synthesize a media table from the documents table: UTF-8 bytes of the
    * text stand in for an encoded image; width/height derived from n_chars.
    * Deterministic — mirrored by the DuckDB oracle. */
  def synthesizeFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/x-fake").as("mime"),
      (col("n_chars") % 64 + 1).cast("int").as("width"),
      (col("n_chars") % 48 + 1).cast("int").as("height"))

  /** Metadata-only projection — MUST not read the binary column; at scale the
    * parquet scan prunes `media` entirely (verify via ReadSchema in explain). */
  def metadata(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("mime"), col("width"), col("height"),
      (col("width") * col("height")).as("pixels"))

  /** Decode + feature-extract, batched per partition. REAL pipeline shape,
    * STUB decode: features = 16-bin byte histogram (normalized) + FNV-1a
    * checksum. A real image decoder would produce e.g. CLIP-ready tensors
    * here; everything around it (partitioning, schema, laziness) is what
    * would ship. */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media", "mime", "width", "height").as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val bytes = rec.media
          var h = 0xcbf29ce484222325L // FNV-1a 64
          val hist = new Array[Float](16)
          var i = 0
          while (i < bytes.length) {
            h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
            hist((bytes(i) & 0xff) >> 4) += 1f
            i += 1
          }
          val n = math.max(bytes.length, 1).toFloat
          MediaFeatures(rec.doc_id, rec.mime, bytes.length.toLong, h,
            hist.map(_ / n))
        }
      }
  }

  /** Resize, batched per partition — REAL pipeline shape, STUB kernel:
    * nearest-neighbor subsampling of the byte buffer to targetW×targetH
    * (a real deployment would decode and rescale pixels here). Metadata is
    * updated alongside the payload, as a real resize must. */
  def resizeStub(spark: SparkSession, media: DataFrame,
      targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    media.select("doc_id", "media", "mime", "width", "height").as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val src = rec.media
          val n = targetW * targetH
          val out = new Array[Byte](n)
          if (src.length > 0) {
            var i = 0
            while (i < n) {
              out(i) = src((i.toLong * src.length / n).toInt)
              i += 1
            }
          }
          rec.copy(media = out, width = targetW, height = targetH)
        }
      }
  }

  /** Deterministic per-doc pixel pattern shared by [[synthesizeImages]] (the
    * encoder side) and the mm_decode DuckDB oracle (which replays these
    * integer formulas analytically over a generate_series grid — no image
    * library needed on the oracle side). Kept tiny and integer-only so the
    * expected channel sums are closed-form. */
  private[graft] def patternDims(docId: Long): (Int, Int) =
    ((docId % 16 + 8).toInt, (docId % 12 + 8).toInt)
  private[graft] def patternRgb(docId: Long, x: Int, y: Int): (Int, Int, Int) =
    (((docId * 7 + x * 3 + y * 5) % 256).toInt,
      ((docId + x * 11 + y) % 256).toInt,
      ((docId * 3 + x + y * 13) % 256).toInt)

  /** REAL encoded images from the documents table: each doc_id gets a
    * deterministic RGB pattern rendered into a BufferedImage and encoded as
    * an actual PNG by `javax.imageio` (base-JVM codec, headless-safe). The
    * bytes are a genuine compressed image stream — [[decodeImages]] must run
    * a real decoder to get the pixels back. Partition-parallel narrow map;
    * only doc_id is read from the input. */
  def synthesizeImages(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { docId =>
        val (w, h) = patternDims(docId)
        MediaRecord(docId, renderPng(docId), "image/png", w, h)
      }
    }
  }

  /** javax.imageio defaults to DISK-backed stream caching: every
    * ImageIO.read/write over a byte-array stream creates (and deletes) a
    * temp file via FileCacheImage{Input,Output}Stream. Harmless serially;
    * under a 32-task codec stage the temp-file create/delete storm
    * serializes on the filesystem — r17 profiling measured the video
    * family's summed task time inflating ~100× (blocked on file I/O, not
    * CPU) once the scan-parallelism floor spread the decode across cores.
    * Memory caching produces byte-identical streams; this is a JVM-global
    * toggle evaluated when the object loads (driver AND executors load it
    * through the codec closures). */
  javax.imageio.ImageIO.setUseCache(false)

  /** One deterministic pattern id → one genuine PNG stream — the encode
    * half shared by [[synthesizeImages]] and [[synthesizeVideos]]. */
  private def renderPng(pid: Long): Array[Byte] =
    renderPng(pid, (x, y) => patternRgb(pid, x, y))

  private def renderPng(pid: Long,
      rgbOf: (Int, Int) => (Int, Int, Int)): Array[Byte] =
    renderImage(pid, "png", rgbOf)

  /** The format-parameterized encode core behind [[renderPng]] and the JPEG
    * synthesizer — one pixel loop, any codec `javax.imageio` writes. */
  private def renderImage(pid: Long, format: String,
      rgbOf: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val (w, h) = patternDims(pid)
    renderImageDims(w, h, format, rgbOf)
  }

  /** Per-thread cached ImageWriter per format: `ImageIO.write` performs a
    * SYNCHRONIZED plugin-registry lookup (`getImageWritersByFormatName`
    * walks the IIORegistry under its category lock) plus a writer
    * instantiation on EVERY call — r17 measured the JPEG-encode family
    * (mm_decode_jpeg, mm_dedup) inflating per-task under 32-way concurrency
    * exactly there once the scan floor spread the encode across cores. A
    * task thread reuses one writer per format for its whole partition; the
    * emitted stream is byte-identical (same writer class, default write
    * params, fresh output stream per image). Writers are never disposed —
    * one per (executor thread, format), bounded and reusable for the
    * executor's lifetime. */
  private val writerCache =
    new ThreadLocal[java.util.HashMap[String, javax.imageio.ImageWriter]] {
      override def initialValue() =
        new java.util.HashMap[String, javax.imageio.ImageWriter]()
    }

  private def cachedWriter(format: String): javax.imageio.ImageWriter = {
    val cache = writerCache.get()
    var w = cache.get(format)
    if (w == null) {
      val it = javax.imageio.ImageIO.getImageWritersByFormatName(format)
      require(it.hasNext, s"no javax.imageio writer for format '$format'")
      w = it.next()
      cache.put(format, w)
    }
    w
  }

  /** The dims-explicit encode core (the gradient fixture picks its own
    * sizes; everything else derives them from the pattern id). */
  private def renderImageDims(w: Int, h: Int, format: String,
      rgbOf: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = rgbOf(x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    encodeImage(img, format)
  }

  /** Encode via the thread-cached writer — the byte-stream contract of
    * `ImageIO.write(img, format, stream)` (memory-cached output stream,
    * default write params), minus its per-call registry lookup. */
  private def encodeImage(img: java.awt.image.BufferedImage,
      format: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    val writer = cachedWriter(format)
    try {
      writer.setOutput(ios)
      writer.write(img)
    } finally {
      writer.setOutput(null)
      ios.close()
    }
    bos.toByteArray
  }

  /** REAL encoded JPEGs — the codec-agnostic proof of the decode plane: the
    * same plumbing as [[synthesizeImages]] (narrow map, only doc_id read,
    * genuine `javax.imageio` streams) through a LOSSY codec. Because JPEG
    * decode is not bit-analytic, correctness is pinned the mm_dedup way
    * instead: the pattern is the QUADRATIC [[framePatternRgb]] (pid-keyed
    * coefficients — near-planar gradients would quantize to colliding
    * content), planted duplicate groups share one encoded stream, and the
    * gate checks the planted group structure (decoded content keyed), which
    * no analytic oracle needs pixel values for. */
  def synthesizeImagesJpeg(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { docId =>
        val (w, h) = patternDims(docId)
        MediaRecord(docId,
          renderImage(docId, "jpg", (x, y) => framePatternRgb(docId, x, y)),
          "image/jpeg", w, h)
      }
    }
  }

  /** REAL image decode + feature extraction (closes the round-11 stub gap):
    * `javax.imageio.ImageIO.read` decodes PNG/JPEG/GIF/BMP bytes to pixels;
    * features are the decoder-reported dimensions and exact per-channel
    * integer sums. Rows whose bytes the JVM cannot decode (unsupported mime,
    * truncated stream) yield a (-1, -1, 0, 0, 0) sentinel row rather than
    * failing the stage — at 100 TB a corrupt image must never kill the job
    * (same drop-don't-throw stance as the JSON corrupt-record path).
    *
    * Pipeline shape unchanged from the stub it replaces: typed-Dataset
    * `mapPartitions` (the Scala analog of `mapInPandas`), binary column
    * pruned until this stage, partition-parallel, zero shuffles. PNG is
    * lossless, so decoding [[synthesizeImages]]' output recovers the pattern
    * pixels EXACTLY — which is what lets a SQL oracle verify a codec path
    * end-to-end without having a codec. */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media", "mime", "width", "height").as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rec.media))
            catch { case _: java.io.IOException => null }
          if (img == null)
            ImageFeatures(rec.doc_id, rec.mime, -1, -1, 0L, 0L, 0L)
          else {
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xff
                sg += (rgb >> 8) & 0xff
                sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            ImageFeatures(rec.doc_id, rec.mime,
              img.getWidth, img.getHeight, sr, sg, sb)
          }
        }
      }
  }

  /** REAL bilinear resize (replaces the byte-subsampling stub for decodable
    * images): decode, Java2D `drawImage` with the BILINEAR interpolation
    * hint onto a targetW×targetH canvas, re-encode as PNG. Undecodable rows
    * pass through unchanged (same survive-don't-throw stance as
    * [[decodeImages]]); metadata is updated alongside the payload, as a real
    * resize must. Partition-parallel narrow map — the heavy binary column
    * stays pruned until this stage. */
  def resizeImages(spark: SparkSession, media: DataFrame,
      targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    require(targetW >= 1 && targetH >= 1,
      s"target dims must be >= 1, got ${targetW}x$targetH")
    import spark.implicits._
    media.select("doc_id", "media", "mime", "width", "height").as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rec.media))
            catch { case _: java.io.IOException => null }
          if (img == null) rec
          else {
            val out = new java.awt.image.BufferedImage(
              targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g2 = out.createGraphics()
            try {
              g2.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g2.drawImage(img, 0, 0, targetW, targetH, null)
            } finally g2.dispose()
            rec.copy(media = encodeImage(out, "png"),
              width = targetW, height = targetH)
          }
        }
      }
  }

  /** 64-bit perceptual average-hash (aHash) from REAL decoded pixels — the
    * image counterpart of [[Dedup.simhash]] for near-duplicate detection:
    * re-encodes, slight crops/scales, and format conversions of the same
    * picture land within a few bits, so `Dedup.hammingPairs` over this
    * column is image near-dup at corpus scale (one banded self-join, never
    * the pair space).
    *
    * All-integer so the hash is bit-identical on any JVM and replayable by
    * the SQL oracle from [[patternRgb]]'s closed form: gray = 299·R + 587·G
    * + 114·B (ITU-R 601 luma ×1000, undivided); the image is cut into the
    * 8×8 grid of blocks block(i,j) ∋ pixels with ⌊x·8/w⌋ = i, ⌊y·8/h⌋ = j;
    * bit j·8+i is set iff the block's mean gray exceeds the global mean,
    * compared as the exact cross-product blockSum·N > totalSum·blockN —
    * never a lossy division. Exact up to ~48 Mpixel images (the
    * cross-product's i64 budget: 4000·(wh)² < 2⁶³); undecodable rows get
    * the −1 sentinel, same survive-don't-throw stance as [[decodeImages]].
    * Narrow partition-parallel map; only (doc_id, phash) ever shuffles. */
  def imageAHash(spark: SparkSession, media: DataFrame): Dataset[(Long, Long)] = {
    import spark.implicits._
    media.select("doc_id", "media", "mime", "width", "height").as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rec.media))
            catch { case _: java.io.IOException => null }
          if (img == null) (rec.doc_id, -1L)
          else (rec.doc_id, aHashOf(img))
        }
      }.toDF("doc_id", "phash").as[(Long, Long)]
  }

  /** The all-integer 8×8 average-hash of one decoded image — the signature
    * half shared by [[imageAHash]] (whole images) and [[decodeFrames]]
    * (per-frame). Semantics exactly as documented on [[imageAHash]]. */
  private def aHashOf(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val blockSum = new Array[Long](64)
    val blockN = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val j = y * 8 / h
      var x = 0
      while (x < w) {
        val i = x * 8 / w
        val rgb = img.getRGB(x, y)
        val gray = ((rgb >> 16) & 0xff) * 299L +
          ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L
        blockSum(j * 8 + i) += gray
        blockN(j * 8 + i) += 1
        total += gray
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (blockSum(b) * n > total * blockN(b)) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Integer 32-point DCT-II cosine table for [[imagePHashDct]]:
    * C(k)(n) = round(cos(π·(2n+1)·k / 64) · 2¹⁴) for k ∈ 0..7 (only the low
    * 8 frequencies are ever read), n ∈ 0..31. SINGLE SOURCE for both
    * engines: the DuckDB oracle embeds these exact values as literals at
    * oracle-build time (SparkEntry reads this array), so no trig function
    * is ever evaluated twice. */
  private[graft] val DctCos: Array[Array[Long]] =
    Array.tabulate(8, 32)((k, n) =>
      Math.round(Math.cos(Math.PI * (2 * n + 1) * k / 64.0) * 16384.0))

  /** 64-bit DCT PERCEPTUAL HASH (pHash) from REAL decoded pixels — the
    * robust tier above [[imageAHash]]: aHash thresholds 8×8 BLOCK MEANS
    * against the global mean, so every near-planar gradient collapses to
    * the same half-plane mask (the r14 fixture lesson) and distinct gentle
    * gradients false-merge; pHash thresholds the low-frequency DCT
    * STRUCTURE, which encodes gradient direction and curvature mix, so
    * those scenes separate while re-renders of the same scene (rescales,
    * re-encodes) still land within a few bits.
    *
    * All-integer and bit-replayable by the SQL oracle: 32×32
    * nearest-neighbor luma grid (gray = 299R+587G+114B, ×1000 undivided;
    * source pixel (⌊i·w/32⌋, ⌊j·h/32⌋) — exact for any w, h), separable
    * 2-D DCT-II with the fixed-point [[DctCos]] table (terms bounded by
    * 2⁵⁶ — exact longs), then bit u·8+v set iff F(u,v) exceeds the MEDIAN
    * of the 63 AC coefficients (element 31 of the ascending sort — a real
    * element, never an averaged midpoint; DC is excluded and its bit
    * always 0, the standard pHash discipline making the hash
    * brightness-invariant). Undecodable rows get the −1 sentinel.
    * Narrow partition-parallel map; only (doc_id, phash) ever shuffles. */
  def imagePHashDct(spark: SparkSession, media: DataFrame): Dataset[(Long, Long)] = {
    import spark.implicits._
    media.select("doc_id", "media", "mime", "width", "height").as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rec.media))
            catch { case _: java.io.IOException => null }
          if (img == null) (rec.doc_id, -1L)
          else (rec.doc_id, pHashDctOf(img))
        }
      }.toDF("doc_id", "phash").as[(Long, Long)]
  }

  /** The integer DCT hash of one decoded image — semantics as documented
    * on [[imagePHashDct]]. */
  private[graft] def pHashDctOf(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    // 32×32 nearest-neighbor luma grid, ×1000 fixed point
    val g = Array.ofDim[Long](32, 32)
    var j = 0
    while (j < 32) {
      val y = j * h / 32
      var i = 0
      while (i < 32) {
        val x = i * w / 32
        val rgb = img.getRGB(x, y)
        g(j)(i) = ((rgb >> 16) & 0xff) * 299L +
          ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L
        i += 1
      }
      j += 1
    }
    // separable integer DCT: t(j)(v) = Σ_i g(j)(i)·C(v)(i);
    // F(u)(v) = Σ_j C(u)(j)·t(j)(v)
    val t = Array.ofDim[Long](32, 8)
    j = 0
    while (j < 32) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var i = 0
        while (i < 32) { s += g(j)(i) * DctCos(v)(i); i += 1 }
        t(j)(v) = s
        v += 1
      }
      j += 1
    }
    val f = Array.ofDim[Long](8, 8)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var jj = 0
        while (jj < 32) { s += DctCos(u)(jj) * t(jj)(v); jj += 1 }
        f(u)(v) = s
        v += 1
      }
      u += 1
    }
    val ac = new Array[Long](63)
    var b = 0
    var k = 0
    while (b < 64) {
      if (b != 0) { ac(k) = f(b / 8)(b % 8); k += 1 }
      b += 1
    }
    java.util.Arrays.sort(ac)
    val med = ac(31)
    var sig = 0L
    b = 1
    while (b < 64) {
      if (f(b / 8)(b % 8) > med) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Deterministic GRADIENT scene family for the pHash-vs-aHash proof —
    * near-planar luma surfaces in NORMALIZED coordinates (so two renders
    * of the same scene at different sizes are genuine rescale near-dups):
    * scene gid ∈ 0..404 decodes to slopes ax, ay ∈ {−1,0,1}, cross term
    * cxy ∈ {−2..2} and curvatures qx, qy ∈ {−1,0,1}; luma(x, y) =
    * clamp(128 + ax·⌊48x/w⌋ + ay·⌊48y/h⌋ + cxy·⌊48xy/(wh)⌋ +
    * qx·⌊48x²/w²⌋ + qy·⌊48y²/h²⌋). Every division is a floor of a
    * NONNEGATIVE quantity with the sign applied OUTSIDE, so Spark, the
    * JVM render loop and DuckDB `//` agree exactly. On this family aHash
    * PROVABLY collapses distinct scenes (e.g. gids 206/356/268 share one
    * aHash at both render sizes) while their pHashes differ by 24+ bits —
    * the OperatorsSpec proof. */
  private[graft] def gradientParams(gid: Long): (Int, Int, Int, Int, Int) =
    ((gid % 3).toInt - 1, ((gid / 3) % 3).toInt - 1,
      ((gid / 9) % 5).toInt - 2, ((gid / 45) % 3).toInt - 1,
      ((gid / 135) % 3).toInt - 1)

  private[graft] def gradientDims(docId: Long): (Int, Int) =
    if (docId % 2 == 0) (16, 16) else (24, 16)

  private[graft] def gradientValue(gid: Long, w: Int, h: Int,
      x: Int, y: Int): Int = {
    val (ax, ay, cxy, qx, qy) = gradientParams(gid)
    val v = 128 + ax * (x * 48 / w) + ay * (y * 48 / h) +
      cxy * (x * y * 48 / (w * h)) + qx * (x * x * 48 / (w * w)) +
      qy * (y * y * 48 / (h * h))
    math.max(0, math.min(255, v))
  }

  /** REAL encoded PNGs of the gradient family: docs pair up — doc 2k and
    * 2k+1 render the SAME scene gid = ⌊doc_id/2⌋ mod 405 at DIFFERENT
    * sizes (16×16 and 24×16), so consecutive docs are planted rescale
    * near-dups. Same narrow-map plumbing as [[synthesizeImages]]. */
  def synthesizeImagesGradient(spark: SparkSession,
      docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { docId =>
        val gid = (docId / 2) % 405
        val (w, h) = gradientDims(docId)
        val png = renderImageDims(w, h, "png", (x, y) => {
          val v = gradientValue(gid, w, h, x, y)
          (v, v, v)
        })
        MediaRecord(docId, png, "image/png", w, h)
      }
    }
  }

  /** Deterministic per-doc PCM parameters shared by [[synthesizeAudio]] and
    * the mm_audio DuckDB oracle (which replays the sample formula
    * analytically over a generate_series — no audio library needed on the
    * oracle side). Integer-only so expected features are closed-form. */
  private[graft] def audioParams(docId: Long): (Int, Int, Int) =
    ((8000 + (docId % 4) * 4000).toInt, // sample rate: 8/12/16/20 kHz
      (1 + docId % 2).toInt,            // channels: mono/stereo
      (docId % 256 + 64).toInt)         // frames per channel
  /** Interleaved 16-bit sample k ∈ [0, frames·channels): a quadratic
    * integer scramble spanning the full signed range. */
  private[graft] def audioSample(docId: Long, k: Int): Int =
    (((docId * 31 + 7L * k * k + 13L * k) % 65536) - 32768).toInt

  /** REAL encoded audio from the documents table: each doc_id gets a
    * deterministic 16-bit PCM waveform wrapped in a genuine RIFF/WAVE
    * container (canonical 44-byte header + little-endian samples, per the
    * public WAVE format) — [[decodeAudio]] must parse the actual chunk
    * structure to get the samples back. Partition-parallel narrow map; only
    * doc_id is read from the input — the audio counterpart of
    * [[synthesizeImages]]. */
  /** One genuine RIFF/WAVE byte stream: canonical 44-byte header + the
    * little-endian samples `sample(k)` for k ∈ [0, frames·ch). */
  private def wavBytes(rate: Int, ch: Int, frames: Int,
      sample: Int => Int): Array[Byte] = {
    val total = frames * ch
    val dataLen = total * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(ch.toShort).putInt(rate)
      .putInt(rate * ch * 2).putShort((ch * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var k = 0
    while (k < total) { buf.putShort(sample(k).toShort); k += 1 }
    buf.array()
  }

  def synthesizeAudio(spark: SparkSession, docs: DataFrame): Dataset[(Long, Array[Byte], String)] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { docId =>
        val (rate, ch, frames) = audioParams(docId)
        (docId, wavBytes(rate, ch, frames, audioSample(docId, _)), "audio/wav")
      }
    }.toDF("doc_id", "media", "mime").as[(Long, Array[Byte], String)]
  }

  /** [[synthesizeAudio]] with a re-encode-style perturbation: each row of
    * `pats(doc_id, pid, nudge)` renders pattern `pid`'s waveform with every
    * sample offset by `nudge`, wrapped exactly in 16-bit two's complement —
    * ((s + nudge + 32768) mod 2¹⁶) − 32768, the integer-exact model of a
    * small DC/gain drift a lossy re-encode introduces. Fingerprints of the
    * nudged copy land within a few bits of the original's (window-energy
    * DIFFERENCES absorb a common offset), which is exactly what
    * [[audioFingerprint]] + `Dedup.hammingPairs` must catch. */
  def synthesizeAudioPerturbed(spark: SparkSession, pats: DataFrame): Dataset[(Long, Array[Byte], String)] = {
    import spark.implicits._
    pats.select(col("doc_id"), col("pid"), col("nudge").cast("int"))
      .as[(Long, Long, Int)].mapPartitions { it =>
        it.map { case (docId, pid, nudge) =>
          val (rate, ch, frames) = audioParams(pid)
          val bytes = wavBytes(rate, ch, frames, k =>
            ((audioSample(pid, k) + nudge + 32768) % 65536 + 65536) % 65536 - 32768)
          (docId, bytes, "audio/wav")
        }
      }.toDF("doc_id", "media", "mime").as[(Long, Array[Byte], String)]
  }

  /** REAL WAV/PCM decode + feature extraction — the audio sibling of
    * [[decodeImages]], same survive-don't-throw stance: a proper RIFF chunk
    * walk (not a fixed-offset peek — extra LIST/fact chunks are skipped like
    * any spec-compliant reader must), 16-bit little-endian PCM samples
    * interpreted exactly, features all integer-exact so the SQL oracle can
    * replay them: frame count, duration_ms = frames·1000 div rate, Σ sample
    * and Σ sample² (the un-divided mean-amplitude / RMS-energy numerators).
    * Undecodable rows (bad magic, truncated chunk, non-PCM, non-16-bit)
    * yield a -1-sentinel row rather than failing the stage. Pipeline shape:
    * typed-Dataset `mapPartitions`, binary column pruned until this stage,
    * partition-parallel, zero shuffles. */
  /** Decoded PCM: format fields + the interleaved 16-bit samples. */
  private[graft] final case class Pcm(rate: Int, channels: Int, bits: Int,
      samples: Array[Short])

  /** The RIFF/WAVE chunk walk shared by [[decodeAudio]] and
    * [[audioFingerprint]]: a spec-compliant reader (skips unknown chunks,
    * honors word alignment, never trusts the RIFF header size), returning
    * null for anything it can't decode (bad magic, truncated chunk,
    * non-PCM, non-16-bit). */
  private[graft] def parsePcm(bytes: Array[Byte]): Pcm =
    try {
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      if (tag() != "RIFF") return null
      buf.getInt // riff payload size — trust the chunk walk, not this
      if (tag() != "WAVE") return null
      var fmtOk = false
      var ch = 0; var rate = 0; var bits = 0
      var samples: Array[Short] = null
      while (buf.remaining() >= 8) {
        val id = tag()
        val len = buf.getInt
        if (len < 0 || len > buf.remaining()) return null
        val next = buf.position() + len + (len & 1) // chunks are word-aligned
        id match {
          case "fmt " =>
            val fmt = buf.getShort
            ch = buf.getShort
            rate = buf.getInt
            buf.getInt; buf.getShort // byteRate, blockAlign
            bits = buf.getShort
            fmtOk = fmt == 1 && bits == 16 && ch >= 1 && rate >= 1
          case "data" if fmtOk && samples == null =>
            val n = len / 2
            samples = new Array[Short](n)
            var i = 0
            while (i < n) { samples(i) = buf.getShort; i += 1 }
          case _ => ()
        }
        buf.position(math.min(next, buf.limit()))
      }
      if (!fmtOk || samples == null) null else Pcm(rate, ch, bits, samples)
    } catch { case _: RuntimeException => null }

  def decodeAudio(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (docId, bytes) =>
          val pcm = parsePcm(bytes)
          if (pcm == null) (docId, -1, -1, -1, -1L, -1L, 0L, 0L)
          else {
            var sumAmp = 0L; var sumSq = 0L
            var i = 0
            while (i < pcm.samples.length) {
              val s = pcm.samples(i).toLong
              sumAmp += s; sumSq += s * s; i += 1
            }
            val frames = pcm.samples.length.toLong / pcm.channels
            (docId, pcm.rate, pcm.channels, pcm.bits, frames,
              frames * 1000L / pcm.rate, sumAmp, sumSq)
          }
        }
      }.toDF("doc_id", "sample_rate", "channels", "bits", "n_frames",
        "duration_ms", "sum_amp", "sum_sq")
  }

  /** [[synthesizeAudio]] with a PLANTED mid-clip silence span — the VAD
    * fixture: interleaved sample k is zeroed for q1 ≤ k < q2 where
    * q1 = total/4 + docId%8 and q2 = total/2 + docId%8 (integer division,
    * per-doc jitter so span edges don't all land on window boundaries),
    * every other sample is the full-range [[audioSample]] scramble. The
    * result is speech–silence–speech with exactly known extents, closed
    * form in docId alone — the oracle replays it analytically. */
  def synthesizeAudioSilence(spark: SparkSession,
      docs: DataFrame): Dataset[(Long, Array[Byte], String)] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { docId =>
        val (rate, ch, frames) = audioParams(docId)
        val total = frames * ch
        val q1 = total / 4 + (docId % 8).toInt
        val q2 = total / 2 + (docId % 8).toInt
        (docId, wavBytes(rate, ch, frames, k =>
          if (k >= q1 && k < q2) 0 else audioSample(docId, k)), "audio/wav")
      }
    }.toDF("doc_id", "media", "mime").as[(Long, Array[Byte], String)]
  }

  /** FRAME-ENERGY VAD SEGMENTATION — the audio quality-filter tier (the
    * silence/speech structure a speech-data pipeline gates on: drop
    * dead-air clips, bill only voiced seconds, cut long recordings at
    * pauses). The same RIFF chunk walk as [[decodeAudio]] ([[parsePcm]]),
    * then the interleaved samples cut into fixed `win`-sample windows
    * (last window partial), window energy E(w) = Σ s² as an exact long,
    * window w is SPEECH iff E(w) > thrMeanSq · n_w (an exact long-by-long
    * compare — thrMeanSq is the mean-square threshold, so partial windows
    * are judged by the same per-sample bar), and consecutive same-class
    * windows merge into spans.
    *
    * One row per span: (doc_id, span (0-based in time order), is_speech,
    * start_sample (interleaved index), n_samples, sum_sq,
    * start_ms = (start_sample div ch)·1000 div rate — all integer
    * divisions, so any engine replays the table bit-for-bit).
    * Undecodable rows emit the −1 sentinel span.
    *
    * Scale shape: a typed mapPartitions flatMap over the scan — the
    * decode, windowing and span merge all happen where the bytes are
    * read; ZERO shuffles, output is span-sized (≪ sample-sized). */
  def vadSegments(spark: SparkSession, media: DataFrame, win: Int,
      thrMeanSq: Long): DataFrame = {
    import spark.implicits._
    require(win >= 1, s"win must be >= 1, got $win")
    require(thrMeanSq >= 0, s"thrMeanSq must be >= 0, got $thrMeanSq")
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (docId, bytes) =>
          val pcm = parsePcm(bytes)
          if (pcm == null)
            Iterator.single((docId, -1L, false, -1L, -1L, -1L, -1L))
          else {
            val total = pcm.samples.length
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Boolean, Long, Long, Long, Long)]
            var span = 0L
            var curSpeech = false
            var curStart = 0L; var curN = 0L; var curSum = 0L
            def flush(): Unit = if (curN > 0) {
              out += ((docId, span, curSpeech, curStart, curN, curSum,
                (curStart / pcm.channels) * 1000L / pcm.rate))
              span += 1
            }
            var w0 = 0
            while (w0 < total) {
              val n = math.min(win, total - w0)
              var e = 0L
              var i = 0
              while (i < n) {
                val s = pcm.samples(w0 + i).toLong
                e += s * s
                i += 1
              }
              val speech = e > thrMeanSq * n
              if (curN > 0 && speech == curSpeech) { curN += n; curSum += e }
              else {
                flush()
                curSpeech = speech; curStart = w0.toLong
                curN = n; curSum = e
              }
              w0 += win
            }
            flush()
            out.iterator
          }
        }
      }.toDF("doc_id", "span", "is_speech", "start_sample", "n_samples",
        "sum_sq", "start_ms")
  }

  /** Per-document VOICED-FRACTION rollup of [[vadSegments]] — the audio
    * quality FILTER number (the langId/qualityScore analog for speech
    * data: gate dead-air clips, bill voiced seconds): span count, voiced
    * and total sample counts (exact longs) and speech_ratio as ONE
    * division. Undecodable docs (the −1 sentinel span) report
    * n_spans = 0 with NULL ratio — distinguishable from a genuinely
    * all-silent clip (ratio 0.0). One map-side-combined exchange over the
    * span-sized relation. */
  def vadSpeechRatio(spark: SparkSession, media: DataFrame, win: Int,
      thrMeanSq: Long): DataFrame =
    vadSegments(spark, media, win, thrMeanSq)
      .groupBy("doc_id")
      .agg(
        sum(when(col("span") >= 0L, 1L).otherwise(0L)).as("n_spans"),
        sum(when(col("span") >= 0L && col("is_speech"), col("n_samples"))
          .otherwise(0L)).as("speech_samples"),
        sum(when(col("span") >= 0L, col("n_samples")).otherwise(0L))
          .as("total_samples"))
      .withColumn("speech_ratio",
        when(col("total_samples") > 0L,
          col("speech_samples").cast("double") /
            col("total_samples").cast("double")))

  /** Per-SHARD ADDITIVE VAD partial — the streaming-manifest shape for the
    * audio quality plane: the [[vadSpeechRatio]] per-doc stats collapsed
    * onto pmod(hashRaw(doc_id), numShards) shards as PURE LONG SUMS (doc /
    * undecodable / span / voiced-sample / total-sample counts). Every
    * column is a commutative monoid over document rows, and each audio doc
    * arrives exactly once on an append stream (the manifest contract), so
    * per-batch partials folded through [[graft.streaming.GenStore]] land
    * BIT-IDENTICALLY on the one-shot [[vadShardRollup]] of all rows seen.
    * Undecodable docs (n_spans = 0 from the −1 sentinel) count in n_docs
    * and n_undecodable but contribute no samples.
    *
    * Scale shape: the codec walk stays where the bytes are (zero
    * shuffles); the only exchange carries numShards rows of longs. */
  def vadShardPartial(spark: SparkSession, media: DataFrame, win: Int,
      thrMeanSq: Long, numShards: Int, seed: Long = 42): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    vadSpeechRatio(spark, media, win, thrMeanSq)
      .groupBy(pmod(Sampling.hashRaw(col("doc_id"), seed),
        lit(numShards.toLong)).as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_spans") === 0L, 1L).otherwise(0L)).as("n_undecodable"),
        sum("n_spans").as("n_spans"),
        sum("speech_samples").as("speech_samples"),
        sum("total_samples").as("total_samples"))
  }

  /** Finish a (possibly accumulated) [[vadShardPartial]] relation: the
    * per-shard voiced fraction as ONE division of exact longs; NULL when
    * the shard carries no decodable samples. */
  def vadShardFinish(acc: DataFrame): DataFrame =
    acc.withColumn("speech_ratio",
      when(col("total_samples") > 0L,
        col("speech_samples").cast("double") /
          col("total_samples").cast("double")))

  /** One-shot per-shard VAD quality rollup — partial + finish; the batch
    * twin the streaming sink ([[graft.streaming.StreamingVad]]) must land
    * on bit-identically. */
  def vadShardRollup(spark: SparkSession, media: DataFrame, win: Int,
      thrMeanSq: Long, numShards: Int, seed: Long = 42): DataFrame =
    vadShardFinish(
      vadShardPartial(spark, media, win, thrMeanSq, numShards, seed))

  /** 64-bit audio fingerprint from REAL decoded PCM — the audio sibling of
    * [[imageAHash]], in the energy-difference-sign family of Haitsma &
    * Kalker 2002 ("A highly robust audio fingerprinting system", the
    * band-energy-difference sign bits), time-domain formulation so every
    * bit is integer-exact and the SQL oracle replays it analytically from
    * the PCM formula: the interleaved samples are cut into 65 pigeonhole
    * time windows (sample k → window k·65 div total, the [[imageAHash]]
    * block mapping), window energy E(w) = Σ s² (exact long), and bit w is
    * set iff E(w) > E(w+1) — re-encodes, small gain changes and trailing
    * padding flip few bits, so `Dedup.hammingPairs` over this column is
    * audio near-dup at corpus scale (one banded equi-join, never the pair
    * space). Undecodable rows get the −1 sentinel. Narrow
    * partition-parallel map; only (doc_id, afp) ever shuffles. */
  def audioFingerprint(spark: SparkSession, media: DataFrame): Dataset[(Long, Long)] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (docId, bytes) =>
          val pcm = parsePcm(bytes)
          if (pcm == null) (docId, -1L)
          else {
            val total = pcm.samples.length
            val e = new Array[Long](65)
            var k = 0
            while (k < total) {
              val s = pcm.samples(k).toLong
              // k·65 in LONG: a 12-minute 44.1 kHz clip already overflows
              // the int product
              e((k.toLong * 65 / total).toInt) += s * s
              k += 1
            }
            var sig = 0L
            var w = 0
            while (w < 64) {
              if (e(w) > e(w + 1)) sig |= (1L << w)
              w += 1
            }
            (docId, sig)
          }
        }
      }.toDF("doc_id", "afp").as[(Long, Long)]
  }

  // ------------------------------------------------- multi-frame containers

  /** Pattern BASE of a synthesized video — doc_id % 7 == 3 renders its
    * predecessor's video (the mm_dedup planted-duplicate discipline:
    * duplicate groups stay BOUNDED — pairs/triples — so near-dup pair
    * count scales linearly with the corpus, the way real crawl duplication
    * does; a modulus-class fixture would grow quadratic duplicate groups
    * and the pair space with them). */
  private[graft] def videoPatternBase(docId: Long): Long =
    docId - (if (docId % 7 == 3) 1L else 0L)

  /** Deterministic per-(doc, frame) pattern id shared by [[synthesizeVideos]]
    * and the mm_frames_* DuckDB oracles. The affine scramble (odd
    * multiplier → bijective mod 2³¹) decorrelates consecutive pattern ids:
    * unscrambled, the gradient patterns of neighboring ids produce aHashes
    * within a few bits of each other and the near-dup query drowns in
    * incidental collisions (~23k at sf0.01, quadratic beyond). The base is
    * reduced mod 2³¹ BEFORE the scramble so the int64 product bound holds
    * for ANY doc_id (unreduced, doc_id ≳ 5·10⁸ overflows: Scala would wrap
    * to a negative pid while DuckDB raises — divergent failures at large
    * scale factors); at every generated SF the reduction is the identity,
    * so pattern ids are unchanged. Both mods stay inside 2³¹, keeping every
    * product < 2⁶² on both engines. */
  private[graft] def framePatternId(docId: Long, f: Int): Long =
    ((((videoPatternBase(docId) % (1L << 31)) * 8 + f) % (1L << 31)) *
      1103515245L + 12345L) % (1L << 31)

  /** Frames per synthesized video: 2..4, deterministic, keyed on the
    * pattern base so a planted duplicate matches its original in LENGTH
    * too (a video dup must dup the whole container). */
  private[graft] def frameCount(docId: Long): Int =
    (videoPatternBase(docId) % 3 + 2).toInt

  /** Frame pixel pattern — quadratic in (x, y) with PID-DEPENDENT
    * coefficients, unlike the near-planar [[patternRgb]] gradients. Two
    * measured failure modes forced this shape: (1) an 8×8 average-hash of
    * a planar field realizes only the few sign patterns a plane
    * orientation allows (1500 gradient frames → 334 distinct hashes, ~20k
    * incidental hamming≤3 pairs at sf0.001, quadratic blowup at scale);
    * (2) a pid that enters only ADDITIVELY shifts every pixel's gray
    * equally, which the mean-vs-mean comparison cancels — the hash
    * degenerates to a function of the dims alone (measured: classes of
    * ~10 = the pids sharing a dim class). Coefficients keyed on pid give
    * each pattern its own block-mean landscape, so near-dup pairs are the
    * PLANTED ones plus a ~0 iid-collision tail. All-Long arithmetic,
    * replayed analytically by the mm_frames_* mirrors. */
  private[graft] def framePatternRgb(pid: Long, x: Int, y: Int): (Int, Int, Int) =
    (((pid * 7 + (3 + pid % 5) * x * x + (5 + pid % 7) * y * y + x.toLong * y) % 256).toInt,
      ((pid + (11 + pid % 3) * x * x + y.toLong * y + (7 + pid % 11) * x) % 256).toInt,
      ((pid * 3 + x.toLong * x + (13 + pid % 13) * y * y + (5 + pid % 2) * x * y) % 256).toInt)

  /** REAL multi-frame containers from the documents table: each doc_id
    * becomes a "video" of [[frameCount]] genuine PNG streams concatenated
    * back-to-back — every frame an actual javax.imageio-encoded image of
    * the [[framePatternId]] pattern. [[decodeFrames]] must run a real
    * chunk walk + a real decoder per frame to get anything back.
    * Partition-parallel narrow map; only doc_id is read. */
  def synthesizeVideos(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { docId =>
        val n = frameCount(docId)
        val bos = new java.io.ByteArrayOutputStream()
        var f = 0
        while (f < n) {
          val pid = framePatternId(docId, f)
          bos.write(renderPng(pid, (x, y) => framePatternRgb(pid, x, y)))
          f += 1
        }
        (docId, bos.toByteArray, "video/x-png-seq", n)
      }
    }.toDF("doc_id", "media", "mime", "n_frames")
  }

  /** Walk a concatenated-PNG container into its frame byte slices — a REAL
    * format walk (the [[parsePcm]] discipline, applied to the PNG spec):
    * verify the 8-byte PNG signature, then hop chunk to chunk (big-endian
    * u32 length, 4-byte type, data, CRC) until IEND closes the frame;
    * repeat until the blob is exhausted. Trailing garbage or a malformed
    * chunk ends the walk with the frames parsed so far — at 100 TB a
    * truncated container must never kill the job (the [[decodeImages]]
    * survive-don't-throw stance). */
  private[graft] def splitPngFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def hasSig(p: Int): Boolean = {
      var i = 0
      while (i < 8) { if (bytes(p + i) != sig(i)) return false; i += 1 }
      true
    }
    def u32(i: Int): Long =
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var p = 0
    var live = true
    while (live && p + 8 <= bytes.length && hasSig(p)) {
      var q = p + 8
      var closed = false
      while (live && !closed) {
        if (q + 8 > bytes.length) live = false
        else {
          val len = u32(q)
          val next = q + 8L + len + 4L // length + type + data + CRC
          if (next > bytes.length) live = false
          else {
            closed = bytes(q + 4) == 'I' && bytes(q + 5) == 'E' &&
              bytes(q + 6) == 'N' && bytes(q + 7) == 'D'
            q = next.toInt
          }
        }
      }
      if (closed) { out += java.util.Arrays.copyOfRange(bytes, p, q); p = q }
    }
    out.toSeq
  }

  /** REAL multi-frame decode — the modality-completing replacement for the
    * byte-striding stub: container walk ([[splitPngFrames]]) → genuine PNG
    * decode per frame → decoder-reported dims, exact integer channel sums,
    * and the [[imageAHash]] signature per frame (`fhash`), ready for
    * frame-level near-dup via `Dedup.hammingPairs`. A frame the JVM cannot
    * decode keeps its slot with the −1/0 sentinel row. Codec work belongs
    * in `mapPartitions`; the heavy binary column dies inside the stage —
    * only (doc_id, frame_idx, dims, sums, fhash) rows ever leave it. */
  /** SCENE-CHANGE KEYFRAME SELECTION — the video analog of [[vadSegments]]
    * (there: speech vs silence by window energy; here: cut vs continuation
    * by inter-frame change): per video, each frame's L1 channel-sum delta
    * against its predecessor, and the keyframe flag — frame 0 always
    * (delta NULL, the no-predecessor convention) plus every frame whose
    * delta exceeds `thr`. This is the standard cheap scene-cut detector a
    * frame-sampling pipeline runs BEFORE expensive per-frame featurizing:
    * sample keyframes, skip the near-static continuation frames.
    *
    * Output: (doc_id, frame_idx, delta, is_key) — exact long arithmetic
    * over [[decodeFrames]]' channel sums, so the analytic oracle replays
    * the decision per frame.
    *
    * Scale shape: the container walk + PNG decode run where the bytes are
    * ([[decodeFrames]] — the binary column dies inside the stage); the lag
    * window rides ONE doc-keyed exchange of (doc, frame, 3 longs) rows —
    * frames-per-video-sized partitions, never corpus-wide. */
  def keyframeSelect(spark: SparkSession, media: DataFrame,
      thr: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    decodeFrames(spark, media)
      .select(col("doc_id"), col("frame_idx"),
        (abs(col("sum_r") - lag("sum_r", 1).over(w)) +
          abs(col("sum_g") - lag("sum_g", 1).over(w)) +
          abs(col("sum_b") - lag("sum_b", 1).over(w))).as("delta"))
      .withColumn("is_key",
        when(col("delta").isNull || col("delta") > thr, 1L).otherwise(0L))
  }

  def decodeFrames(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (docId, bytes) =>
          splitPngFrames(bytes).iterator.zipWithIndex.map { case (fb, f) =>
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
              catch { case _: java.io.IOException => null }
            if (img == null) (docId, f.toLong, -1L, -1L, 0L, 0L, 0L, -1L)
            else {
              var (sr, sg, sb) = (0L, 0L, 0L)
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  sr += (rgb >> 16) & 0xff
                  sg += (rgb >> 8) & 0xff
                  sb += rgb & 0xff
                  x += 1
                }
                y += 1
              }
              (docId, f.toLong, img.getWidth.toLong, img.getHeight.toLong,
                sr, sg, sb, aHashOf(img))
            }
          }
        }
      }.toDF("doc_id", "frame_idx", "width", "height",
        "sum_r", "sum_g", "sum_b", "fhash")
  }

}
