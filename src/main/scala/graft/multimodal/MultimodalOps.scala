package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction / resize / frame-sampling run as
  * partition-batched transforms over those bytes.
  *
  * The Spark-side plumbing here is REAL — schema, partition batching,
  * deterministic output contract — while the codec itself is a clearly
  * marked STUB (`stubDecode`): this container ships no image/audio
  * libraries, so the stub derives deterministic pseudo-metadata from
  * the bytes (md5-based). Swapping `stubDecode` for a JNI/javacv codec
  * changes no query shape.
  */
object MultimodalOps {

  // ImageIO's default stream cache is a TEMP FILE per encode/decode —
  // thousands of small images become thousands of file creations. The
  // payloads here are KB-scale, so memory-backed streams are strictly
  // better. JVM-global, set once per executor at class load.
  javax.imageio.ImageIO.setUseCache(false)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = false)))

  /** Build a deterministic media table from the documents table (each
    * text's UTF-8 bytes stand in for an encoded image payload). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/x-graft-stub").as("mime"),
      map(lit("origin"), col("source")).as("meta"))

  /** ==== STUB ==== pretend-decode of a media payload: deterministic
    * pseudo width/height/channels/duration derived from the content
    * hash. Replace with a real codec at deployment; the signature
    * (bytes → fixed-schema features) is the real contract. */
  def stubDecode(bytes: Array[Byte]): (Int, Int, Int, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    def u(i: Int): Long = java.lang.Byte.toUnsignedLong(md(i))
    val h60 = (0 until 8).map(i => u(i) << (8 * (7 - i))).sum >>> 4 // 60 bits
    val width = (h60 % 640).toInt
    val height = ((h60 / 640) % 480).toInt
    val channels = 1 + (h60 % 3).toInt
    (width, height, channels, bytes.length.toLong)
  }

  // ---------------------------------------------------------------------
  // REAL image path — javax.imageio (JDK built-in, no external deps)
  // ---------------------------------------------------------------------

  /** Deterministic REAL PNG per document: geometry derives from doc_id
    * (width 16 + id%32, height 16 + (7·id)%32), pixels from a cheap
    * id-seeded pattern. This is a genuine encoder — the bytes are valid
    * PNG streams — so the decode below exercises a real codec, not the
    * stub. Runs partition-batched like any media transform. */
  /** Shared raster synthesis for the base PNGs and their planted
    * near-dup clones: geometry from the seed id, pixels from a pattern
    * NONLINEAR in (id, x, y) so distinct docs yield genuinely
    * dissimilar images (an affine pattern makes every image the same
    * gradient and the near-dup family degenerate). Long wrap-around is
    * mod 2⁶⁴, and 2²⁴ | 2⁶⁴, so the & matches the oracle's exact
    * HUGEINT product mod 2²⁴. `flipMask` xors the blue channel —
    * 0 for base images, a low bit for clones. */
  private def pngFromPattern(id: Long, flipMask: Int): Array[Byte] = {
    val w = 16 + (id % 32).toInt
    val h = 16 + ((7 * id) % 32).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    // fill the raster's backing byte array directly — setRGB would
    // run a colorspace conversion per pixel (the m04 hot spot)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val s0 = id * 131071L + x * 31L + y * 977L + 7L
        val v = ((s0 * s0 * 2654435761L + s0) & 0xFFFFFFL).toInt
        val i = (y * w + x) * 3
        data(i) = ((v & 0xFF) ^ flipMask).toByte // B
        data(i + 1) = ((v >> 8) & 0xFF).toByte   // G
        data(i + 2) = ((v >> 16) & 0xFF).toByte  // R
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def pngMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    // codec work is CPU-bound per row; the id list arrives in however
    // few partitions the (small) parquet scan produced — spread it
    // across the cluster before encoding (the shuffle moves only ids)
    val parts = spark.sessionState.conf.numShufflePartitions
    val rows = docs.select(col("doc_id")).repartition(parts).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, pngFromPattern(id, 0), "image/png",
          Map("origin" -> "synthetic-png"))
      }
    }
    spark.createDataFrame(rows, mediaSchema)
  }

  /** REAL image decode via ImageIO: width/height from the decoded
    * raster, channels = raster bands. Supports PNG/JPEG/BMP/GIF out of
    * the JDK. Returns null geometry for undecodable payloads (callers
    * route those to the stub). */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else Some((img.getWidth, img.getHeight, img.getRaster.getNumBands))
  }

  /** Image feature extraction with the real codec: image mimes decode
    * through ImageIO; anything else falls back to the (marked) stub. */
  def extractImageFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("decoded", BooleanType, nullable = false)))
    val rows = media.select(col("media_id"), col("media"), col("mime"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val viaCodec =
            if (r.getString(2).startsWith("image/")) decodeImage(bytes) else None
          viaCodec match {
            case Some((w, h, c)) => Row(r.getLong(0), w, h, c, true)
            case None =>
              val (w, h, c, _) = stubDecode(bytes)
              Row(r.getLong(0), w, h, c, false)
          }
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** Feature extraction over media batches: one partition = one batch
    * of payloads through the (stub) codec — the Scala analogue of a
    * pandas-batch UDF, with codegen-friendly surroundings. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("n_bytes", LongType, nullable = false)))
    val rows = media.select(col("media_id"), col("media")).rdd.mapPartitions { it =>
      it.map { r =>
        val (w, h, c, n) = stubDecode(r.getAs[Array[Byte]]("media"))
        Row(r.getLong(0), w, h, c, n)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** REAL image resize via Graphics2D bilinear drawImage (JDK only):
    * decode → scale to target → re-encode PNG. Non-image or
    * undecodable payloads pass through the stub path with
    * `resized = false`. One partition = one batch of codec work,
    * identical shape to [[extractImageFeatures]]. */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media", BinaryType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("resized", BooleanType, nullable = false)))
    val rows = media.select(col("media_id"), col("media"), col("mime"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val src =
            if (r.getString(2).startsWith("image/"))
              Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
            else None
          src match {
            case Some(img) =>
              val out = new java.awt.image.BufferedImage(targetW, targetH,
                java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
              val g = out.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, targetW, targetH, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              Row(r.getLong(0), bos.toByteArray, targetW, targetH, true)
            case None =>
              val budget = math.max(1, math.min(bytes.length, targetW * targetH))
              Row(r.getLong(0), java.util.Arrays.copyOf(bytes, budget),
                targetW, targetH, false)
          }
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** Resize plumbing: emits the target geometry + a (stub) payload of
    * the right byte budget; batch shape identical to a real resampler. */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media", BinaryType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val rows = media.select(col("media_id"), col("media")).rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        // ==== STUB ==== a real resampler produces targetW*targetH*c
        // pixels; the stub truncates/pads the payload to that budget
        val budget = math.max(1, math.min(bytes.length, targetW * targetH))
        Row(r.getLong(0), java.util.Arrays.copyOf(bytes, budget), targetW, targetH)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  // ---------------------------------------------------------------------
  // REAL audio path — javax.sound.sampled (JDK built-in, no external deps)
  // ---------------------------------------------------------------------

  /** Deterministic REAL WAV per document: mono 16 kHz 16-bit PCM whose
    * samples follow the exact-integer sawtooth
    * `s(i) = ((i+1)·k mod 2048) − 1024` with `k = doc_id%7 + 1` and
    * `n = 800 + (doc_id%5)·160` samples. The bytes are a valid RIFF/WAVE
    * stream (44-byte canonical header), so [[audioFeatures]] exercises a
    * real audio codec while the oracle can recompute the sample math
    * directly — any corruption in the encode/decode layer shifts the
    * integer sums and fails the hash. */
  def wavMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media", BinaryType, nullable = false),
      StructField("mime", StringType, nullable = false)))
    val rows = docs.select(col("doc_id")).repartition(col("doc_id"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val k = (id % 7 + 1).toInt
          val n = (800 + (id % 5) * 160).toInt
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = (((i + 1).toLong * k) % 2048 - 1024).toShort
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          Row(id, wavBytes(pcm, 16000, 1), "audio/wav")
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** Canonical 44-byte PCM WAV container around little-endian samples. */
  private def wavBytes(pcm: Array[Byte], rate: Int, channels: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(pcm.length)
      .put(pcm)
    bb.array()
  }

  /** Per-frame audio features over WAV payloads: decode through the
    * real `javax.sound.sampled` codec, then exact integer aggregates
    * per fixed-size frame — sample count, energy (Σs², exact in a
    * long) and strict zero crossings (s·prev < 0). Partition-batched
    * like every media transform; at 100 TB the WAV column rides the
    * same binary-payload scan as images. */
  def audioFeatures(media: DataFrame, frameSamples: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sumsq", LongType, nullable = false),
      StructField("zerocross", LongType, nullable = false)))
    val rows = media.select(col("media_id"), col("media")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("media")))
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"audioFeatures expects mono 16-bit PCM, got $fmt")
        val bytes = in.readAllBytes()
        in.close()
        val bb = java.nio.ByteBuffer.wrap(bytes).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = bytes.length / 2
        (0 until n by frameSamples).map { start =>
          val end = math.min(start + frameSamples, n)
          var sumsq = 0L
          var zc = 0L
          var prev = 0
          var i = start
          while (i < end) {
            val s = bb.getShort(2 * i).toInt
            sumsq += s.toLong * s
            if (i > start && s * prev < 0) zc += 1
            prev = s
            i += 1
          }
          Row(r.getLong(0), start / frameSamples, (end - start).toLong, sumsq, zc)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Frame sampling plumbing for video-like payloads: every `stride`-th
    * fixed-size chunk of the payload becomes a "frame" row (explode
    * shape — one input row → many frame rows). */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val rows = media.select(col("media_id"), col("media")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        val nFrames = math.max(bytes.length / frameBytes, 0)
        (0 until nFrames by stride).map { f =>
          Row(r.getLong(0), f,
            java.util.Arrays.copyOfRange(bytes, f * frameBytes,
              math.min((f + 1) * frameBytes, bytes.length)))
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  // ---------------------------------------------------------------------
  // Perceptual hashing — image near-dup dedup over the REAL codec path
  // ---------------------------------------------------------------------

  /** Near-duplicate PNG variants of [[pngMediaFromDocuments]]: every
    * `mod`-th document gains a clone (media_id = doc_id + idOffset)
    * whose pixels xor bit 2 of the blue channel (±4 gray per pixel).
    * Empirically (full integer replay over the 500-doc corpus) this
    * lands clone pHashes at hamming 0 for ~2/3 of ids, hamming 2 for
    * ~1/4, and hamming 4 for a few — so the near-dup radius (1..3) is
    * genuinely exercised by positives AND the radius boundary drops
    * some pairs, on both engines identically. Geometry and seed come
    * from the BASE id so base and clone rasters align; the
    * perturbation is part of the pixel formula (oracle-replayable),
    * not post-hoc byte editing. */
  def pngMediaClones(docs: DataFrame, mod: Int, idOffset: Long): DataFrame = {
    val spark = docs.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val rows = docs.select(col("doc_id"))
      .filter(col("doc_id") % mod === 0)
      .repartition(parts).rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          Row(id + idOffset, pngFromPattern(id, 4), "image/png",
            Map("origin" -> "synthetic-png-clone"))
        }
      }
    spark.createDataFrame(rows, mediaSchema)
  }

  /** Quantized 32-point DCT-II basis, 16384·cos(π(2x+1)u/64) rounded
    * to the nearest integer — the whole pHash below is exact int64
    * arithmetic on top of it (max |coef| < 2⁴⁸), so two engines can
    * agree bit-for-bit. Rounding safety: the minimum distance of any
    * of the 256 scaled cos values to a .5 boundary is 0.0105, ~10⁹×
    * the cross-engine libm ulp. */
  private val Cq: Array[Array[Long]] = Array.tabulate(8, 32)((u, x) =>
    math.floor(math.cos(math.Pi * (2 * x + 1) * u / 64.0) * 16384.0 + 0.5)
      .toLong)

  /** 64-bit perceptual hash over the REAL decode path (the classic
    * pHash recipe made engine-exact): decode via ImageIO, sample a
    * 32×32 grid by nearest neighbor (integer source coords x·w/32),
    * gray = R+G+B (no division), separable integer DCT-II with the
    * [[Cq]] basis, keep the 8×8 low-frequency block, threshold at the
    * LOWER MEDIAN (sorted index 31 of 64 — no halving, stays integer),
    * bit i = coef(u·8+v) > median. Every step is integer arithmetic,
    * so the DuckDB oracle replays the hash from the pixel formula
    * while the engine computes it from real decoded bytes — a
    * content-level (not just geometry-level) codec fidelity check.
    * Undecodable payloads are dropped. */
  def pHash64(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = false)))
    val rows = media.select(col("media_id"), col("media")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val gray = Array.ofDim[Long](32, 32) // [y][x]
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              val rgb = img.getRGB(x * w / 32, y * h / 32)
              gray(y)(x) = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
                (rgb & 0xFF)
              x += 1
            }
            y += 1
          }
          val rs = Array.ofDim[Long](32, 8) // [y][u] row-transformed
          y = 0
          while (y < 32) {
            var u = 0
            while (u < 8) {
              var s = 0L
              var x = 0
              while (x < 32) { s += gray(y)(x) * Cq(u)(x); x += 1 }
              rs(y)(u) = s
              u += 1
            }
            y += 1
          }
          val coef = new Array[Long](64)
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              var s = 0L
              var yy = 0
              while (yy < 32) { s += rs(yy)(u) * Cq(v)(yy); yy += 1 }
              coef(u * 8 + v) = s
              v += 1
            }
            u += 1
          }
          val med = coef.sorted.apply(31)
          var hash = 0L
          var i = 0
          while (i < 64) {
            if (coef(i) > med) hash |= (1L << i)
            i += 1
          }
          Some(Row(r.getLong(0), hash))
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
