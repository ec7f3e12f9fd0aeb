package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column machinery: media travel as opaque `binary` columns
  * next to typed metadata; decode / feature-extract / resize / frame-sample
  * run as partition-local batch transforms (`mapPartitions` over a typed
  * Dataset — Spark's JVM equivalent of the `mapInPandas` batch-UDF shape:
  * one iterator per partition, no per-row scheduling, no shuffle).
  *
  * The image codec is REAL: `decodeReal` decodes PNG/JPEG/GIF/BMP payloads
  * with the JDK's own `javax.imageio.ImageIO` (no external libraries
  * needed). `decodeBatch` routes each payload by magic number — recognized
  * image containers go through the real codec, synthetic non-image payloads
  * (e.g. text bytes standing in for media in the TPC-H-shaped testdata) fall
  * back to the deterministic header-arithmetic fake so they stay
  * oracle-checkable. Audio/video containers have no JDK codec, so only
  * their batching shape (frame sampling, chunking) is exercised here.
  */
object Multimodal {
  /** Typed metadata emitted by decode — the schema is the contract. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      channels: Int, format: String, ok: Boolean)

  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** True iff the payload starts with a magic number ImageIO can decode
    * (PNG / JPEG / GIF / BMP — the JDK's built-in readers). */
  def isRealImage(p: Array[Byte]): Boolean =
    p.length >= 8 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
      (p(0) == 'B' && p(1) == 'M'))

  /** REAL codec boundary: decode an image payload with the JDK's
    * `javax.imageio.ImageIO` (PNG/JPEG/GIF/BMP readers ship in the JDK).
    * Returns `ok = false` (zero dims) for payloads no reader accepts;
    * channels = raster band count (1 gray, 3 RGB, 4 RGBA); format = the
    * reader's format name lowercased ("png", "jpeg", ...). */
  def decodeReal(docId: Long, payload: Array[Byte]): MediaMeta = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (readers == null || !readers.hasNext)
        MediaMeta(docId, payload.length, 0, 0, 0, "unknown", ok = false)
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          val img = r.read(0)
          MediaMeta(docId, payload.length, img.getWidth, img.getHeight,
            img.getRaster.getNumBands, r.getFormatName.toLowerCase, ok = true)
        } catch {
          case _: java.io.IOException =>
            MediaMeta(docId, payload.length, 0, 0, 0, "corrupt", ok = false)
        } finally r.dispose()
      }
    } finally in.close()
  }

  /** Deterministic tiny real image, encoded with `ImageIO.write` — fixture
    * generator for the real-decode gate (mm06). Dimensions and pixel type
    * derive from the doc id, so a SQL oracle can predict the decoded
    * metadata arithmetically without being able to decode PNG itself:
    * width = 1 + id%16, height = 1 + id%12, type cycles RGB/GRAY/ARGB. */
  def syntheticImage(docId: Long): Array[Byte] = {
    import java.awt.image.BufferedImage
    val w = 1 + (docId % 16).toInt
    val h = 1 + (docId % 12).toInt
    val imgType = (docId % 3) match {
      case 0 => BufferedImage.TYPE_INT_RGB
      case 1 => BufferedImage.TYPE_BYTE_GRAY
      case _ => BufferedImage.TYPE_INT_ARGB
    }
    val img = new BufferedImage(w, h, imgType)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, 0xFF000000 | ((docId * 2654435761L + x * 7 + y * 131) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic fake decode: header arithmetic over the payload bytes.
    * Mirrors the mm01_decode_meta SQL so fake results stay oracle-checkable. */
  def decodeFake(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(docId, n,
      width = 16 + (n % 64) * 10,
      height = 16 + ((n / 64) % 48) * 10,
      channels = n % 3 + 1,
      format = (n % 3) match { case 0 => "rgb"; case 1 => "gray"; case _ => "rgba" },
      ok = n > 0)
  }

  /** Batch decode over binary payloads: one partition = one batch iterator.
    * At 100 TB this is the right shape — codec init cost amortizes per
    * partition, rows stream through without materializing the partition. */
  def decodeBatch(rows: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // ImageIO reader discovery is per-call; disabling the on-disk cache
      // once per partition keeps the decode loop allocation-only.
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        if (isRealImage(r.payload)) decodeReal(r.doc_id, r.payload)
        else decodeFake(r.doc_id, r.payload)
      }
    }
  }

  /** "Resize": deterministic byte-subsampling stand-in with real batching. */
  def resizeBatch(rows: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.map { r =>
      // empty in → empty out; max(1, …) only once there is a byte to keep
      // (max(1, 0/4) over an empty payload would index payload(0)).
      val out =
        if (r.payload.isEmpty) Array.emptyByteArray
        else Array.tabulate[Byte](math.max(1, r.payload.length / factor))(
          i => r.payload(i * factor))
      MediaRow(r.doc_id, out)
    })
  }

  /** Frame sampling: every `step`-th fixed-size frame of the payload. */
  def sampleFrames(rows: Dataset[MediaRow], frameBytes: Int, step: Int): DataFrame = {
    val s = rows.sparkSession
    import s.implicits._
    rows.flatMap { r =>
      val nFrames = r.payload.length / frameBytes
      (0 until nFrames by step).map { i =>
        (r.doc_id, i, r.payload.slice(i * frameBytes, (i + 1) * frameBytes))
      }
    }.toDF("doc_id", "frame_idx", "frame")
  }

  /** Per-frame audio feature row: exact integer energy (sum of squared
    * 16-bit samples), so a SQL oracle can reproduce it bit-for-bit. */
  final case class AudioFrame(doc_id: Long, frame_idx: Int, energy: Long)

  /** Deterministic synthetic 16-bit little-endian PCM payload — the audio
    * twin of [[syntheticImage]]: sample k of doc `id` is
    * `((id*31 + k*17) % 4096) - 2048` and the clip holds `256 + id%256`
    * samples, so an arithmetic SQL oracle can predict every decoded sample
    * without parsing bytes. The bytes themselves are the real contract:
    * [[frameEnergy]] must parse them back exactly. */
  def syntheticPcm(docId: Long): Array[Byte] = {
    val n = 256 + (docId % 256).toInt
    val out = new Array[Byte](n * 2)
    var k = 0
    while (k < n) {
      val s = (((docId * 31 + k.toLong * 17) % 4096) - 2048).toInt
      out(2 * k) = (s & 0xFF).toByte
      out(2 * k + 1) = ((s >> 8) & 0xFF).toByte
      k += 1
    }
    out
  }

  /** Deterministic synthetic PCM with SHARED CONTENT across documents —
    * the near-dup fixture for the audio fingerprint gate (mm15): the
    * signal depends on the TRACK `g = id % 7` (not the doc), so documents
    * on the same track are re-encodings of one recording, with a
    * per-doc loudness offset `(id % 3) * 150` standing in for re-mastering
    * and a doc-specific tail length standing in for trailing silence
    * trims. Samples stay well inside int16 (|s| ≤ 2048 + 300). An
    * arithmetic SQL oracle predicts every sample: for k < 256,
    * `((g*131 + k*29) % 4096) - 2048 + (id%3)*150`; the tail (k ≥ 256,
    * `id%5` extra 16-sample blocks) reuses the per-doc [[syntheticPcm]]
    * formula so tails never collide across docs. */
  def syntheticTrackPcm(docId: Long): Array[Byte] = {
    val n = 256 + (docId % 5).toInt * 16
    val g = docId % 7
    val off = (docId % 3).toInt * 150
    val out = new Array[Byte](n * 2)
    var k = 0
    while (k < n) {
      val s =
        if (k < 256) (((g * 131 + k.toLong * 29) % 4096) - 2048).toInt + off
        else (((docId * 31 + k.toLong * 17) % 4096) - 2048).toInt
      out(2 * k) = (s & 0xFF).toByte
      out(2 * k + 1) = ((s >> 8) & 0xFF).toByte
      k += 1
    }
    out
  }

  /** Parse 16-bit little-endian PCM payloads and emit per-frame energy
    * (exact long sum of squared samples) for fixed frames of
    * `frameSamples` samples; a trailing partial frame is dropped. Runs as
    * a partition-local flatMap — the audio-feature batch shape: byte
    * parsing and the energy loop are per-row JVM work with no shuffle, so
    * at 100 TB the stage is scan-bound and embarrassingly parallel. */
  def frameEnergy(rows: Dataset[MediaRow], frameSamples: Int): Dataset[AudioFrame] = {
    import rows.sparkSession.implicits._
    rows.flatMap { r =>
      val nFrames = (r.payload.length / 2) / frameSamples
      (0 until nFrames).map { f =>
        var e = 0L
        var k = f * frameSamples
        val end = k + frameSamples
        while (k < end) {
          val lo = r.payload(2 * k) & 0xFF
          val hi = r.payload(2 * k + 1).toInt // sign carries from the high byte
          e += ((hi << 8) | lo).toLong * ((hi << 8) | lo)
          k += 1
        }
        AudioFrame(r.doc_id, f, e)
      }
    }
  }

  /** Decoded WAV header row: container metadata + whole-clip energy.
    * `ok = false` (zeroed fields) for payloads that are not valid RIFF/WAVE. */
  final case class WavMeta(doc_id: Long, sample_rate: Int, channels: Int,
                           bits: Int, n_samples: Long, total_energy: Long,
                           ok: Boolean)

  /** Deterministic REAL WAV container around [[syntheticPcm]]: canonical
    * RIFF → "WAVE" → `fmt ` (PCM, mono, 16-bit, rate = 8000 + (id%3)·4000)
    * → `data`. Every 4th doc also carries a junk `LIST` chunk between
    * `fmt ` and `data`, so a parser that hard-codes the 44-byte layout
    * instead of WALKING chunks fails the oracle on those docs. */
  def syntheticWav(docId: Long): Array[Byte] = {
    val pcm = syntheticPcm(docId)
    val rate = 8000 + (docId % 3).toInt * 4000
    val junk = if (docId % 4 == 0) 12 else 0 // LIST chunk: 8 hdr + 4 body
    val total = 4 + 24 + junk + 8 + pcm.length
    val bb = java.nio.ByteBuffer.allocate(8 + total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(total)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2) // byte rate = rate * block align
      .putShort(2).putShort(16) // block align, bits
    if (junk > 0)
      bb.put("LIST".getBytes("US-ASCII")).putInt(4)
        .put("INFO".getBytes("US-ASCII"))
    bb.put("data".getBytes("US-ASCII")).putInt(pcm.length).put(pcm)
    bb.array()
  }

  /** REAL RIFF/WAVE container parsing (r12 ask #8 — the container tier
    * above mm07's raw PCM): validate the RIFF/WAVE magics, WALK the chunk
    * list (skipping unknown chunks, honoring the RIFF odd-size pad rule)
    * to find `fmt ` and `data`, read rate/channels/bits from the real
    * header bytes, then run the 16-bit LE sample loop over the data chunk
    * for the whole-clip energy. Partition-local batch map, no shuffle —
    * like every decode stage, scan-bound at 100 TB. Undecodable or
    * truncated payloads get the zeroed `ok = false` sentinel row. */
  def parseWavBatch(rows: Dataset[MediaRow]): Dataset[WavMeta] = {
    import rows.sparkSession.implicits._
    rows.map { r =>
      val p = r.payload
      def u32(i: Int): Long =
        (p(i) & 0xFFL) | ((p(i + 1) & 0xFFL) << 8) |
          ((p(i + 2) & 0xFFL) << 16) | ((p(i + 3) & 0xFFL) << 24)
      def u16(i: Int): Int = (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)
      def tag(i: Int): String =
        new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val bad = WavMeta(r.doc_id, 0, 0, 0, 0L, 0L, ok = false)
      if (p.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") bad
      else {
        var i = 12
        var fmtCode = 0
        var rate = 0; var ch = 0; var bits = 0; var fmtSeen = false
        var dataOff = -1; var dataLen = 0
        var corrupt = false
        while (i + 8 <= p.length && dataOff < 0 && !corrupt) {
          val id = tag(i); val szL = u32(i + 4)
          // a declared size that cannot fit the remaining payload is
          // corruption: advancing by it would wrap Int (negative step =
          // infinite loop or negative index), so bail to the sentinel
          if (szL > p.length - i - 8) corrupt = true
          else {
            val sz = szL.toInt
            if (id == "fmt " && sz >= 16 && i + 8 + 16 <= p.length) {
              fmtCode = u16(i + 8) // wFormatTag: 1 = integer PCM
              ch = u16(i + 10); rate = u32(i + 12).toInt; bits = u16(i + 22)
              fmtSeen = true
            } else if (id == "data") { dataOff = i + 8; dataLen = sz }
            i += 8 + sz + (sz & 1) // RIFF pads odd-sized chunks
          }
        }
        // the 16-bit sample loop below is only valid for integer-PCM mono:
        // an IEEE-float/ADPCM wFormatTag or multi-channel stream would be
        // mis-summed as 16-bit mono and n_samples would count samples, not
        // frames — sentinel those out instead of decoding garbage
        if (corrupt || !fmtSeen || dataOff < 0 || bits != 16 ||
            fmtCode != 1 || ch != 1 ||
            dataLen < 0 || dataOff + dataLen > p.length) bad
        else {
          val n = dataLen / 2
          var e = 0L; var k = 0
          while (k < n) {
            val lo = p(dataOff + 2 * k) & 0xFF
            val hi = p(dataOff + 2 * k + 1).toInt
            val s = (hi << 8) | lo
            e += s.toLong * s
            k += 1
          }
          WavMeta(r.doc_id, rate, ch, bits, n.toLong, e, ok = true)
        }
      }
    }
  }

  /** Per-image perceptual-hash row: average-hash over the REAL decoded
    * pixel raster (exact integer luminance), so a SQL oracle that knows
    * the generator's pixel formula can predict the hash without decoding. */
  final case class ImageHash(doc_id: Long, width: Int, height: Int,
                             lum_sum: Long, phash: Long)

  /** Average-hash (aHash) perceptual fingerprint over REAL decoded pixels:
    * decode the payload with ImageIO, scan the raster once computing
    * integer luminance lum = r*299 + g*587 + b*114 per pixel, then set
    * bit i (raster order, first min(n, 60) pixels) iff lum_i * n >
    * sum(lum) — the mean comparison in exact cross-multiplied integer
    * form, no division. The standard aHash resizes to 8×8 first;
    * interpolation is codec/library-specific, so here the hash runs over
    * the native raster (the fixtures are <= 16×12) and stays bit-exactly
    * reproducible by arithmetic. Partition-local batch loop, no shuffle —
    * image fingerprinting at 100 TB is scan-bound map work. */
  def perceptualHashBatch(rows: Dataset[MediaRow]): Dataset[ImageHash] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        // ImageIO.read returns null (or throws) on undecodable payloads;
        // emit the same all-zero sentinel row decodeReal's `corrupt` path
        // uses instead of NPE-failing the whole job (ADVICE r12)
        val img = try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        catch { case _: Exception => null }
        if (img == null) ImageHash(r.doc_id, 0, 0, 0L, 0L) else {
        val w = img.getWidth; val h = img.getHeight
        val n = w * h
        val lums = new Array[Long](n)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val lum = ((p >> 16) & 0xFF) * 299L + ((p >> 8) & 0xFF) * 587L +
              (p & 0xFF) * 114L
            lums(y * w + x) = lum; sum += lum; x += 1
          }
          y += 1
        }
        var hash = 0L
        val nbits = math.min(n, 60) // stay within a positive BIGINT
        var i = 0
        while (i < nbits) { if (lums(i) * n > sum) hash |= 1L << i; i += 1 }
        ImageHash(r.doc_id, w, h, sum, hash)
        }
      }
    }
  }

  /** documents.text as a fake binary media column. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Per-image container-walk row: IHDR fields + integrity verdict, no
    * pixel decode. Corrupt/unwalkable payloads get the zeroed sentinel. */
  final case class PngMeta(doc_id: Long, width: Int, height: Int,
                           bit_depth: Int, color_type: Int, intact: Boolean)

  /** PNG container walk WITHOUT pixel decode — the 100 TB media-triage
    * pass (mm10's RIFF walker, PNG edition): validate the 8-byte
    * signature, walk the big-endian chunk list (u32 length + 4-byte type
    * + data + CRC32), require IHDR first (width/height/bit-depth/
    * color-type from real header bytes) and a zero-length IEND last with
    * no trailing bytes, and verify the CRC32 of EVERY chunk over
    * type+data. A full ImageIO decode costs orders of magnitude more than
    * this single linear scan; corrupt-file triage over an object-store
    * corpus is exactly this shape — partition-local map, no shuffle. Any
    * structural or checksum violation (bad magic, truncated/oversized
    * declared length, CRC mismatch, missing IEND) → zeroed sentinel, so a
    * single flipped payload bit must surface as intact = false. */
  def parsePngBatch(rows: Dataset[MediaRow]): Dataset[PngMeta] = {
    import rows.sparkSession.implicits._
    rows.map { r =>
      val p = r.payload
      val bad = PngMeta(r.doc_id, 0, 0, 0, 0, intact = false)
      def u32(i: Int): Long =
        ((p(i) & 0xFFL) << 24) | ((p(i + 1) & 0xFFL) << 16) |
          ((p(i + 2) & 0xFFL) << 8) | (p(i + 3) & 0xFFL)
      val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      if (p.length < 8 + 25 || (0 until 8).exists(i => (p(i) & 0xFF) != sig(i))) bad
      else {
        var i = 8
        var w = 0; var h = 0; var depth = 0; var ctype = 0
        var ihdrSeen = false; var iendAt = -1
        var corrupt = false
        val crc = new java.util.zip.CRC32()
        while (i + 12 <= p.length && iendAt < 0 && !corrupt) {
          val lenL = u32(i)
          // declared data length must fit before the payload end (plus its
          // 4 CRC bytes) — an oversized length would wrap the index math
          if (lenL > p.length - i - 12) corrupt = true
          else {
            val len = lenL.toInt
            val tpe = new String(p, i + 4, 4,
              java.nio.charset.StandardCharsets.US_ASCII)
            crc.reset()
            crc.update(p, i + 4, 4 + len)
            if (crc.getValue != u32(i + 8 + len)) corrupt = true
            else if (i == 8) {
              // first chunk must be a 13-byte IHDR
              if (tpe != "IHDR" || len != 13) corrupt = true
              else {
                w = u32(i + 8).toInt; h = u32(i + 12).toInt
                depth = p(i + 16) & 0xFF; ctype = p(i + 17) & 0xFF
                ihdrSeen = true
              }
            } else if (tpe == "IEND") {
              if (len != 0) corrupt = true else iendAt = i + 12
            }
            i += 12 + len
          }
        }
        if (corrupt || !ihdrSeen || iendAt != p.length) bad
        else PngMeta(r.doc_id, w, h, depth, ctype, intact = true)
      }
    }
  }

  /** Per-file ISO-BMFF walk row: movie-header fields, nested-track
    * evidence, mdat payload stats, integrity verdict. Zeroed sentinel on
    * any structural violation. */
  final case class Mp4Meta(doc_id: Long, timescale: Int, duration: Int,
                           n_traks: Int, trak_id_sum: Long,
                           mdat_bytes: Long, mdat_sum: Long, intact: Boolean)

  /** Deterministic REAL ISO-BMFF (MP4) container: big-endian size-prefixed
    * box tree `ftyp` → `moov` (nested `mvhd` + one `trak`→`tkhd` per
    * track) → optional `free` junk (doc_id % 3 == 0) → `mdat`. Every 4th
    * doc's mdat uses the 64-bit LARGESIZE rule (size field = 1, u64 size
    * after the type), so a walker that only reads the u32 size mis-strides
    * on exactly those docs. Field contract (the closed-form oracle):
    * timescale = 1000 + (id%4)·500, duration = 1000 + id%9000,
    * n_traks = 1 + id%3 with track_IDs 1..n, mdat payload n = 64 + id%64
    * bytes with byte k = (id·31 + k·17) % 251. */
  def syntheticMp4(docId: Long): Array[Byte] = {
    val timescale = 1000 + (docId % 4).toInt * 500
    val duration = 1000 + (docId % 9000).toInt
    val nTraks = 1 + (docId % 3).toInt
    val n = 64 + (docId % 64).toInt
    val mdatPayload = Array.tabulate(n)(k => ((docId * 31 + k * 17) % 251).toByte)
    val largesize = docId % 4 == 0
    val freeLen = if (docId % 3 == 0) 12 else 0
    val mvhdSz = 8 + 100; val tkhdSz = 8 + 84; val trakSz = 8 + tkhdSz
    val moovSz = 8 + mvhdSz + nTraks * trakSz
    val mdatHdr = if (largesize) 16 else 8
    val bb = java.nio.ByteBuffer.allocate(20 + moovSz + freeLen + mdatHdr + n)
    // ftyp: major brand + minor version + one compatible brand
    bb.putInt(20).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
      .put("mp41".getBytes("US-ASCII"))
    bb.putInt(moovSz).put("moov".getBytes("US-ASCII"))
    // mvhd v0: version/flags, creation, modification, timescale, duration,
    // then rate/volume/matrix/next_track_ID padding to the 100-byte body
    bb.putInt(mvhdSz).put("mvhd".getBytes("US-ASCII"))
      .putInt(0).putInt(0).putInt(0).putInt(timescale).putInt(duration)
    bb.position(bb.position() + 100 - 20)
    (1 to nTraks).foreach { tid =>
      bb.putInt(trakSz).put("trak".getBytes("US-ASCII"))
      // tkhd v0: version/flags, creation, modification, track_ID, then
      // reserved/duration/matrix/width/height padding to the 84-byte body
      bb.putInt(tkhdSz).put("tkhd".getBytes("US-ASCII"))
        .putInt(0).putInt(0).putInt(0).putInt(tid)
      bb.position(bb.position() + 84 - 16)
    }
    if (freeLen > 0)
      bb.putInt(freeLen).put("free".getBytes("US-ASCII")).putInt(0)
    if (largesize)
      bb.putInt(1).put("mdat".getBytes("US-ASCII")).putLong(16L + n)
    else
      bb.putInt(8 + n).put("mdat".getBytes("US-ASCII"))
    bb.put(mdatPayload)
    bb.array()
  }

  /** ISO-BMFF/MP4 box walk WITHOUT media decode — the third container
    * triage next to RIFF (mm10) and PNG (mm12), completing the media
    * ingest path's format family: walk the big-endian size-prefixed box
    * list (u32 size + 4-byte type; size == 1 → u64 largesize follows;
    * size == 0 → box extends to end of file), require `ftyp` first,
    * RECURSE into `moov` for the mvhd movie header (timescale/duration
    * from real header bytes) and into each `trak` for its tkhd track_ID
    * (two levels of nesting — a flat walker cannot produce trak_id_sum),
    * skip unknown boxes by declared size, and byte-sum the located
    * `mdat` payload. Any size overrunning its enclosing box (injected by
    * mm13's bit flip) → zeroed sentinel. One linear scan per file,
    * partition-local map, no shuffle — scan-bound at 100 TB. */
  def parseMp4Batch(rows: Dataset[MediaRow]): Dataset[Mp4Meta] = {
    import rows.sparkSession.implicits._
    rows.map { r =>
      val p = r.payload
      val bad = Mp4Meta(r.doc_id, 0, 0, 0, 0L, 0L, 0L, intact = false)
      def u32(i: Int): Long =
        ((p(i) & 0xFFL) << 24) | ((p(i + 1) & 0xFFL) << 16) |
          ((p(i + 2) & 0xFFL) << 8) | (p(i + 3) & 0xFFL)
      def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
      def tag(i: Int): String =
        new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      var timescale = 0; var duration = 0
      var nTraks = 0; var trakIdSum = 0L
      var mdatBytes = -1L; var mdatSum = 0L
      var ftypFirst = false; var moovSeen = false
      var corrupt = false
      // walk one box list spanning [from, to); returns false on violation
      def walk(from: Int, to: Int, depth: Int): Boolean = {
        var i = from
        var first = true
        while (i < to && !corrupt) {
          if (i + 8 > to) { corrupt = true }
          else {
            val s32 = u32(i)
            val (size, hdr) =
              if (s32 == 1L) { if (i + 16 > to) { corrupt = true; (0L, 0) } else (u64(i + 8), 16) }
              else if (s32 == 0L) ((to - i).toLong, 8) // last box: to end
              else (s32, 8)
            if (!corrupt) {
              if (size < hdr || size > to - i) corrupt = true
              else {
                val t = tag(i + 4); val body = i + hdr
                val bodyLen = (size - hdr).toInt
                if (depth == 0 && first) ftypFirst = t == "ftyp"
                t match {
                  case "moov" => moovSeen = true; walk(body, body + bodyLen, depth + 1)
                  case "trak" if depth == 1 =>
                    nTraks += 1; walk(body, body + bodyLen, depth + 1)
                  case "mvhd" if depth == 1 && bodyLen >= 20 =>
                    timescale = u32(body + 12).toInt
                    duration = u32(body + 16).toInt
                  case "tkhd" if depth == 2 && bodyLen >= 16 =>
                    trakIdSum += u32(body + 12)
                  case "mdat" if depth == 0 =>
                    mdatBytes = bodyLen.toLong
                    var k = 0
                    while (k < bodyLen) { mdatSum += p(body + k) & 0xFF; k += 1 }
                  case _ => () // ftyp / free / unknown: skip by size
                }
                first = false
                i += size.toInt
              }
            }
          }
        }
        !corrupt
      }
      if (p.length < 8 || !walk(0, p.length, 0)) bad
      else if (!ftypFirst || !moovSeen || mdatBytes < 0 || timescale == 0) bad
      else Mp4Meta(r.doc_id, timescale, duration, nTraks, trakIdSum,
        mdatBytes, mdatSum, intact = true)
    }
  }

  /** Per-file JPEG/JFIF walk row: frame header fields, quantization-table
    * checksum, entropy-coded-data stats, integrity verdict. Zeroed
    * sentinel on any structural violation. */
  final case class JpegMeta(doc_id: Long, width: Int, height: Int,
                            n_components: Int, has_comment: Boolean,
                            qt_sum: Long, entropy_bytes: Long,
                            entropy_sum: Long, n_restarts: Long,
                            intact: Boolean)

  /** Deterministic REAL JPEG/JFIF stream: SOI → APP0 "JFIF" → optional
    * COM (doc_id % 3 == 0) → DQT (64-byte table) → SOF0 baseline frame
    * header → SOS header → entropy-coded data with the FF00 byte-stuffing
    * rule and, on every 4th doc, FFD0-7 restart markers every 16 data
    * bytes → EOI. Field contract (the closed-form oracle): width =
    * 1 + id%16, height = 1 + id%12, n_components = 3 if id even else 1,
    * qt byte j = 1 + (id + 3j) % 99, entropy data n = 64 + id%64 logical
    * bytes where byte k = 255 (written STUFFED as FF 00) when k % 7 == 0
    * else (id·31 + k·17) % 251, restarts (id % 4 == 0) after every 16
    * data bytes cycling FFD0..FFD7. Unlike PNG/RIFF/BMFF, the payload is
    * NOT size-prefixed — a walker must honor the stuffing/restart
    * escapes to find the next marker, which is exactly what mm14 gates. */
  def syntheticJpeg(docId: Long): Array[Byte] = {
    val width = 1 + (docId % 16).toInt
    val height = 1 + (docId % 12).toInt
    val nComp = if (docId % 2 == 0) 3 else 1
    val n = 64 + (docId % 64).toInt
    val o = new java.io.ByteArrayOutputStream()
    def m(b: Int): Unit = { o.write(0xFF); o.write(b) }
    def u16(v: Int): Unit = { o.write((v >> 8) & 0xFF); o.write(v & 0xFF) }
    m(0xD8) // SOI
    m(0xE0); u16(16) // APP0: "JFIF\0", v1.1, aspect-ratio units, 1x1, no thumb
    o.write("JFIF".getBytes("US-ASCII")); o.write(0)
    o.write(1); o.write(1); o.write(0); u16(1); u16(1); o.write(0); o.write(0)
    if (docId % 3 == 0) {
      val clen = 5 + (docId % 11).toInt
      m(0xFE); u16(2 + clen) // COM
      (0 until clen).foreach(j => o.write('a' + ((docId * 13 + j * 7) % 26).toInt))
    }
    m(0xDB); u16(67); o.write(0) // DQT: precision/id byte + 64-byte table
    (0 until 64).foreach(j => o.write(1 + ((docId + 3 * j) % 99).toInt))
    m(0xC0); u16(8 + 3 * nComp) // SOF0 baseline
    o.write(8); u16(height); u16(width); o.write(nComp)
    (1 to nComp).foreach { c => o.write(c); o.write(0x11); o.write(0) }
    m(0xDA); u16(6 + 2 * nComp) // SOS header
    o.write(nComp)
    (1 to nComp).foreach { c => o.write(c); o.write(0) }
    o.write(0); o.write(63); o.write(0) // spectral selection Ss/Se/Ah+Al
    var k = 0
    while (k < n) { // entropy-coded data (stuffing + restart escapes)
      if (docId % 4 == 0 && k > 0 && k % 16 == 0)
        m(0xD0 + ((k / 16 - 1) % 8))
      if (k % 7 == 0) { o.write(0xFF); o.write(0x00) } // stuffed 255 data byte
      else o.write(((docId * 31 + k * 17) % 251).toInt)
      k += 1
    }
    m(0xD9) // EOI
    o.toByteArray
  }

  /** JPEG/JFIF marker walk WITHOUT entropy decode — the fourth container
    * triage next to RIFF (mm10), PNG (mm12), and BMFF (mm13), and the
    * one whose payload is NOT size-prefixed: marker segments carry a
    * big-endian u16 length (self-inclusive), but the entropy-coded data
    * after SOS can only be traversed by honoring the FF00 byte-stuffing
    * and FFD0-7 restart escapes until the next true marker. The walker
    * validates SOI, requires every segment to land on an FF marker
    * byte (a flipped length surfaces exactly there), extracts SOF0
    * frame fields and the DQT byte-sum from real header bytes, counts
    * logical entropy bytes/sum/restarts, and requires EOI to terminate
    * the payload with no trailing bytes. Any violation → zeroed
    * sentinel. One linear scan per file, partition-local map, no
    * shuffle — scan-bound at 100 TB. */
  def parseJpegBatch(rows: Dataset[MediaRow]): Dataset[JpegMeta] = {
    import rows.sparkSession.implicits._
    rows.map { r =>
      val p = r.payload
      val bad = JpegMeta(r.doc_id, 0, 0, 0, has_comment = false, 0L, 0L, 0L,
        0L, intact = false)
      def u16(i: Int): Int = ((p(i) & 0xFF) << 8) | (p(i + 1) & 0xFF)
      var width = 0; var height = 0; var nComp = 0
      var hasComment = false; var qtSum = 0L
      var entropyBytes = 0L; var entropySum = 0L; var nRestarts = 0L
      var sofSeen = false; var eoiAt = -1
      var corrupt = false
      if (p.length < 4 || (p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8) corrupt = true
      var i = 2
      while (!corrupt && eoiAt < 0) {
        if (i + 2 > p.length || (p(i) & 0xFF) != 0xFF) corrupt = true
        else (p(i + 1) & 0xFF) match {
          case 0xD9 => eoiAt = i + 2
          case 0xDA => // SOS: sized header, then entropy data to next marker
            if (i + 4 > p.length || i + 2 + u16(i + 2) > p.length) corrupt = true
            else {
              var j = i + 2 + u16(i + 2)
              var done = false
              while (!corrupt && !done) {
                if (j >= p.length) corrupt = true
                else if ((p(j) & 0xFF) != 0xFF) {
                  entropyBytes += 1; entropySum += p(j) & 0xFF; j += 1
                } else if (j + 1 >= p.length) corrupt = true
                else (p(j + 1) & 0xFF) match {
                  case 0x00 => entropyBytes += 1; entropySum += 255; j += 2
                  case rm if rm >= 0xD0 && rm <= 0xD7 => nRestarts += 1; j += 2
                  case _ => done = true // true marker: resume segment walk
                }
              }
              i = j
            }
          case mk => // sized segment: u16 length includes its own 2 bytes
            if (i + 4 > p.length) corrupt = true
            else {
              val len = u16(i + 2)
              if (len < 2 || i + 2 + len > p.length) corrupt = true
              else {
                mk match {
                  case 0xC0 if len >= 8 + 3 => // SOF0: precision, H, W, Nf
                    height = u16(i + 5); width = u16(i + 7)
                    nComp = p(i + 9) & 0xFF; sofSeen = true
                  case 0xFE => hasComment = true
                  case 0xDB if len == 67 => // DQT: skip the id byte, sum table
                    var j = 0
                    while (j < 64) { qtSum += p(i + 5 + j) & 0xFF; j += 1 }
                  case _ => () // APP0 / unknown: skip by declared length
                }
                i += 2 + len
              }
            }
        }
      }
      if (corrupt || !sofSeen || eoiAt != p.length) bad
      else JpegMeta(r.doc_id, width, height, nComp, hasComment, qtSum,
        entropyBytes, entropySum, nRestarts, intact = true)
    }
  }
}
