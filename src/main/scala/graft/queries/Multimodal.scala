package graft.queries

import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata derived by decode/feature ops. mm01-mm04 certify the schema and
  * fan-out arithmetic over synthetic (text-as-bytes) payloads; mm05 drives
  * the real `Dataset.mapPartitions` batch path; mm06 drives the REAL image
  * codec — `javax.imageio` decode of deterministic PNG fixtures, verified
  * against an oracle that predicts the decoded metadata arithmetically.
  */
object MultimodalQueries {
  val defs: Seq[QueryDef] = Seq(

    // ---- mm01: binary payload + deterministic "decode" to typed metadata
    QueryDef("mm01_decode_meta", (s, d) => {
      Tables.load(s, d, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(
          col("doc_id"),
          length(col("payload")).as("n_bytes"),
          (lit(16) + (length(col("payload")) % 64) * 10).as("width"),
          (lit(16) + (floor(length(col("payload")) / 64).cast("int") % 48) * 10).as("height"),
          (length(col("payload")) % 3 + 1).as("channels"),
          when(length(col("payload")) % 3 === 0, "rgb")
            .when(length(col("payload")) % 3 === 1, "gray")
            .otherwise("rgba").as("format"),
          ascii(substring(col("text"), 1, 1)).as("first_byte"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
             CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
             CAST(16 + (octet_length(CAST(text AS BLOB)) % 64) * 10 AS INTEGER) AS width,
             CAST(16 + (CAST(FLOOR(octet_length(CAST(text AS BLOB)) / 64) AS INTEGER) % 48) * 10 AS INTEGER) AS height,
             CAST(octet_length(CAST(text AS BLOB)) % 3 + 1 AS INTEGER) AS channels,
             CASE octet_length(CAST(text AS BLOB)) % 3
               WHEN 0 THEN 'rgb' WHEN 1 THEN 'gray' ELSE 'rgba' END AS format,
             CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte
      FROM documents ORDER BY doc_id""")),

    // ---- mm02: frame sampling over a fake video payload — every 10th
    // 100-byte "frame"; exercises explode(sequence) fan-out plumbing
    QueryDef("mm02_frame_sample", (s, d) => {
      Tables.load(s, d, "documents")
        .withColumn("n_frames", floor(length(col("text").cast("binary")) / 50).cast("int"))
        .filter(col("n_frames") >= 1)
        .select(col("doc_id"), col("n_frames"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(2))).as("frame_idx"))
        .groupBy(col("doc_id"), col("n_frames"))
        .agg(count(lit(1)).as("n_sampled"),
          min(col("frame_idx") * 50).as("first_offset"),
          max(col("frame_idx") * 50).as("last_offset"))
        .orderBy("doc_id")
    }, Some("""
      WITH f AS (
        SELECT doc_id, CAST(FLOOR(octet_length(CAST(text AS BLOB)) / 50) AS INTEGER) AS n_frames
        FROM documents
        WHERE CAST(FLOOR(octet_length(CAST(text AS BLOB)) / 50) AS INTEGER) >= 1),
      sampled AS (
        SELECT doc_id, n_frames, unnest(generate_series(0, n_frames - 1, 2)) AS frame_idx
        FROM f)
      SELECT doc_id, n_frames, COUNT(*) AS n_sampled,
             CAST(MIN(frame_idx*50) AS INTEGER) AS first_offset,
             CAST(MAX(frame_idx*50) AS INTEGER) AS last_offset
      FROM sampled GROUP BY doc_id, n_frames ORDER BY doc_id""")),

    // ---- mm03: frame-level dedup — the video-dedup shape: sample frames
    // through the REAL mapPartitions plumbing (ops.Multimodal.sampleFrames),
    // fingerprint each frame, count exact-duplicate frames per doc. The
    // oracle rebuilds the same frames with substr arithmetic, so the typed
    // Dataset flatMap path is verified against first-principles SQL.
    QueryDef("mm03_frame_dedup", (s, d) => {
      val frames = graft.ops.Multimodal.sampleFrames(
        graft.ops.Multimodal.mediaFromDocuments(s, d), frameBytes = 50, step = 2)
      frames
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"),
          countDistinct(md5(col("frame"))).as("n_uniq"))
        .orderBy("doc_id")
    }, Some("""
      WITH f AS (
        SELECT doc_id, text,
               CAST(FLOOR(octet_length(CAST(text AS BLOB)) / 50) AS INTEGER) AS n_frames
        FROM documents
        WHERE CAST(FLOOR(octet_length(CAST(text AS BLOB)) / 50) AS INTEGER) >= 1),
      frames AS (
        SELECT doc_id, substr(text, frame_idx*50 + 1, 50) AS frame
        FROM (SELECT doc_id, text, unnest(generate_series(0, n_frames - 1, 2)) AS frame_idx
              FROM f))
      SELECT doc_id, COUNT(*) AS n_frames, COUNT(DISTINCT md5(frame)) AS n_uniq
      FROM frames GROUP BY doc_id ORDER BY doc_id""")),

    // ---- mm04: OVERLAPPING window chunking — 32-byte chunks at stride 16
    // (50% overlap), the audio-feature windowing shape (frames in mm02/03
    // are disjoint). Fan-out is (len/stride) rows per doc from one
    // explode(sequence); chunk fingerprints hash-aggregated per doc.
    QueryDef("mm04_overlap_chunks", (s, d) => {
      Tables.load(s, d, "documents")
        .withColumn("nb", length(col("text").cast("binary")))
        .filter(col("nb") >= 32)
        .withColumn("n_chunks", (floor((col("nb") - 32) / 16) + 1).cast("int"))
        .select(col("doc_id"), col("n_chunks"),
          explode(sequence(lit(0), col("n_chunks") - 1)).as("ci"), col("text"))
        .select(col("doc_id"), col("n_chunks"),
          md5(expr("substring(text, ci*16 + 1, 32)").cast("binary")).as("fp"))
        .groupBy("doc_id", "n_chunks")
        .agg(countDistinct(col("fp")).as("n_uniq_chunks"),
          min(col("fp")).as("min_fp"))
        .orderBy("doc_id")
    }, Some("""
      WITH f AS (
        SELECT doc_id, text,
               CAST(FLOOR((octet_length(CAST(text AS BLOB)) - 32) / 16) + 1 AS INTEGER) AS n_chunks
        FROM documents WHERE octet_length(CAST(text AS BLOB)) >= 32),
      chunks AS (
        SELECT doc_id, n_chunks, md5(substr(text, ci*16 + 1, 32)) AS fp
        FROM (SELECT doc_id, text, n_chunks,
                     unnest(generate_series(0, n_chunks - 1)) AS ci
              FROM f))
      SELECT doc_id, n_chunks, COUNT(DISTINCT fp) AS n_uniq_chunks,
             MIN(fp) AS min_fp
      FROM chunks GROUP BY 1, 2 ORDER BY doc_id""")),

    // ---- mm05: RESIZE through the real mapPartitions batch path — the one
    // ops.Multimodal transform (resizeBatch: deterministic 1-in-4 byte
    // subsample standing in for pixel resampling) the gate did not yet
    // drive end-to-end. Unlike mm01-04 (pure Column expressions), this
    // result is produced by the actual Dataset.mapPartitions plumbing —
    // typed rows, per-partition batch iterator, codec-init amortization
    // point — and the oracle reconstructs the same subsample in SQL, so
    // the partition-local path itself is what gets hash-verified.
    QueryDef("mm05_resize_fp", (s, d) => {
      // The fingerprint hashes the HEX of the subsampled bytes, not the raw
      // bytes: DuckDB's string_agg can only reassemble text, and substr over
      // the hex encoding is byte-addressed, so the oracle stays correct for
      // non-ASCII (multi-byte UTF-8) and empty documents alike — substr over
      // `text` would count characters and silently diverge (ADVICE r11).
      val rows = graft.ops.Multimodal.mediaFromDocuments(s, d)
      graft.ops.Multimodal.resizeBatch(rows, 4).toDF()
        .select(col("doc_id"), md5(upper(hex(col("payload")))).as("fp"),
          length(col("payload")).as("out_bytes"))
        .orderBy("doc_id")
    }, Some("""
      WITH hx AS (
        SELECT doc_id, hex(CAST(text AS BLOB)) AS h,
               octet_length(CAST(text AS BLOB)) AS nb
        FROM documents),
      idx AS (
        SELECT doc_id, h,
               unnest(generate_series(1, greatest(nb // 4, CASE WHEN nb = 0 THEN 0 ELSE 1 END))) AS i
        FROM hx)
      SELECT hx.doc_id,
             md5(upper(COALESCE(string_agg(substr(idx.h, 1 + (i-1)*8, 2), '' ORDER BY i), ''))) AS fp,
             CAST(COUNT(i) AS INTEGER) AS out_bytes
      FROM hx LEFT JOIN idx ON hx.doc_id = idx.doc_id
      GROUP BY hx.doc_id ORDER BY hx.doc_id""")),

    // ---- mm06: REAL image decode. Deterministic tiny PNGs (RGB / GRAY /
    // RGBA, dims a pure function of doc_id) are encoded with ImageIO.write
    // on the executors and decoded back through the real ImageIO path in
    // decodeBatch (magic-number routed to decodeReal). DuckDB cannot decode
    // PNG — and doesn't need to: the generator makes width/height/channels
    // predictable arithmetically, so any codec disagreement (dims, band
    // count, format name, a failed decode) breaks the hash compare.
    QueryDef("mm06_real_decode", (s, d) => {
      import s.implicits._
      val ids = Tables.load(s, d, "documents")
        .filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").cast("long")).as[Long]
      val rows = ids.map(id =>
        graft.ops.Multimodal.MediaRow(id, graft.ops.Multimodal.syntheticImage(id)))
      graft.ops.Multimodal.decodeBatch(rows).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("format"), col("ok"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
             CAST(1 + doc_id % 16 AS INTEGER) AS width,
             CAST(1 + doc_id % 12 AS INTEGER) AS height,
             CAST(CASE doc_id % 3 WHEN 0 THEN 3 WHEN 1 THEN 1 ELSE 4 END AS INTEGER) AS channels,
             'png' AS format,
             TRUE AS ok
      FROM documents WHERE doc_id % 20 = 0 ORDER BY doc_id""")),

    // ---- mm07: REAL audio byte parsing — deterministic 16-bit LE PCM
    // clips (samples and length a pure function of doc_id, generated on
    // the executors) are parsed back sample-by-sample in frameEnergy's
    // partition-local loop: per-64-sample-frame energy (exact integer sum
    // of squares), rolled up per doc with a silence-frame count. The
    // oracle reproduces the SAMPLE FORMULA arithmetically (it never sees
    // the bytes), so any bug in the little-endian/sign-bit byte round-trip
    // breaks the hash. This is the audio twin of mm06's image gate: the
    // Spark side must decode real bytes; the oracle predicts the result.
    QueryDef("mm07_audio_energy", (s, d) => {
      import s.implicits._
      val ids = Tables.load(s, d, "documents")
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").cast("long")).as[Long]
      val rows = ids.map(id =>
        graft.ops.Multimodal.MediaRow(id, graft.ops.Multimodal.syntheticPcm(id)))
      graft.ops.Multimodal.frameEnergy(rows, 64).toDF()
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"),
          sum(col("energy")).as("total_energy"),
          sum(when(col("energy") < 89000000L, 1L).otherwise(0L)).as("n_silent"))
        .orderBy("doc_id")
    }, Some("""
      WITH params AS (
        SELECT doc_id, 256 + doc_id % 256 AS n_samples
        FROM documents WHERE doc_id % 10 = 0),
      frames AS (
        SELECT doc_id, unnest(generate_series(0, n_samples // 64 - 1)) AS f
        FROM params),
      samples AS (
        SELECT doc_id, f, unnest(generate_series(f*64, f*64 + 63)) AS k
        FROM frames),
      fe AS (
        SELECT doc_id, f,
               SUM(((doc_id*31 + k*17) % 4096 - 2048)
                   * ((doc_id*31 + k*17) % 4096 - 2048)) AS energy
        FROM samples GROUP BY 1, 2)
      SELECT doc_id, COUNT(*) AS n_frames,
             CAST(SUM(energy) AS BIGINT) AS total_energy,
             CAST(SUM(CASE WHEN energy < 89000000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_silent
      FROM fe GROUP BY doc_id ORDER BY doc_id""")),

    // ---- mm08: perceptual image hashing over REAL decoded pixels — the
    // image twin of content-defined text fingerprinting (tx04): aHash bits
    // from the raster ImageIO actually decodes, not from the payload
    // bytes. This is a strictly STRONGER codec gate than mm06 (which
    // checks dims/bands): every pixel value must survive the
    // setRGB → PNG encode → PNG decode → getRGB round trip exactly, or
    // the luminance sum and hash diverge from the oracle's arithmetic
    // prediction. GRAY fixtures (doc_id%3==1) are excluded: BYTE_GRAY
    // setRGB applies a colorspace conversion the oracle cannot reproduce
    // arithmetically; RGB and ARGB store the written 24-bit value
    // verbatim. Partition-local decode+scan loop, no shuffle.
    QueryDef("mm08_image_phash", (s, d) => {
      import s.implicits._
      val ids = Tables.load(s, d, "documents")
        .filter(col("doc_id") % 20 === 0 && col("doc_id") % 3 =!= 1)
        .select(col("doc_id").cast("long")).as[Long]
      val rows = ids.map(id =>
        graft.ops.Multimodal.MediaRow(id, graft.ops.Multimodal.syntheticImage(id)))
      graft.ops.Multimodal.perceptualHashBatch(rows).toDF()
        .orderBy("doc_id")
    }, Some("""
      WITH params AS (
        SELECT doc_id, CAST(1 + doc_id % 16 AS INTEGER) AS w,
               CAST(1 + doc_id % 12 AS INTEGER) AS h
        FROM documents WHERE doc_id % 20 = 0 AND doc_id % 3 <> 1),
      xs AS (SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x
             FROM params),
      xys AS (SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y
              FROM xs),
      lums AS (
        SELECT doc_id, w, h, x, y,
               ((p // 65536) % 256) * 299 + ((p // 256) % 256) * 587
                 + (p % 256) * 114 AS lum
        FROM (SELECT doc_id, w, h, x, y,
                     (doc_id * 2654435761 + x * 7 + y * 131) % 16777216 AS p
              FROM xys)),
      sums AS (SELECT doc_id, SUM(lum) AS s, COUNT(*) AS n
               FROM lums GROUP BY 1)
      SELECT l.doc_id, l.w AS width, l.h AS height,
             CAST(MAX(s) AS BIGINT) AS lum_sum,
             CAST(SUM(CASE WHEN y * w + x < LEAST(n, 60) AND lum * n > s
                           THEN (1::BIGINT << CAST(y * w + x AS INTEGER))
                           ELSE 0 END) AS BIGINT) AS phash
      FROM lums l JOIN sums USING (doc_id)
      GROUP BY l.doc_id, l.w, l.h ORDER BY l.doc_id""")),

    // ---- mm09: image-text PAIR validation — the LAION-style filtering
    // step of a contrastive-training pipeline: each candidate pair is a
    // real decoded image (mm06's fixtures through the REAL ImageIO path)
    // joined to its caption's metadata, and a pair survives only if the
    // image decoded ok, carries enough pixels, and the caption is long
    // enough. The decode runs partition-local (no shuffle); the
    // caption join is a doc_id equi-join; output is the per-lang
    // accepted-pair ledger. The oracle never decodes: it predicts the
    // pixel counts from the fixture contract, so a codec failure or a
    // mis-paired row breaks the hash.
    QueryDef("mm09_pair_filter", (s, d) => {
      import s.implicits._
      val cand = Tables.load(s, d, "documents")
        .filter(col("doc_id") % 20 === 0)
      val rows = cand.select(col("doc_id").cast("long")).as[Long]
        .map(id => graft.ops.Multimodal.MediaRow(
          id, graft.ops.Multimodal.syntheticImage(id)))
      val meta = graft.ops.Multimodal.decodeBatch(rows).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("ok"))
      val pairs = cand.select(col("doc_id"), col("lang"), col("n_chars"))
        .join(meta, "doc_id")
      pairs
        .filter(col("ok") && col("width") * col("height") >= 16 &&
          col("n_chars") >= 100)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("width") * col("height")).cast("long")).as("total_px"),
          min(col("doc_id")).as("first_doc"))
        .orderBy("lang")
    }, Some("""
      WITH cand AS (
        SELECT doc_id, lang, n_chars,
               (1 + doc_id % 16) * (1 + doc_id % 12) AS px
        FROM documents WHERE doc_id % 20 = 0)
      SELECT lang, COUNT(*) AS n_pairs,
             CAST(SUM(px) AS BIGINT) AS total_px,
             MIN(doc_id) AS first_doc
      FROM cand WHERE px >= 16 AND n_chars >= 100
      GROUP BY 1 ORDER BY lang""")),

    // ---- mm10: REAL WAV/RIFF container parsing (r12 ask #8) — the
    // container tier above mm07's raw PCM: each doc's clip is wrapped in
    // a real RIFF → WAVE → fmt → data container (every 4th doc with a
    // junk LIST chunk in between), and parseWavBatch must validate the
    // magics, WALK the chunk list (unknown chunks skipped, odd-size pad
    // rule honored), read rate/channels/bits from the real header bytes,
    // and sum sample squares over the located data chunk. The oracle
    // predicts every field arithmetically from the generator contract
    // (rate = 8000 + (id%3)·4000, n = 256 + id%256, the mm07 sample
    // formula) — a header-offset or chunk-walk bug breaks the hash on
    // exactly the LIST-carrying docs. Partition-local map, no shuffle.
    QueryDef("mm10_wav_parse", (s, d) => {
      import s.implicits._
      val ids = Tables.load(s, d, "documents")
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").cast("long")).as[Long]
      val rows = ids.map(id =>
        graft.ops.Multimodal.MediaRow(id, graft.ops.Multimodal.syntheticWav(id)))
      graft.ops.Multimodal.parseWavBatch(rows).toDF()
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("n_samples"), col("total_energy"), col("ok"))
        .orderBy("doc_id")
    }, Some("""
      WITH params AS (
        SELECT doc_id,
               CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
               256 + doc_id % 256 AS n
        FROM documents WHERE doc_id % 10 = 0),
      samples AS (
        SELECT doc_id, unnest(generate_series(0, n - 1)) AS k
        FROM params),
      energy AS (
        SELECT doc_id,
               SUM(((doc_id*31 + k*17) % 4096 - 2048)
                   * ((doc_id*31 + k*17) % 4096 - 2048)) AS e
        FROM samples GROUP BY 1)
      SELECT p.doc_id, p.sample_rate, CAST(1 AS INTEGER) AS channels,
             CAST(p.n AS BIGINT) AS n_samples,
             CAST(e.e AS BIGINT) AS total_energy, TRUE AS ok
      FROM params p JOIN energy e USING (doc_id)
      ORDER BY p.doc_id""")),

    // ---- mm11: RAW-FILE ingest via the `binaryFile` source — the shape a
    // 100 TB multimodal corpus actually arrives in (millions of media
    // FILES on object storage, not parquet-embedded blobs): Spark lists
    // the tree, distributes (path, modificationTime, length, content)
    // rows across the cluster, and the id rides the PATH (regexp off the
    // filename), after which the pipeline is mm10's container parser
    // unchanged. The bounded fixture write (≤200 WAVs to a temp dir) is
    // ingest setup, not the operator; at scale the files pre-exist. The
    // oracle is mm10's closed-form derivation on the same slice — path
    // round-trip + byte-identical payload delivery is exactly what it
    // gates (any truncation or id/file mismatch breaks energy or ok).
    QueryDef("mm11_binaryfile_ingest", (s, d) => {
      import s.implicits._
      val ids = Tables.load(s, d, "documents")
        .filter(col("doc_id") % 10 === 0 && col("doc_id") < 2000)
        .select(col("doc_id").cast("long")).as[Long].collect().sorted
        // bounded fixture write (≤200 files), not the operator
      val dir = java.nio.file.Files.createTempDirectory("graft-binfiles")
      ids.foreach { id =>
        java.nio.file.Files.write(dir.resolve(s"$id.wav"),
          graft.ops.Multimodal.syntheticWav(id))
      }
      val rows = s.read.format("binaryFile").load(dir.toString)
        .select(regexp_extract(col("path"), "(\\d+)\\.wav$", 1).cast("long").as("doc_id"),
          col("content"))
        .as[(Long, Array[Byte])]
        .map { case (id, bytes) => graft.ops.Multimodal.MediaRow(id, bytes) }
      graft.ops.Multimodal.parseWavBatch(rows).toDF()
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("n_samples"), col("total_energy"), col("ok"))
        .orderBy("doc_id")
    }, Some("""
      WITH params AS (
        SELECT doc_id,
               CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
               256 + doc_id % 256 AS n
        FROM documents WHERE doc_id % 10 = 0 AND doc_id < 2000),
      samples AS (
        SELECT doc_id, unnest(generate_series(0, n - 1)) AS k
        FROM params),
      energy AS (
        SELECT doc_id,
               SUM(((doc_id*31 + k*17) % 4096 - 2048)
                   * ((doc_id*31 + k*17) % 4096 - 2048)) AS e
        FROM samples GROUP BY 1)
      SELECT p.doc_id, p.sample_rate, CAST(1 AS INTEGER) AS channels,
             CAST(p.n AS BIGINT) AS n_samples,
             CAST(e.e AS BIGINT) AS total_energy, TRUE AS ok
      FROM params p JOIN energy e USING (doc_id)
      ORDER BY p.doc_id""")),

    // ---- mm12: PNG container walk + CRC integrity triage — the media
    // VALIDATION pass a 100 TB ingest runs before any decode (mm10's RIFF
    // walker, PNG edition): signature, big-endian chunk list, IHDR fields
    // from real header bytes, CRC32 of every chunk, IEND-terminates-payload.
    // One linear byte scan per file vs a full pixel decode — corrupt-file
    // triage at scan speed. The gate INJECTS corruption (one bit of the
    // IHDR width flipped for doc_id % 5 == 0; the 21-slice is coprime so
    // exactly 1/5 of rows are hit) that the walker must catch via CRC:
    // intact flips to false and the fields zero out. The clean rows'
    // fields are arithmetic (the mm06 generator contract: width 1+id%16,
    // height 1+id%12, bit depth 8, color type RGB=2/GRAY=0/ARGB=6), so the
    // oracle predicts every row without parsing PNG — a walk/CRC/endian
    // bug breaks the hash on exactly the clean or exactly the hit rows.
    QueryDef("mm12_png_walk", (s, d) => {
      import s.implicits._
      val ids = Tables.load(s, d, "documents")
        .filter(col("doc_id") % 21 === 0)
        .select(col("doc_id").cast("long")).as[Long]
      val rows = ids.map { id =>
        val p = graft.ops.Multimodal.syntheticImage(id)
        if (id % 5 == 0) p(16) = (p(16) ^ 0x01).toByte // IHDR width bit flip
        graft.ops.Multimodal.MediaRow(id, p)
      }
      graft.ops.Multimodal.parsePngBatch(rows).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("bit_depth"), col("color_type"), col("intact"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
             CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 + doc_id % 16 END
               AS INTEGER) AS width,
             CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 + doc_id % 12 END
               AS INTEGER) AS height,
             CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 8 END
               AS INTEGER) AS bit_depth,
             CAST(CASE WHEN doc_id % 5 = 0 THEN 0
                  WHEN doc_id % 3 = 0 THEN 2
                  WHEN doc_id % 3 = 1 THEN 0 ELSE 6 END
               AS INTEGER) AS color_type,
             doc_id % 5 <> 0 AS intact
      FROM documents WHERE doc_id % 21 = 0 ORDER BY doc_id""")),

    // ---- mm13: ISO-BMFF/MP4 box walk (VERDICT r14 #5) — the third
    // container format next to RIFF (mm10) and PNG (mm12), completing the
    // triage family for the media-corpus ingest path: big-endian
    // size-prefixed box tree (ftyp/moov/mdat), the 64-bit LARGESIZE rule
    // on every 4th doc's mdat, a junk `free` box to skip on every 3rd,
    // and TWO levels of box nesting (moov→mvhd fields, moov→trak→tkhd
    // track_IDs) that a flat walker cannot reproduce. The gate INJECTS
    // corruption (one bit of moov's declared size flipped for doc_id %
    // 5 == 0) that the walker must catch via the size-overrun check —
    // intact flips false, fields zero out. Clean rows' fields are
    // arithmetic (the syntheticMp4 generator contract), so the oracle
    // predicts every row without parsing BMFF — a stride, largesize,
    // endian, or nesting bug breaks the hash on exactly the affected
    // residue class. Partition-local map, no shuffle.
    QueryDef("mm13_mp4_walk", (s, d) => {
      import s.implicits._
      val ids = Tables.load(s, d, "documents")
        .filter(col("doc_id") % 17 === 0)
        .select(col("doc_id").cast("long")).as[Long]
      val rows = ids.map { id =>
        val p = graft.ops.Multimodal.syntheticMp4(id)
        if (id % 5 == 0) p(20) = (p(20) | 0x20).toByte // moov size bit flip
        graft.ops.Multimodal.MediaRow(id, p)
      }
      graft.ops.Multimodal.parseMp4Batch(rows).toDF()
        .select(col("doc_id"), col("timescale"), col("duration"),
          col("n_traks"), col("trak_id_sum"), col("mdat_bytes"),
          col("mdat_sum"), col("intact"))
        .orderBy("doc_id")
    }, Some("""
      WITH params AS (
        SELECT doc_id,
               1000 + (doc_id % 4) * 500 AS timescale,
               1000 + doc_id % 9000 AS duration,
               1 + doc_id % 3 AS n_traks,
               64 + doc_id % 64 AS n
        FROM documents WHERE doc_id % 17 = 0),
      ms AS (
        SELECT doc_id, SUM((doc_id*31 + k*17) % 251) AS mdat_sum
        FROM (SELECT doc_id, unnest(generate_series(0, n - 1)) AS k
              FROM params)
        GROUP BY 1)
      SELECT p.doc_id,
             CAST(CASE WHEN p.doc_id % 5 = 0 THEN 0 ELSE p.timescale END
               AS INTEGER) AS timescale,
             CAST(CASE WHEN p.doc_id % 5 = 0 THEN 0 ELSE p.duration END
               AS INTEGER) AS duration,
             CAST(CASE WHEN p.doc_id % 5 = 0 THEN 0 ELSE p.n_traks END
               AS INTEGER) AS n_traks,
             CAST(CASE WHEN p.doc_id % 5 = 0 THEN 0
                  ELSE p.n_traks * (p.n_traks + 1) / 2 END
               AS BIGINT) AS trak_id_sum,
             CAST(CASE WHEN p.doc_id % 5 = 0 THEN 0 ELSE p.n END
               AS BIGINT) AS mdat_bytes,
             CAST(CASE WHEN p.doc_id % 5 = 0 THEN 0 ELSE ms.mdat_sum END
               AS BIGINT) AS mdat_sum,
             p.doc_id % 5 <> 0 AS intact
      FROM params p JOIN ms USING (doc_id)
      ORDER BY p.doc_id""")),

    // ---- mm14: JPEG/JFIF marker walk — the FOURTH container triage
    // next to RIFF (mm10), PNG (mm12), and BMFF (mm13), and the only one
    // whose payload is NOT size-prefixed: after SOS the entropy-coded
    // data can only be traversed by honoring the FF00 byte-stuffing and
    // FFD0-7 restart-marker escapes until the next true marker — a
    // size-prefix walker structurally cannot parse it. Real JFIF streams
    // (SOI/APP0/COM/DQT/SOF0/SOS/EOI), SOF0 frame fields + DQT byte-sum
    // from real header bytes, logical entropy byte count/sum/restart
    // count from the escape-aware scan. The gate INJECTS corruption (one
    // bit of SOF0's declared length flipped for doc_id % 5 == 0) that
    // the walker must catch via the next-segment-lands-on-FF check —
    // intact flips false, fields zero out. Clean rows' fields are
    // arithmetic (the syntheticJpeg generator contract), so the oracle
    // predicts every row without parsing JPEG. Partition-local map, no
    // shuffle — scan-bound at 100 TB.
    QueryDef("mm14_jpeg_walk", (s, d) => {
      import s.implicits._
      val ids = Tables.load(s, d, "documents")
        .filter(col("doc_id") % 19 === 0)
        .select(col("doc_id").cast("long")).as[Long]
      val rows = ids.map { id =>
        val p = graft.ops.Multimodal.syntheticJpeg(id)
        if (id % 5 == 0) {
          // flip one bit of SOF0's declared length (first FFC0 marker;
          // no earlier byte pair can alias it: COM is lowercase ASCII,
          // DQT values <= 99, APP0 fixed)
          val sof = (0 until p.length - 1).find(j =>
            (p(j) & 0xFF) == 0xFF && (p(j + 1) & 0xFF) == 0xC0).get
          p(sof + 3) = (p(sof + 3) ^ 0x01).toByte
        }
        graft.ops.Multimodal.MediaRow(id, p)
      }
      graft.ops.Multimodal.parseJpegBatch(rows).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("n_components"), col("has_comment"), col("qt_sum"),
          col("entropy_bytes"), col("entropy_sum"), col("n_restarts"),
          col("intact"))
        .orderBy("doc_id")
    }, Some("""
      WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 19 = 0),
      qt AS (
        SELECT doc_id, SUM(1 + (doc_id + 3*j) % 99) AS qt_sum
        FROM (SELECT doc_id, unnest(generate_series(0, 63)) AS j FROM ids)
        GROUP BY 1),
      es AS (
        SELECT doc_id,
               SUM(CASE WHEN k % 7 = 0 THEN 255
                        ELSE (doc_id*31 + k*17) % 251 END) AS entropy_sum
        FROM (SELECT doc_id,
                     unnest(generate_series(0, 64 + doc_id % 64 - 1)) AS k
              FROM ids)
        GROUP BY 1)
      SELECT i.doc_id,
             CAST(CASE WHEN i.doc_id % 5 = 0 THEN 0
                  ELSE 1 + i.doc_id % 16 END AS INTEGER) AS width,
             CAST(CASE WHEN i.doc_id % 5 = 0 THEN 0
                  ELSE 1 + i.doc_id % 12 END AS INTEGER) AS height,
             CAST(CASE WHEN i.doc_id % 5 = 0 THEN 0
                  WHEN i.doc_id % 2 = 0 THEN 3 ELSE 1 END
               AS INTEGER) AS n_components,
             CASE WHEN i.doc_id % 5 = 0 THEN FALSE
                  ELSE i.doc_id % 3 = 0 END AS has_comment,
             CAST(CASE WHEN i.doc_id % 5 = 0 THEN 0 ELSE q.qt_sum END
               AS BIGINT) AS qt_sum,
             CAST(CASE WHEN i.doc_id % 5 = 0 THEN 0
                  ELSE 64 + i.doc_id % 64 END AS BIGINT) AS entropy_bytes,
             CAST(CASE WHEN i.doc_id % 5 = 0 THEN 0 ELSE e.entropy_sum END
               AS BIGINT) AS entropy_sum,
             CAST(CASE WHEN i.doc_id % 5 = 0 THEN 0
                  WHEN i.doc_id % 4 = 0 THEN (64 + i.doc_id % 64 - 1) // 16
                  ELSE 0 END AS BIGINT) AS n_restarts,
             i.doc_id % 5 <> 0 AS intact
      FROM ids i JOIN qt q USING (doc_id) JOIN es e USING (doc_id)
      ORDER BY i.doc_id""")),

    // ---- mm15: audio-fingerprint near-dup — the AUDIO leg of the
    // modality-symmetric dedup family (text: dd03 minhash / dd04 simhash;
    // image: mm08 pHash; video frames: mm03). Chromaprint-style pipeline
    // over REAL decoded PCM: 32 energy frames (8 samples each) from the
    // byte-parsing frameEnergy decoder are quantized against a fixed
    // threshold into a 32-bit fingerprint, candidate pairs come from
    // BANDED equality on the fp's four bytes (dd03's LSH discipline —
    // never all-pairs: at 100 TB the only corpus-sized exchange carries
    // (band, byte) keys, and same-band buckets are the candidate set),
    // then the true Hamming distance over the full fp confirms ≤ 6.
    // Fixtures are syntheticTrackPcm: docs on the same track (doc_id%7)
    // share the signal with per-doc loudness offsets, so same-track pairs
    // land at small Hamming distance and cross-track byte collisions are
    // pruned by the confirm — the decode loop, the banding, and the
    // confirm are all gate-checked against DuckDB's arithmetic replay of
    // the generator contract (no bytes on the oracle side).
    QueryDef("mm15_audio_fp_dedup", (s, d) => {
      import s.implicits._
      // doc_id bound: the PAIR-emitting gate form is bounded like the
      // dd-family pair queries (dd02/dd03's docsBounded discipline) — the
      // synthetic fixture set has only 21 distinct signals (7 tracks × 3
      // loudness offsets), so an unbounded slice makes same-fp groups
      // grow linearly with sf and the pair relation QUADRATICALLY
      // (measured: 4.5M pairs at sf1). The production shape at scale is
      // the per-group ledger (group by fp), not all pairs — that shape
      // is ITS OWN gate query, mm16 below, run UNBOUNDED at every sf;
      // this gate checks the banding/confirm arithmetic on a fixed slice.
      val ids = Tables.load(s, d, "documents")
        .filter(col("doc_id") % 10 === 5 && col("doc_id") < 2000)
        .select(col("doc_id").cast("long")).as[Long]
      val rows = ids.map(id =>
        graft.ops.Multimodal.MediaRow(id, graft.ops.Multimodal.syntheticTrackPcm(id)))
        .toDF("doc_id", "payload")
      // fingerprint via the native audio_fp expression (r16d, 16th
      // SQL-registered): byte-parse + per-frame energy + threshold bits
      // in one codegen pass — no per-frame row fan-out, no groupBy
      // exchange before the per-doc fp exists (AudioFpSpec pins
      // bit-equality with the staged frameEnergy derivation)
      val fps = rows.select(col("doc_id"),
        graft.functions.AudioFp.audio_fp(col("payload"), 8, 32, 11200000L).as("fp"))
      val bands = fps.select(col("doc_id"), col("fp"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"),
              shiftright(col("fp"), 8 * b).bitwiseAND(lit(255L)).as("key"))): _*)).as("bk"))
        .select(col("doc_id"), col("fp"), col("bk.band").as("band"), col("bk.key").as("key"))
      bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"),
          col("x.fp").as("fpa"), col("y.fp").as("fpb"))
        .distinct()
        .select(col("ida"), col("idb"),
          bit_count(col("fpa").bitwiseXOR(col("fpb"))).cast("long").as("hamming"),
          (col("ida") % 7 === col("idb") % 7).as("same_track"))
        .filter(col("hamming") <= 6)
        .orderBy("ida", "idb")
    }, Some("""
      WITH ids AS (
        SELECT doc_id FROM documents WHERE doc_id % 10 = 5 AND doc_id < 2000),
      samples AS (
        SELECT doc_id, k,
               ((doc_id % 7)*131 + k*29) % 4096 - 2048 + (doc_id % 3)*150 AS s
        FROM (SELECT doc_id, unnest(generate_series(0, 255)) AS k FROM ids)),
      fe AS (
        SELECT doc_id, k // 8 AS f, SUM(s*s) AS energy
        FROM samples GROUP BY 1, 2),
      fps AS (
        SELECT doc_id,
               SUM(CASE WHEN energy > 11200000 THEN 1::BIGINT << f ELSE 0 END) AS fp
        FROM fe GROUP BY 1),
      bands AS (
        SELECT doc_id, fp, b.band AS band, (fp >> (8*b.band)) & 255 AS key
        FROM fps, (SELECT unnest(generate_series(0, 3)) AS band) b),
      cand AS (
        SELECT DISTINCT x.doc_id AS ida, y.doc_id AS idb, x.fp AS fpa, y.fp AS fpb
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
      SELECT ida, idb, CAST(bit_count(xor(fpa, fpb)) AS BIGINT) AS hamming,
             ida % 7 = idb % 7 AS same_track
      FROM cand WHERE bit_count(xor(fpa, fpb)) <= 6
      ORDER BY ida, idb""")),

    // ---- mm16: the 100 TB shape of media-fp dedup, UNBOUNDED (r17,
    // VERDICT r16 #4) — mm15's pair relation is quadratic in group size,
    // so the production query is the per-fingerprint GROUP LEDGER: one
    // row per distinct fp with its population (n_docs), an id checksum
    // (doc_sum), how many source tracks collide into it (n_tracks), and
    // the dominant track's share (max_track_cnt — purity numerator,
    // exact-integer so the oracle hash can't drift on float division).
    // Input is the FULL doc_id%10=5 slice at every sf — no cap; output
    // cardinality is |distinct fps| (bounded by the fixture's 21 signals
    // + loudness variants), never |docs|². Plan shape: scan → native
    // audio_fp (codegen, no frame fan-out) → two-level aggregate
    // (fp,track)→(fp), both levels map-side combinable, ONE real
    // exchange carrying (fp,track) partials — the same shape you'd run
    // on 100 TB of real audio.
    QueryDef("mm16_audio_fp_ledger", (s, d) => {
      import s.implicits._
      val ids = Tables.load(s, d, "documents")
        .filter(col("doc_id") % 10 === 5) // full slice — deliberately unbounded
        .select(col("doc_id").cast("long")).as[Long]
      val rows = ids.map(id =>
        graft.ops.Multimodal.MediaRow(id, graft.ops.Multimodal.syntheticTrackPcm(id)))
        .toDF("doc_id", "payload")
      val fps = rows.select(col("doc_id"),
        graft.functions.AudioFp.audio_fp(col("payload"), 8, 32, 11200000L).as("fp"))
      fps.groupBy(col("fp"), (col("doc_id") % 7).as("track"))
        .agg(count(lit(1)).as("cnt"), sum(col("doc_id")).as("dsum"))
        .groupBy("fp")
        .agg(sum("cnt").as("n_docs"), sum("dsum").as("doc_sum"),
          count(lit(1)).as("n_tracks"), max("cnt").as("max_track_cnt"))
        .orderBy("fp")
    }, Some("""
      WITH ids AS (
        SELECT doc_id FROM documents WHERE doc_id % 10 = 5),
      samples AS (
        SELECT doc_id, k,
               ((doc_id % 7)*131 + k*29) % 4096 - 2048 + (doc_id % 3)*150 AS s
        FROM (SELECT doc_id, unnest(generate_series(0, 255)) AS k FROM ids)),
      fe AS (
        SELECT doc_id, k // 8 AS f, SUM(s*s) AS energy
        FROM samples GROUP BY 1, 2),
      fps AS (
        SELECT doc_id,
               SUM(CASE WHEN energy > 11200000 THEN 1::BIGINT << f ELSE 0 END) AS fp
        FROM fe GROUP BY 1),
      per_track AS (
        SELECT fp, doc_id % 7 AS track, COUNT(*) AS cnt, SUM(doc_id) AS dsum
        FROM fps GROUP BY 1, 2)
      -- fp is a SUM over BIGINTs = HUGEINT; without the cast pandas
      -- renders it float64 and the sweep's string compare sees "….0"
      SELECT CAST(fp AS BIGINT) AS fp, CAST(SUM(cnt) AS BIGINT) AS n_docs,
             CAST(SUM(dsum) AS BIGINT) AS doc_sum,
             CAST(COUNT(*) AS BIGINT) AS n_tracks,
             CAST(MAX(cnt) AS BIGINT) AS max_track_cnt
      FROM per_track GROUP BY 1 ORDER BY 1"""))
  )
}
