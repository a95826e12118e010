package graft.ops

import org.apache.spark.sql.functions._

/** Multimodal-column operators (SURVEY §2.8 + the training-data-pipeline
  * surface): media as opaque BINARY columns with typed metadata, the
  * feature-at-rest base64 codec, per-partition batch "decode"
  * (`mapPartitions` — the heavy-UDF pattern used for the reference's CNN
  * featurizers, `featurizer/generic_featurizer.py:58-71`), and JSON
  * property extraction (`api/api.py:199-213` request parsing).
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB:
  * a deterministic md5-derived fake (clearly marked below). Everything
  * Spark-side — binary schema, partition batching, per-partition init,
  * output shape — is the real plumbing a libjpeg/ffmpeg UDF would use.
  */
object MultimodalOps {
  import Tables.{apply => t}

  /** DuckDB md5-hex-substring → BIGINT (same trick as TextOps.hx). */
  private def hxSub(expr: String, from: Int, len: Int): String =
    s"('0x' || substr(md5($expr), $from, $len))::BIGINT"

  /** Header decode: the REAL byte-level JPEG/PNG/GIF parse for payloads
    * that actually are one of those containers ([[graft.core.ImageHeader]],
    * ref `imgio/imgio.py:42-111`), falling back to the md5-derived stub for
    * anything else — the synthetic test corpus carries text payloads, which
    * no header parser can size. q66 gates the real path on constructed
    * containers; q37/q55/q53 run text payloads through the same seam. */
  private[ops] def decode(bytes: Array[Byte]): (String, Int, Int) =
    graft.core.ImageHeader.parse(bytes).getOrElse(decodeStub(bytes))

  /** STUB image decode: header fields derived from the md5 of the payload
    * bytes — deterministic, oracle-checkable stand-in for payloads that are
    * not real image containers. */
  private[ops] def decodeStub(bytes: Array[Byte]): (String, Int, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    def hx(from: Int, len: Int): Long =
      java.lang.Long.parseLong(hex.substring(from, from + len), 16)
    val formats = Array("JPEG", "PNG", "GIF")
    val fmt = formats((hx(0, 2) % 3).toInt)
    val width = (32L * (1L + hx(2, 4) % 64L)).toInt
    val height = (32L * (1L + hx(6, 4) % 64L)).toInt
    (fmt, width, height)
  }

  val defs: Seq[QueryDef] = Seq(
    // §2.8 feature/bytes-at-rest codec: binary payload, content hash,
    // base64 encode + verified round-trip (ref featsio.py:4-22 b64 codec,
    // imgio.py:23-39 sha1-of-bytes identity — sha256 here because both
    // engines expose it).
    QueryDef(
      "q36_binary_codec",
      (s, d) => {
        val bin = col("text").cast("binary")
        t(s, d, "documents")
          .select(
            col("doc_id"),
            sha2(bin, 256).as("sha256"),
            length(bin).cast("long").as("n_bytes"),
            // Spark's base64 MIME-chunks long output with \r\n; strip to the
            // canonical RFC-4648 form (what DuckDB/python produce)
            regexp_replace(base64(bin), "\r\n", "").as("b64"),
            (unbase64(base64(bin)).cast("string") === col("text")).as("roundtrip_ok"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, sha256(text) AS sha256,
             |       octet_length(text::BLOB)::BIGINT AS n_bytes,
             |       to_base64(text::BLOB) AS b64,
             |       (from_base64(to_base64(text::BLOB)) = text::BLOB) AS roundtrip_ok
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Multimodal decode plumbing: opaque binary payload → per-partition
    // batch decode via mapPartitions (decoder initialized once per
    // partition, like loading a CNN/codec once per executor task —
    // ref DaemonBatchExtractor, extractor/generic_extractor.py:26-163).
    QueryDef(
      "q37_image_meta",
      (s, d) => {
        import s.implicits._
        val ds = t(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
        ds.mapPartitions { it =>
          // per-partition decoder init happens HERE (once per task, not per
          // row) — the stub needs none, a real codec would allocate here
          it.map { case (id, payload) =>
            val (fmt, w, h) = decode(payload)
            (id, fmt, w.toLong, h.toLong, payload.length.toLong)
          }
        }.toDF("doc_id", "format", "width", "height", "n_bytes")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
              |  CASE ${hxSub("text", 1, 2)} % 3 WHEN 0 THEN 'JPEG' WHEN 1 THEN 'PNG' ELSE 'GIF' END AS format,
              |  (32 * (1 + ${hxSub("text", 3, 4)} % 64))::BIGINT AS width,
              |  (32 * (1 + ${hxSub("text", 7, 4)} % 64))::BIGINT AS height,
              |  octet_length(text::BLOB)::BIGINT AS n_bytes
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // §2.8 JSON parse: extract typed properties from the JSON props column
    // (ref from_json ingest messages, extraction_checker.py:160-163) and
    // aggregate over the extracted key.
    QueryDef(
      "q38_json_extract",
      (s, d) =>
        t(s, d, "events")
          .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("k")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("k"),
      Some("""SELECT json_extract_string(props, '$.k')::BIGINT AS k, count(*) AS cnt
             |FROM events GROUP BY 1 ORDER BY k""".stripMargin)),

    // §2.8 JPEG preprocessing geometry (ref sbpycaffe_img_featurizer
    // .py:43-76,113-135 — resize so the short side hits 256, then center
    // crop 227×227 for the CNN input). The decode is the q37 stub; the
    // resize/crop math is exact integer arithmetic in codegen'd built-ins
    // (the real pixel resample would live inside the same mapPartitions
    // batch as the decoder).
    QueryDef(
      "q55_center_crop",
      (s, d) => {
        import s.implicits._
        val ds = t(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
        val meta = ds.mapPartitions { it =>
          it.map { case (id, payload) =>
            val (fmt, w, h) = decode(payload)
            (id, fmt, w.toLong, h.toLong)
          }
        }.toDF("doc_id", "format", "width", "height")
        meta
          .withColumn("short_side", least(col("width"), col("height")))
          .withColumn("resized_w", expr("(width * 256) div short_side"))
          .withColumn("resized_h", expr("(height * 256) div short_side"))
          .withColumn("crop_x0", expr("(resized_w - 227) div 2"))
          .withColumn("crop_y0", expr("(resized_h - 227) div 2"))
          .select(col("doc_id"), col("format"), col("width"), col("height"),
            col("resized_w"), col("resized_h"), col("crop_x0"), col("crop_y0"),
            lit(227L).as("crop_size"))
          .orderBy("doc_id")
      },
      Some(s"""WITH m AS (
              |  SELECT doc_id,
              |    CASE ${hxSub("text", 1, 2)} % 3 WHEN 0 THEN 'JPEG' WHEN 1 THEN 'PNG' ELSE 'GIF' END AS format,
              |    (32 * (1 + ${hxSub("text", 3, 4)} % 64))::BIGINT AS width,
              |    (32 * (1 + ${hxSub("text", 7, 4)} % 64))::BIGINT AS height
              |  FROM documents),
              |r AS (
              |  SELECT *, least(width, height) AS short_side,
              |         (width * 256) // least(width, height) AS resized_w,
              |         (height * 256) // least(width, height) AS resized_h
              |  FROM m)
              |SELECT doc_id, format, width, height, resized_w, resized_h,
              |       (resized_w - 227) // 2 AS crop_x0,
              |       (resized_h - 227) // 2 AS crop_y0,
              |       227::BIGINT AS crop_size
              |FROM r ORDER BY doc_id""".stripMargin)),

    // Video-as-binary frame sampling: 1 container row → N sampled-frame
    // rows, all in codegen'd built-ins (sequence + posexplode-style
    // generator, byte-offset slice, content hash). The payload stands in
    // for a video container: fixed-size "frames" of 256 bytes at 25 fps,
    // every 8th frame sampled — the Spark-side plumbing (offset math, 1→N
    // generate, bounded slice per row) is exactly what a real ffmpeg
    // keyframe sampler inside mapPartitions would feed downstream.
    QueryDef(
      "q56_frame_sample",
      (s, d) => {
        val frameBytes = 256
        val sampleEvery = 8
        val msPerFrame = 40 // 25 fps
        t(s, d, "documents")
          .where(length(col("text")) >= frameBytes)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0L),
              expr(s"((length(text) div $frameBytes) - 1) div $sampleEvery"))).as("k"))
          .select(col("doc_id"),
            (col("k") * sampleEvery).as("frame_idx"),
            (col("k") * sampleEvery * msPerFrame).as("t_ms"),
            (col("k") * sampleEvery * frameBytes).as("byte_off"),
            sha2(expr(s"substring(text, k * $sampleEvery * $frameBytes + 1, $frameBytes)")
              .cast("binary"), 256).as("frame_sha"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""SELECT doc_id, f.k * 8 AS frame_idx, f.k * 8 * 40 AS t_ms,
             |       f.k * 8 * 256 AS byte_off,
             |       sha256(substr(text, f.k * 8 * 256 + 1, 256)) AS frame_sha
             |FROM documents,
             |     LATERAL (SELECT unnest(generate_series(0,
             |       ((octet_length(text::BLOB) // 256) - 1) // 8)) AS k) f
             |WHERE octet_length(text::BLOB) >= 256
             |ORDER BY doc_id, frame_idx""".stripMargin)),

    // §2.8 image header parse, the REAL path (ref imgio/imgio.py:42-111):
    // construct well-formed JPEG/PNG/GIF containers with dimensions derived
    // from doc_id, then recover format/width/height by actually READING THE
    // BYTES — PNG IHDR (big-endian), GIF screen descriptor (little-endian),
    // JPEG marker-segment walk past APP0+COM to the SOF0. The oracle
    // computes the expected fields arithmetically, so any parser (or
    // builder) defect breaks the hash. Sizes are container constants
    // (PNG 33 B, GIF 13 B, JPEG 44 B with the APP0/COM preamble).
    QueryDef(
      "q66_image_header",
      (s, d) => {
        import s.implicits._
        t(s, d, "documents").select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            val formats = Array("PNG", "GIF", "JPEG")
            it.map { id =>
              val bytes = graft.core.ImageHeader.synthesize(
                formats((id % 3).toInt),
                1 + (id * 7 % 1000).toInt, 1 + (id * 13 % 800).toInt)
              val (fmt, w, h) = graft.core.ImageHeader.parse(bytes)
                .getOrElse(sys.error(s"synthesized container unparseable for doc $id"))
              (id, fmt, w.toLong, h.toLong, bytes.length.toLong)
            }
          }.toDF("doc_id", "format", "width", "height", "n_bytes")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE doc_id % 3 WHEN 0 THEN 'PNG' WHEN 1 THEN 'GIF' ELSE 'JPEG' END AS format,
             |  (1 + (doc_id * 7) % 1000)::BIGINT AS width,
             |  (1 + (doc_id * 13) % 800)::BIGINT AS height,
             |  (CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 13 ELSE 44 END)::BIGINT AS n_bytes
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // §2.8 byte-level container sniffing, AUDIO twin of q66: construct
    // well-formed PCM WAVs (with a LIST chunk BEFORE fmt, so the RIFF
    // chunk walk is exercised — a fixed-offset read fails them), then
    // recover channels / sample rate / payload size / integer-µs duration
    // by READING THE BYTES. The oracle computes every field
    // arithmetically from the construction, so a parser (or builder)
    // defect breaks the hash. A multimodal corpus routes and filters
    // audio on exactly this header metadata without ever decoding.
    QueryDef(
      "q90_wav_header",
      (s, d) => {
        import s.implicits._
        t(s, d, "documents").select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            val rates = Array(8000, 16000, 22050, 44100)
            it.map { id =>
              val channels = 1 + (id % 2).toInt
              val rate = rates((id % 4).toInt)
              val frames = 1 + (id * 31 % 512).toInt
              val block = channels * 2 // 16-bit PCM
              val bytes = graft.core.AudioHeader.synthesize(
                channels, rate, 16, frames * block)
              if (id % 5 == 0) {
                // every 5th doc is "compressed": flip the fmt format code
                // to µ-law (7) — routing metadata must survive the header,
                // only the duration is codec-bound
                val at = (0 until bytes.length - 4).find(k =>
                  bytes(k) == 'f' && bytes(k + 1) == 'm' &&
                    bytes(k + 2) == 't' && bytes(k + 3) == ' ').get
                bytes(at + 8) = 7
              }
              val w = graft.core.AudioHeader.parse(bytes)
                .getOrElse(sys.error(s"synthesized WAV unparseable for doc $id"))
              // -1 sentinel (not NULL) for the codec-bound duration keeps
              // the cross-engine hash free of NULL-ordering concerns; the
              // library API itself carries Option[Long]
              (id, w.format.toLong, w.channels.toLong, w.sampleRate.toLong,
                w.dataBytes, w.durationMicros.getOrElse(-1L),
                bytes.length.toLong)
            }
          }.toDF("doc_id", "format", "channels", "sample_rate", "n_data",
            "dur_us", "n_bytes")
          .orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT doc_id,
             |  1 + (doc_id % 2) AS channels,
             |  CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
             |       WHEN 2 THEN 22050 ELSE 44100 END AS rate,
             |  1 + (doc_id * 31) % 512 AS frames
             |  FROM documents)
             |SELECT doc_id,
             |  (CASE WHEN doc_id % 5 = 0 THEN 7 ELSE 1 END)::BIGINT AS format,
             |  channels::BIGINT AS channels, rate::BIGINT AS sample_rate,
             |  (frames * channels * 2)::BIGINT AS n_data,
             |  (CASE WHEN doc_id % 5 = 0 THEN -1
             |        ELSE (frames * channels * 2) * 1000000 // (rate * channels * 2)
             |   END)::BIGINT AS dur_us,
             |  (12 + 20 + 24 + 8 + frames * channels * 2)::BIGINT AS n_bytes
             |FROM p ORDER BY doc_id""".stripMargin)),

    // §2.8 container sniffing, VIDEO leg — completes the image/audio/video
    // trio: construct well-formed ISO-BMFF files (a `free` box before
    // `moov` AND before `mvhd`, so both the top-level and the child box
    // walks are exercised), recover brand / movie timescale / duration /
    // integer-ms length by reading the bytes. Routing video by duration
    // bucket or brand — the q56 frame-sample planner's inputs — needs
    // exactly this and no decoder.
    QueryDef(
      "q91_mp4_header",
      (s, d) => {
        import s.implicits._
        t(s, d, "documents").select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            val scales = Array(1000L, 600L, 90000L, 48000L)
            val brands = Array("isom", "mp42")
            it.map { id =>
              // every 3rd doc carries a v1 mvhd (64-bit times) with a
              // duration past 2^32 — unrepresentable in a v0 box at all,
              // so a parser that ignored the version could not hash-match
              val v1 = id % 3 == 0
              val dur = 1L + id * 17 % 100000 + (if (v1) 1L << 33 else 0L)
              val bytes = graft.core.Mp4Header.synthesize(
                brands((id % 2).toInt), scales((id % 4).toInt), dur,
                version = if (v1) 1 else 0)
              val m = graft.core.Mp4Header.parse(bytes)
                .getOrElse(sys.error(s"synthesized MP4 unparseable for doc $id"))
              (id, m.brand, m.version.toLong, m.timescale, m.duration,
                m.durationMillis, bytes.length.toLong)
            }
          }.toDF("doc_id", "brand", "mvhd_version", "timescale", "duration",
            "dur_ms", "n_bytes")
          .orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT doc_id,
             |  CASE doc_id % 2 WHEN 0 THEN 'isom' ELSE 'mp42' END AS brand,
             |  CASE doc_id % 4 WHEN 0 THEN 1000 WHEN 1 THEN 600
             |       WHEN 2 THEN 90000 ELSE 48000 END AS timescale,
             |  1 + (doc_id * 17) % 100000
             |    + CASE WHEN doc_id % 3 = 0 THEN 8589934592 ELSE 0 END AS duration,
             |  CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS v
             |  FROM documents)
             |SELECT doc_id, brand, v::BIGINT AS mvhd_version,
             |  timescale::BIGINT AS timescale,
             |  duration::BIGINT AS duration,
             |  (duration * 1000 // timescale)::BIGINT AS dur_ms,
             |  (CASE v WHEN 0 THEN 160 ELSE 172 END)::BIGINT AS n_bytes
             |FROM p ORDER BY doc_id""".stripMargin))
  )
}
