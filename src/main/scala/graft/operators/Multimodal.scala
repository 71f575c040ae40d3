package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{GraftQuery, Tables}

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded per-partition. The Spark-side shape is real — binary
  * encoding, schema, batch iteration with one decoder open per partition
  * (the mapInPandas batch pattern, in Scala). IMAGES and AUDIO use REAL
  * codecs from the JDK (zero external dependencies, headless-safe):
  * `PngCodec` round-trips genuine zlib-compressed PNG through
  * `javax.imageio` (`q_multimodal_png`), and `WavCodec` round-trips a
  * genuine RIFF/WAV PCM container through `javax.sound.sampled`
  * (`q_multimodal_wav`), and VIDEO round-trips a genuine RIFF/AVI
  * container (`AviCodec`, operators/VideoAvi.scala): uncompressed BI_RGB
  * frames for the exactly-replayable oracle path (`q_multimodal_avi`)
  * plus a Motion-JPEG fourcc through the JDK's real JPEG codec
  * (spec-validated — JPEG is lossy, so no exact SQL replay). The
  * `FakeDecoder` remains only as the generic batch-shape stub the
  * feature/resize/frame queries exercise.
  */
object Multimodal {

  final case class MediaBlob(doc_id: Long, data: Array[Byte], fmt: String)
  final case class MediaMeta(doc_id: Long, n_bytes: Long, head_hex: String)
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
      height: Int, n_frames: Int, feat_sum: Double, feat_head: Double)
  final case class MediaResized(doc_id: Long, n_out: Int, sample_sum: Double)
  final case class FrameSample(doc_id: Long, frame_idx: Int, frame_sum: Double)

  /** STUB decoder — replace with a real codec binding in production. Opened
    * once per partition (model/codec load amortized over the batch), which is
    * the part that matters for the Spark plumbing.
    */
  final class FakeDecoder {
    def meta(b: MediaBlob): MediaMeta = MediaMeta(
      b.doc_id, b.data.length.toLong,
      b.data.take(8).map(x => f"${x & 0xff}%02X").mkString)
    /** Deterministic fake of a decode → resize → feature-extract chain. */
    def features(b: MediaBlob): MediaFeatures = {
      val bytes = b.data
      val w = 16 + (if (bytes.nonEmpty) bytes(0) & 0x0f else 0)
      val h = 16 + (if (bytes.length > 1) bytes(1) & 0x0f else 0)
      val frames = 1 + bytes.length % 4
      val sum = bytes.foldLeft(0.0)((a, x) => a + (x & 0xff))
      val head = bytes.take(16).foldLeft(0.0)((a, x) => a + (x & 0xff))
      MediaFeatures(b.doc_id, bytes.length.toLong, w, h, frames, sum, head)
    }
    /** Deterministic fake RESIZE: stride-downsample the byte stream to ≤32
      * "pixels" (a real codec would decode + bilinear-resample; the
      * per-blob→fixed-budget shape is identical). */
    def resize(b: MediaBlob): MediaResized = {
      val n = b.data.length
      val k = math.max(1, (n + 31) / 32)
      val sampled = b.data.indices.collect {
        case i if i % k == 0 => (b.data(i) & 0xff).toDouble
      }
      MediaResized(b.doc_id, sampled.length, sampled.sum)
    }
    /** Deterministic fake FRAME SAMPLING: 256-byte "frames", sample first /
      * middle / last — one input blob fans out to ≤3 output rows (the
      * video-keyframe batch shape). */
    def frames(b: MediaBlob): Seq[FrameSample] = {
      val n = b.data.length
      val nf = math.max(1, (n + 255) / 256)
      Seq(0, nf / 2, nf - 1).distinct.map { f =>
        val from = f * 256
        val until = math.min(n, from + 256)
        FrameSample(b.doc_id, f,
          (from until until).map(i => (b.data(i) & 0xff).toDouble).sum)
      }
    }
  }
  object FakeDecoder { def open(): FakeDecoder = new FakeDecoder }

  final case class PngFeatures(doc_id: Long, width: Int, height: Int,
      r_sum: Long, g_sum: Long, b_sum: Long, resized_r_sum: Long)

  /** REAL image codec over the JDK's javax.imageio (headless-safe, no
    * external libraries): encodes an 8×6 RGB image whose pixels are a pure
    * function of the source bytes into genuine PNG (zlib-compressed), and
    * decodes it back for feature extraction. PNG is lossless RGB, so the
    * decoded pixel sums are exactly recomputable from the source bytes —
    * which is what lets a SQL oracle check a real compressed round trip
    * without being able to inflate PNG itself. Opened once per partition.
    */
  final class PngCodec {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    val W = 8; val H = 6
    PngCodec.ensureInMemoryCache()
    private val reader = ImageIO.getImageReadersByFormatName("png").next()
    private var closed = false
    /** Release the reader's native/registry resources at partition end. */
    def close(): Unit = if (!closed) { closed = true; reader.dispose() }

    /** Pixel p reads bytes (p, p+1, p+2) mod n as R, G, B. */
    def encode(doc_id: Long, bytes: Array[Byte]): MediaBlob = {
      val src = if (bytes.isEmpty) Array[Byte](0) else bytes
      val n = src.length
      val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
      var p = 0
      while (p < W * H) {
        val r = src(p % n) & 0xff
        val g = src((p + 1) % n) & 0xff
        val b = src((p + 2) % n) & 0xff
        img.setRGB(p % W, p / W, (r << 16) | (g << 8) | b)
        p += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      MediaBlob(doc_id, bos.toByteArray, "image/png")
    }

    /** Decode real PNG bytes; per-channel sums over all pixels plus the
      * R-channel sum of an explicit nearest-neighbor 2× downsample
      * (out(x,y) = in(2x, 2y)) — arithmetic a SQL oracle can replay. */
    def decodeFeatures(b: MediaBlob): PngFeatures = {
      val iis = ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b.data))
      reader.setInput(iis)
      val img = try reader.read(0) finally iis.close()
      val (w, h) = (img.getWidth, img.getHeight)
      var rs = 0L; var gs = 0L; var bs = 0L; var rrs = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val px = img.getRGB(x, y)
          rs += (px >> 16) & 0xff; gs += (px >> 8) & 0xff; bs += px & 0xff
          if (x % 2 == 0 && y % 2 == 0) rrs += (px >> 16) & 0xff
          x += 1
        }
        y += 1
      }
      PngFeatures(b.doc_id, w, h, rs, gs, bs, rrs)
    }
  }
  object PngCodec {
    // JVM-GLOBAL side effect, applied exactly once: ImageIO's input-cache
    // policy is process-wide, and the default spills every decode's input
    // to TEMP FILES. In-memory caching is the batch-decode discipline a
    // real image pipeline uses (zero disk traffic); any other ImageIO user
    // in this JVM sees the same policy — acceptable here, but deliberate
    // and visible rather than a per-instance constructor surprise.
    private lazy val inMemoryCache: Unit =
      javax.imageio.ImageIO.setUseCache(false)
    private[operators] def ensureInMemoryCache(): Unit = inMemoryCache
    def open(): PngCodec = new PngCodec
    /** Map `iter` through `f`, disposing the codec's reader once the
      * partition iterator is exhausted. */
    def mapClosing[A, B](codec: PngCodec, iter: Iterator[A])(f: A => B): Iterator[B] =
      new Iterator[B] {
        def hasNext: Boolean = {
          val h = iter.hasNext; if (!h) codec.close(); h
        }
        def next(): B = f(iter.next())
      }
  }

  final case class WavStats(doc_id: Long, n_samples: Int, sample_sum: Long,
      abs_sum: Long, peak: Long)

  /** REAL audio container codec over the JDK's javax.sound.sampled (no
    * external libraries): synthesizes 16-bit mono PCM from the source
    * bytes, writes a genuine RIFF/WAV file, and parses it back through
    * AudioSystem for sample statistics. PCM is lossless, so the decoded
    * stats are exactly recomputable from the source bytes by a SQL
    * oracle. Opened once per partition. */
  final class WavCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val N = 96 // samples per clip

    /** Sample i is ((byte[i mod n] unsigned) - 128) * 256 as 16-bit PCM. */
    def encode(doc_id: Long, bytes: Array[Byte]): MediaBlob = {
      val src = if (bytes.isEmpty) Array[Byte](0) else bytes
      val n = src.length
      val data = new Array[Byte](N * 2) // little-endian PCM16
      var i = 0
      while (i < N) {
        val s = ((src(i % n) & 0xff) - 128) * 256
        data(2 * i) = (s & 0xff).toByte
        data(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, N.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      MediaBlob(doc_id, bos.toByteArray, "audio/wav")
    }

    def decodeStats(b: MediaBlob): WavStats = {
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b.data))
      val raw = ais.readAllBytes()
      val nSamp = raw.length / 2
      var sum = 0L; var abs = 0L; var peak = 0L
      var i = 0
      while (i < nSamp) {
        val s = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)).toShort.toLong
        sum += s; abs += math.abs(s); peak = math.max(peak, math.abs(s))
        i += 1
      }
      WavStats(b.doc_id, nSamp, sum, abs, peak)
    }
  }
  object WavCodec { def open(): WavCodec = new WavCodec }

  val queries: Seq[GraftQuery] = Seq(

    // REAL PNG ROUND TRIP (javax.imageio, zero external deps): encode an
    // 8×6 RGB image whose pixels are a pure function of the (pure-ASCII)
    // text bytes into genuine zlib-compressed PNG, then decode the PNG and
    // extract per-channel sums + a nearest-neighbor 2× downsample sum.
    // PNG is lossless, so the oracle replays the pixel arithmetic from
    // character codes — the compressed bytes themselves only exist on the
    // Spark side, proving the codec actually ran. One codec instance per
    // partition; the single-partition documents table is repartitioned so
    // the per-doc encode/decode work spreads across cores.
    GraftQuery.sql("q_multimodal_png",
      """WITH px AS (
        |  SELECT d.doc_id, p,
        |    ascii(substr(d.text, CAST((p % n) + 1 AS INT), 1)) AS r,
        |    ascii(substr(d.text, CAST(((p + 1) % n) + 1 AS INT), 1)) AS g,
        |    ascii(substr(d.text, CAST(((p + 2) % n) + 1 AS INT), 1)) AS b
        |  FROM (SELECT doc_id, text, octet_length(encode(text)) AS n
        |        FROM documents) d,
        |       unnest(range(0, 48)) AS t(p))
        |SELECT doc_id, CAST(8 AS INT) AS width, CAST(6 AS INT) AS height,
        |  CAST(SUM(r) AS BIGINT) AS r_sum,
        |  CAST(SUM(g) AS BIGINT) AS g_sum,
        |  CAST(SUM(b) AS BIGINT) AS b_sum,
        |  CAST(SUM(CASE WHEN (p // 8) % 2 = 0 AND (p % 8) % 2 = 0
        |           THEN r ELSE 0 END) AS BIGINT) AS resized_r_sum
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // The encoded PNG corpus is FIXTURE PREP — a real pipeline's images
      // exist before the query does. Stage the blobs once per JVM
      // (fingerprint-keyed, StreamStage's feed discipline); the operator
      // under test/bench is the per-partition DECODE over binary columns.
      val staged = graft.streaming.StreamStage.stagedOnce("png_blobs", dir) {
        p =>
          Tables.load(s, dir, "documents")
            .repartition(s.sparkContext.defaultParallelism)
            .select($"doc_id", encode($"text", "utf-8").as("data"),
              lit("image/png").as("fmt"))
            .as[MediaBlob]
            .mapPartitions { iter =>
              val codec = PngCodec.open()
              PngCodec.mapClosing(codec, iter)(b => codec.encode(b.doc_id, b.data))
            }
            .write.mode("overwrite").parquet(p.toString)
      }
      // the tiny staged files coalesce into ~one scan partition; spread the
      // CPU-bound decode back across cores (same shape as the encode path)
      s.read.parquet(staged.toString)
        .repartition(s.sparkContext.defaultParallelism).as[MediaBlob]
        .mapPartitions { iter =>
          val codec = PngCodec.open()
          PngCodec.mapClosing(codec, iter)(codec.decodeFeatures)
        }.toDF().orderBy("doc_id")
    },

    // REAL WAV ROUND TRIP (javax.sound.sampled, zero external deps):
    // synthesize 16-bit mono PCM from the text bytes, write a genuine
    // RIFF/WAV container, parse it back through AudioSystem, and compute
    // sample statistics. PCM is lossless, so the oracle replays the
    // sample arithmetic from character codes; the WAV bytes only exist on
    // the Spark side, proving the container codec actually ran.
    GraftQuery.sql("q_multimodal_wav",
      """WITH sm AS (
        |  SELECT d.doc_id,
        |    (ascii(substr(d.text, CAST((i % n) + 1 AS INT), 1)) - 128) * 256
        |      AS s
        |  FROM (SELECT doc_id, text, octet_length(encode(text)) AS n
        |        FROM documents) d,
        |       unnest(range(0, 96)) AS t(i))
        |SELECT doc_id, CAST(96 AS INT) AS n_samples,
        |  CAST(SUM(s) AS BIGINT) AS sample_sum,
        |  CAST(SUM(ABS(s)) AS BIGINT) AS abs_sum,
        |  CAST(MAX(ABS(s)) AS BIGINT) AS peak
        |FROM sm GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // WAV corpus staged once per JVM like the PNGs — the measured
      // operator is the container PARSE + sample statistics.
      val staged = graft.streaming.StreamStage.stagedOnce("wav_blobs", dir) {
        p =>
          Tables.load(s, dir, "documents")
            .repartition(s.sparkContext.defaultParallelism)
            .select($"doc_id", encode($"text", "utf-8").as("data"),
              lit("audio/wav").as("fmt"))
            .as[MediaBlob]
            .mapPartitions { iter =>
              val codec = WavCodec.open()
              iter.map(b => codec.encode(b.doc_id, b.data))
            }
            .write.mode("overwrite").parquet(p.toString)
      }
      s.read.parquet(staged.toString)
        .repartition(s.sparkContext.defaultParallelism).as[MediaBlob]
        .mapPartitions { iter =>
          val codec = WavCodec.open()
          iter.map(codec.decodeStats)
        }.toDF().orderBy("doc_id")
    },

    // REAL AVI ROUND TRIP (pure-JVM RIFF muxer/demuxer, zero external
    // deps): synthesize a 4-frame 16×12 BGR24 video whose pixels are a
    // pure function of the text bytes, mux it into a genuine AVI
    // container (RIFF hdrl/strl/movi/idx1, BI_RGB '00db' frames), then
    // demux + decode for per-frame channel sums. Uncompressed RGB is
    // lossless, so the oracle replays the pixel arithmetic from character
    // codes; the AVI bytes only exist on the Spark side, proving the
    // container codec ran. The MJPG fourcc path (real javax.imageio JPEG
    // per frame) rides the same demuxer and is spec-validated
    // (AviCodecSpec) — JPEG loss rules out an exact SQL replay.
    GraftQuery.sql("q_multimodal_avi",
      """WITH px AS (
        |  SELECT d.doc_id, q // 192 AS f,
        |    ascii(substr(d.text, CAST(((3*q + 2) % n) + 1 AS INT), 1)) AS r,
        |    ascii(substr(d.text, CAST(((3*q + 1) % n) + 1 AS INT), 1)) AS g,
        |    ascii(substr(d.text, CAST(((3*q) % n) + 1 AS INT), 1)) AS b
        |  FROM (SELECT doc_id, text,
        |          -- GREATEST(n,1) mirrors framesOf's [0] fallback for an
        |          -- empty document: index (q%1)+1=1 over '' gives
        |          -- ascii('')=0, exactly the one-zero-byte source —
        |          -- without it `% 0` would NULL every pixel
        |          GREATEST(octet_length(encode(text)), 1) AS n
        |        FROM documents) d,
        |       unnest(range(0, 768)) AS t(q))
        |SELECT doc_id, CAST(16 AS INT) AS width, CAST(12 AS INT) AS height,
        |  CAST(4 AS INT) AS n_frames, CAST(f AS INT) AS frame_idx,
        |  CAST(SUM(r) AS BIGINT) AS r_sum,
        |  CAST(SUM(g) AS BIGINT) AS g_sum,
        |  CAST(SUM(b) AS BIGINT) AS b_sum
        |FROM px GROUP BY doc_id, f ORDER BY doc_id, frame_idx""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      // AVI corpus staged once per JVM (fixture prep, like the PNGs/WAVs);
      // the operator under test/bench is the per-partition demux + decode
      // over binary columns, fanned out one row per frame.
      val staged = graft.streaming.StreamStage.stagedOnce("avi_blobs", dir) {
        p =>
          Tables.load(s, dir, "documents")
            .repartition(s.sparkContext.defaultParallelism)
            .select($"doc_id", encode($"text", "utf-8").as("data"),
              lit("video/avi").as("fmt"))
            .as[MediaBlob]
            .map(b => MediaBlob(b.doc_id,
              AviCodec.encode(AviCodec.framesOf(b.data), mjpeg = false),
              "video/avi"))
            .write.mode("overwrite").parquet(p.toString)
      }
      s.read.parquet(staged.toString)
        .repartition(s.sparkContext.defaultParallelism).as[MediaBlob]
        .flatMap(b => AviCodec.stats(b.doc_id, b.data))
        .toDF().orderBy("doc_id", "frame_idx")
    },

    // Metadata extraction through the binary path: text bytes stand in for
    // media bytes (corpus is pure ASCII, so the oracle can recompute the
    // same bytes from chars).
    GraftQuery.sql("q_multimodal_meta",
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  upper(hex(encode(substr(text, 1, 8)))) AS head_hex
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val blobs = Tables.load(s, dir, "documents")
        .select($"doc_id", encode($"text", "utf-8").as("data"),
          lit("text/plain").as("fmt"))
        .as[MediaBlob]
      blobs.mapPartitions { iter =>
        val dec = FakeDecoder.open()
        iter.map(dec.meta)
      }.toDF().orderBy("doc_id")
    },

    // Full stubbed decode → feature pipeline; batch shape + partitioning are
    // the product. The "pixel math" is fake but DETERMINISTIC byte
    // arithmetic over the (pure-ASCII) text bytes, so the oracle recomputes
    // it exactly from character codes.
    GraftQuery.sql("q_multimodal_features",
      """WITH ch AS (SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) AS b, i
        |            FROM documents, unnest(range(1, len(text) + 1)) AS t(i)),
        |agg AS (SELECT doc_id, SUM(b) AS fs,
        |               SUM(CASE WHEN i <= 16 THEN b ELSE 0 END) AS fh
        |        FROM ch GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
        |  CAST(16 + (CASE WHEN len(d.text) >= 1 THEN ascii(substr(d.text, 1, 1)) & 15 ELSE 0 END) AS INT) AS width,
        |  CAST(16 + (CASE WHEN len(d.text) >= 2 THEN ascii(substr(d.text, 2, 1)) & 15 ELSE 0 END) AS INT) AS height,
        |  CAST(1 + (octet_length(encode(d.text)) % 4) AS INT) AS n_frames,
        |  CAST(COALESCE(agg.fs, 0) AS DOUBLE) AS feat_sum,
        |  CAST(COALESCE(agg.fh, 0) AS DOUBLE) AS feat_head
        |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val blobs = Tables.load(s, dir, "documents")
        .select($"doc_id", encode($"text", "utf-8").as("data"),
          lit("image/fake").as("fmt"))
        .as[MediaBlob]
      blobs.mapPartitions { iter =>
        val dec = FakeDecoder.open()
        iter.map(dec.features)
      }.toDF().orderBy("doc_id")
    },

    // Resize through the binary path: per blob, a fixed output budget
    // (stride-downsample to ≤32 samples). The oracle replays the stride
    // arithmetic over character codes.
    GraftQuery.sql("q_multimodal_resize",
      """WITH ch AS (SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) AS b, i
        |            FROM documents, unnest(range(1, len(text) + 1)) AS t(i)),
        |k AS (SELECT doc_id,
        |        GREATEST(1, (octet_length(encode(text)) + 31) // 32) AS k
        |      FROM documents),
        |agg AS (SELECT ch.doc_id, COUNT(*) AS c, SUM(ch.b) AS s
        |        FROM ch JOIN k USING (doc_id) WHERE (ch.i - 1) % k.k = 0
        |        GROUP BY ch.doc_id)
        |SELECT d.doc_id, CAST(COALESCE(agg.c, 0) AS INT) AS n_out,
        |       CAST(COALESCE(agg.s, 0) AS DOUBLE) AS sample_sum
        |FROM documents d LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val blobs = Tables.load(s, dir, "documents")
        .select($"doc_id", encode($"text", "utf-8").as("data"),
          lit("image/fake").as("fmt"))
        .as[MediaBlob]
      blobs.mapPartitions { iter =>
        val dec = FakeDecoder.open()
        iter.map(dec.resize)
      }.toDF().orderBy("doc_id")
    },

    // Frame sampling through the binary path: one blob → ≤3 keyframe rows
    // (first / middle / last 256-byte frame), fanned out inside the
    // partition iterator so the decoder stays open across the batch.
    GraftQuery.sql("q_multimodal_frames",
      """WITH ch AS (SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) AS b, i
        |            FROM documents, unnest(range(1, len(text) + 1)) AS t(i)),
        |nf AS (SELECT doc_id,
        |         GREATEST(1, (octet_length(encode(text)) + 255) // 256) AS nf
        |       FROM documents),
        |fidx AS (SELECT DISTINCT doc_id, f FROM (
        |  SELECT doc_id, unnest([0, nf // 2, nf - 1]) AS f FROM nf)),
        |sums AS (SELECT fidx.doc_id, fidx.f,
        |           SUM(CASE WHEN ch.i > fidx.f * 256
        |                     AND ch.i <= (fidx.f + 1) * 256
        |                    THEN ch.b END) AS s
        |         FROM fidx LEFT JOIN ch ON ch.doc_id = fidx.doc_id
        |         GROUP BY fidx.doc_id, fidx.f)
        |SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |       CAST(COALESCE(s, 0) AS DOUBLE) AS frame_sum
        |FROM sums ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
      import s.implicits._
      val blobs = Tables.load(s, dir, "documents")
        .select($"doc_id", encode($"text", "utf-8").as("data"),
          lit("video/fake").as("fmt"))
        .as[MediaBlob]
      blobs.mapPartitions { iter =>
        val dec = FakeDecoder.open()
        iter.flatMap(dec.frames)
      }.toDF().orderBy("doc_id", "frame_idx")
    },
  )
}
