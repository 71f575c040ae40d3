package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{GraftQuery, Tables}

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded per-partition. The Spark-side shape is real — binary
  * encoding, schema, batch iteration with one decoder open per partition
  * (the mapInPandas batch pattern, in Scala) — while the codec itself is a
  * deterministic STUB (`FakeDecoder`): this container has no image/audio
  * libraries, so the stub stands in for e.g. a JPEG decode.
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

  val queries: Seq[GraftQuery] = Seq(

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
