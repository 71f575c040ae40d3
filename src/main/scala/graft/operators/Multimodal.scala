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
  )
}
