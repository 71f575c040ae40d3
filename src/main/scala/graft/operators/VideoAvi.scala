package graft.operators

import java.io.ByteArrayOutputStream

/** REAL video container codec, pure JVM (zero external dependencies): a
  * RIFF/AVI muxer + demuxer supporting two standard stream formats —
  *
  *  - `DIB ` / BI_RGB: uncompressed bottom-up BGR24 frames (`00db`
  *    chunks). Lossless, so decoded per-frame channel sums are exactly
  *    recomputable from the source bytes by a SQL oracle — the same
  *    stance as the PNG and WAV codecs (`q_multimodal_avi`).
  *  - `MJPG`: Motion-JPEG (`00dc` chunks), each frame a genuine JPEG
  *    compressed/decompressed through the JDK's `javax.imageio` codec.
  *    JPEG is lossy, so this path is validated by the spec's
  *    tolerance round-trip rather than an exact SQL replay.
  *
  * The AVI structure written is the standard one (RIFF 'AVI ' → LIST
  * 'hdrl' [avih + LIST 'strl' [strh/strf]] → LIST 'movi' [frames] →
  * idx1), and the demuxer is a general chunk walker — it reads the
  * stream format from `strf`/`strh`, not from what the muxer happened
  * to write. This retires the r12 `FakeDecoder` video stand-in
  * (operators/Multimodal.scala): all three media families now round-trip
  * genuine containers. Reference scope: fiat2 has no media types at all
  * (fiat2/src/fiat2/Language.v:4-15 — no binary/float anywhere); this
  * family is part of the training-data-pipeline surface.
  */
object AviCodec {

  val W = 16; val H = 12; val FRAMES = 4
  private val FRAME_BYTES = W * H * 3 // row stride W*3 = 48, already 4-aligned

  final case class VideoFrame(width: Int, height: Int,
      rgb: Array[Int]) // row-major top-down, packed 0xRRGGBB

  final case class VideoStats(doc_id: Long, width: Int, height: Int,
      n_frames: Int, frame_idx: Int, r_sum: Long, g_sum: Long, b_sum: Long)

  // ---- little-endian writers ------------------------------------------
  private def u16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def u32(o: ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
  }
  private def fcc(o: ByteArrayOutputStream, s: String): Unit = {
    require(s.length == 4); s.foreach(c => o.write(c.toInt & 0xff))
  }
  private def chunk(o: ByteArrayOutputStream, id: String,
      body: Array[Byte]): Unit = {
    fcc(o, id); u32(o, body.length.toLong); o.write(body)
    if (body.length % 2 == 1) o.write(0) // RIFF chunks are word-aligned
  }

  /** Deterministic frame synthesis — frame `f`, pixel `p` (row-major
    * top-down), with `q = f*W*H + p`: B = src(3q mod n), G = src(3q+1
    * mod n), R = src(3q+2 mod n) — the byte triple order of the DIB BGR
    * layout, so the SQL oracle reads the mapping straight off. */
  def framesOf(bytes: Array[Byte]): Seq[VideoFrame] = {
    val src = if (bytes.isEmpty) Array[Byte](0) else bytes
    val n = src.length
    (0 until FRAMES).map { f =>
      val rgb = new Array[Int](W * H)
      var p = 0
      while (p < W * H) {
        val q = f * W * H + p
        val b = src((3 * q) % n) & 0xff
        val g = src((3 * q + 1) % n) & 0xff
        val r = src((3 * q + 2) % n) & 0xff
        rgb(p) = (r << 16) | (g << 8) | b
        p += 1
      }
      VideoFrame(W, H, rgb)
    }
  }

  /** Mux frames into a standard AVI. `mjpeg=false` writes uncompressed
    * BI_RGB `00db` frames (bottom-up BGR24); `mjpeg=true` compresses each
    * frame to genuine JPEG via javax.imageio and writes `00dc` chunks
    * with the MJPG fourcc. */
  def encode(frames: Seq[VideoFrame], mjpeg: Boolean): Array[Byte] = {
    require(frames.nonEmpty)
    val w = frames.head.width; val h = frames.head.height
    val payloads: Seq[Array[Byte]] =
      if (!mjpeg) frames.map { fr =>
        val out = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          // DIB rows are stored BOTTOM-UP
          val srcRow = h - 1 - y
          var x = 0
          while (x < w) {
            val px = fr.rgb(srcRow * w + x)
            val off = (y * w + x) * 3
            out(off) = (px & 0xff).toByte // B
            out(off + 1) = ((px >> 8) & 0xff).toByte // G
            out(off + 2) = ((px >> 16) & 0xff).toByte // R
            x += 1
          }
          y += 1
        }
        out
      }
      else frames.map { fr =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        img.setRGB(0, 0, w, h, fr.rgb, 0, w)
        val bos = new ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
    val ckid = if (mjpeg) "00dc" else "00db"
    val handler = if (mjpeg) "MJPG" else "DIB "
    val maxBuf = payloads.map(_.length).max

    val strf = new ByteArrayOutputStream() // BITMAPINFOHEADER (40 bytes)
    u32(strf, 40); u32(strf, w.toLong); u32(strf, h.toLong)
    u16(strf, 1); u16(strf, 24) // planes, bit count
    if (mjpeg) fcc(strf, "MJPG") else u32(strf, 0) // biCompression
    u32(strf, (w * h * 3).toLong) // biSizeImage
    u32(strf, 0); u32(strf, 0); u32(strf, 0); u32(strf, 0)

    val strh = new ByteArrayOutputStream() // AVIStreamHeader (56 bytes)
    fcc(strh, "vids"); fcc(strh, handler)
    u32(strh, 0); u32(strh, 0); u32(strh, 0) // flags, prio/lang, initial
    u32(strh, 1); u32(strh, 10) // scale, rate → 10 fps
    u32(strh, 0); u32(strh, frames.length.toLong) // start, length
    u32(strh, maxBuf.toLong); u32(strh, -1 & 0xffffffffL) // sugg buf, quality
    u32(strh, 0) // sample size
    u16(strh, 0); u16(strh, 0); u16(strh, w); u16(strh, h) // rcFrame

    val strl = new ByteArrayOutputStream()
    fcc(strl, "strl")
    chunk(strl, "strh", strh.toByteArray)
    chunk(strl, "strf", strf.toByteArray)

    val avih = new ByteArrayOutputStream() // MainAVIHeader (56 bytes)
    u32(avih, 100000) // µs per frame (10 fps)
    u32(avih, (maxBuf * 10).toLong); u32(avih, 0)
    u32(avih, 0x10) // AVIF_HASINDEX
    u32(avih, frames.length.toLong); u32(avih, 0); u32(avih, 1) // streams
    u32(avih, maxBuf.toLong); u32(avih, w.toLong); u32(avih, h.toLong)
    u32(avih, 0); u32(avih, 0); u32(avih, 0); u32(avih, 0)

    val hdrl = new ByteArrayOutputStream()
    fcc(hdrl, "hdrl")
    chunk(hdrl, "avih", avih.toByteArray)
    chunk(hdrl, "LIST", strl.toByteArray)

    val movi = new ByteArrayOutputStream()
    fcc(movi, "movi")
    // idx1 offsets are relative to the position of the 'movi' fourcc
    // (first frame ckid lands at offset 4)
    val offsets = payloads.map { p =>
      val off = movi.size(); chunk(movi, ckid, p); off
    }

    val idx1 = new ByteArrayOutputStream()
    offsets.zip(payloads).foreach { case (off, p) =>
      fcc(idx1, ckid); u32(idx1, 0x10) // AVIIF_KEYFRAME
      u32(idx1, off.toLong); u32(idx1, p.length.toLong)
    }

    val riffBody = new ByteArrayOutputStream()
    fcc(riffBody, "AVI ")
    chunk(riffBody, "LIST", hdrl.toByteArray)
    chunk(riffBody, "LIST", movi.toByteArray)
    chunk(riffBody, "idx1", idx1.toByteArray)

    val out = new ByteArrayOutputStream()
    chunk(out, "RIFF", riffBody.toByteArray)
    out.toByteArray
  }

  // ---- demuxer ---------------------------------------------------------
  private def rdU32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def rdFcc(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "ISO-8859-1")

  final case class Demuxed(width: Int, height: Int, bitCount: Int,
      compression: String, frames: Seq[Array[Byte]])

  /** General RIFF walk: collect `strf` (format) and the movi LIST's
    * frame chunks (`##db`/`##dc`). Tolerant of extra chunks (JUNK,
    * odml) and nested LIST order — reads structure, not offsets. */
  def demux(avi: Array[Byte]): Demuxed = {
    require(avi.length >= 12 && rdFcc(avi, 0) == "RIFF" &&
      rdFcc(avi, 8) == "AVI ", "not a RIFF/AVI file")
    var strf: Option[Array[Byte]] = None
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def isFrameId(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        id(2) == 'd' && (id(3) == 'b' || id(3) == 'c')
    def walk(from: Int, until: Int): Unit = {
      var o = from
      while (o + 8 <= until) {
        val id = rdFcc(avi, o)
        val sz = rdU32(avi, o + 4).toInt
        val body = o + 8
        id match {
          case "LIST" => walk(body + 4, body + sz) // skip the list type fcc
          case "strf" => strf = Some(avi.slice(body, body + sz))
          case fid if isFrameId(fid) =>
            frames += avi.slice(body, body + sz)
          case _ => ()
        }
        o = body + sz + (sz % 2) // word-aligned
      }
    }
    walk(12, 8 + rdU32(avi, 4).toInt)
    val f = strf.getOrElse(sys.error("AVI has no strf chunk"))
    val comp = rdU32(f, 16)
    Demuxed(rdU32(f, 4).toInt, rdU32(f, 8).toInt,
      (((f(15) & 0xff) << 8) | (f(14) & 0xff)),
      if (comp == 0) "DIB " else rdFcc(f, 16), frames.toSeq)
  }

  /** Decode a demuxed stream to top-down packed-RGB frames: BI_RGB frames
    * un-flip the bottom-up BGR rows; MJPG frames run the real JPEG
    * decoder. */
  def decodeFrames(d: Demuxed): Seq[VideoFrame] = d.compression match {
    case "DIB " =>
      require(d.bitCount == 24, s"unsupported DIB bit count ${d.bitCount}")
      val stride = ((d.width * 3) + 3) / 4 * 4
      d.frames.map { raw =>
        val rgb = new Array[Int](d.width * d.height)
        var y = 0
        while (y < d.height) {
          val row = (d.height - 1 - y) * stride // stored bottom-up
          var x = 0
          while (x < d.width) {
            val off = row + x * 3
            rgb(y * d.width + x) = ((raw(off + 2) & 0xff) << 16) |
              ((raw(off + 1) & 0xff) << 8) | (raw(off) & 0xff)
            x += 1
          }
          y += 1
        }
        VideoFrame(d.width, d.height, rgb)
      }
    case "MJPG" =>
      d.frames.map { jpg =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(jpg))
        require(img != null, "MJPG frame failed to decode as JPEG")
        val rgb = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0,
          img.getWidth).map(_ & 0xffffff)
        VideoFrame(img.getWidth, img.getHeight, rgb)
      }
    case other => sys.error(s"unsupported AVI stream compression '$other'")
  }

  /** Per-frame channel sums of a decoded AVI — the feature-extraction
    * shape of the query path. */
  def stats(doc_id: Long, avi: Array[Byte]): Seq[VideoStats] = {
    val d = demux(avi)
    val frames = decodeFrames(d)
    frames.zipWithIndex.map { case (fr, i) =>
      var rs = 0L; var gs = 0L; var bs = 0L
      fr.rgb.foreach { px =>
        rs += (px >> 16) & 0xff; gs += (px >> 8) & 0xff; bs += px & 0xff
      }
      VideoStats(doc_id, fr.width, fr.height, frames.length, i, rs, gs, bs)
    }
  }
}
