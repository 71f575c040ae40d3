package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AviCodec._

/** The RIFF/AVI container codec (operators/VideoAvi.scala): BI_RGB frames
  * must round-trip EXACTLY (lossless — the property the q_multimodal_avi
  * SQL oracle relies on); the MJPG fourcc must produce genuine JPEG
  * frames that the real javax.imageio decoder reads back within JPEG's
  * lossy tolerance.
  */
class AviCodecSpec extends AnyFunSuite {

  private def sampleBytes(seed: Int, n: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)((rnd.nextInt(95) + 32).toByte) // printable-ASCII-ish
  }

  test("DIB AVI round-trips every pixel exactly") {
    val frames = framesOf(sampleBytes(1, 137))
    val avi = encode(frames, mjpeg = false)
    val d = demux(avi)
    assert(d.compression == "DIB " && d.width == W && d.height == H &&
      d.bitCount == 24)
    val back = decodeFrames(d)
    assert(back.length == FRAMES)
    frames.zip(back).foreach { case (a, b) =>
      assert(a.rgb.sameElements(b.rgb))
    }
  }

  test("the AVI container is structurally valid RIFF") {
    val avi = encode(framesOf(sampleBytes(2, 64)), mjpeg = false)
    def fcc(o: Int) = new String(avi.slice(o, o + 4), "ISO-8859-1")
    assert(fcc(0) == "RIFF" && fcc(8) == "AVI ")
    // declared RIFF size covers the whole file
    val sz = ((avi(4) & 0xffL)) | ((avi(5) & 0xffL) << 8) |
      ((avi(6) & 0xffL) << 16) | ((avi(7) & 0xffL) << 24)
    assert(8 + sz == avi.length)
    assert(fcc(12) == "LIST" && fcc(20) == "hdrl")
    // idx1 present (AVIF_HASINDEX is declared in avih)
    assert(new String(avi, "ISO-8859-1").contains("idx1"))
  }

  test("MJPG AVI carries real JPEG frames and decodes within JPEG tolerance") {
    val frames = framesOf(sampleBytes(3, 211))
    val avi = encode(frames, mjpeg = true)
    val d = demux(avi)
    assert(d.compression == "MJPG")
    // each chunk is a genuine JFIF/JPEG payload (SOI marker)
    d.frames.foreach { f =>
      assert((f(0) & 0xff) == 0xd8 || (f(1) & 0xff) == 0xd8)
    }
    val back = decodeFrames(d)
    assert(back.length == FRAMES &&
      back.head.width == W && back.head.height == H)
    // JPEG is lossy: assert per-channel mean absolute error stays small
    frames.zip(back).foreach { case (a, b) =>
      val mae = a.rgb.zip(b.rgb).map { case (pa, pb) =>
        math.abs(((pa >> 16) & 0xff) - ((pb >> 16) & 0xff)) +
          math.abs(((pa >> 8) & 0xff) - ((pb >> 8) & 0xff)) +
          math.abs((pa & 0xff) - (pb & 0xff))
      }.sum.toDouble / (3 * a.rgb.length)
      assert(mae < 32.0, s"MJPG mean abs error $mae too high")
    }
  }

  test("empty source bytes degrade to the zero byte, like the PNG/WAV codecs") {
    val stats = AviCodec.stats(7L, encode(framesOf(Array.empty), false))
    assert(stats.length == FRAMES)
    assert(stats.forall(s => s.r_sum == 0 && s.g_sum == 0 && s.b_sum == 0))
  }

  test("demux rejects non-AVI bytes with a directed error") {
    intercept[IllegalArgumentException] {
      demux("definitely not a riff file".getBytes)
    }
  }
}
