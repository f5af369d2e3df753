package graft.multimodal

import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec (round 7) — the COMPRESSED container the
  * synthesized assets have claimed as their image format all along.
  * 8-bit truecolor (color type 2), no interlace; encoder alternates
  * scanline filters None/Up so its own output already forces a decoder
  * to implement real unfiltering, and the decoder handles all five
  * standard filters (None/Sub/Up/Average/Paeth), verifies every chunk
  * CRC, and concatenates split IDAT streams — the actual shape of
  * files in the wild. zlib and CRC32 come from `java.util.zip`; no
  * external library. Unlike [[Containers]]' BMP/WAV, the byte stream
  * is NOT arithmetic-predictable (deflate output is encoder-dependent),
  * so the oracle checks DECODED values only — which is exactly the
  * differential a compressed format admits. */
object Png {

  private val Signature =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
    val tagBytes = tag.getBytes("US-ASCII")
    val b = ByteBuffer.allocate(12 + body.length) // PNG ints are big-endian
    b.putInt(body.length).put(tagBytes).put(body)
    val crc = new CRC32
    crc.update(tagBytes)
    crc.update(body)
    b.putInt(crc.getValue.toInt)
    b.array()
  }

  /** Encode 8-bit RGB, top-down rows, filter None on even rows and Up
    * on odd rows (a legal, deterministic choice that keeps decode
    * honest). `pixel(x, y)` is image-space, origin top-left. */
  def encode(width: Int, height: Int,
             pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val stride = width * 3
    val raw = new Array[Byte](height * (1 + stride))
    val prev = new Array[Byte](stride)
    val cur = new Array[Byte](stride)
    var off = 0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        cur(x * 3) = r.toByte; cur(x * 3 + 1) = g.toByte; cur(x * 3 + 2) = b.toByte
        x += 1
      }
      val up = y % 2 == 1
      raw(off) = if (up) 2 else 0
      off += 1
      var i = 0
      while (i < stride) {
        raw(off + i) = if (up) (cur(i) - prev(i)).toByte else cur(i)
        i += 1
      }
      off += stride
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(2.toByte) // bit depth 8, truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      .array()
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  final case class PngInfo(width: Int, height: Int, bitDepth: Int,
                           colorType: Int, rawBytes: Int, nIdatChunks: Int,
                           firstPixel: Int, lastPixel: Int)

  /** Parse + verify CRCs + inflate + unfilter. Pixels reported packed
    * r·65536 + g·256 + b; `firstPixel` is (0,0) top-left. */
  def decode(bytes: Array[Byte]): PngInfo = {
    require(bytes.length > 8 && bytes.take(8).sameElements(Signature), "not a PNG")
    var off = 8
    var w = 0; var h = 0; var depth = 0; var ct = 0
    val idat = new java.io.ByteArrayOutputStream()
    var nIdat = 0
    val bb = ByteBuffer.wrap(bytes)
    while (off + 12 <= bytes.length) {
      val len = bb.getInt(off)
      val tag = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue.toInt == bb.getInt(off + 8 + len),
        s"CRC mismatch in $tag chunk")
      tag match {
        case "IHDR" =>
          w = bb.getInt(off + 8); h = bb.getInt(off + 12)
          depth = bytes(off + 16) & 0xff; ct = bytes(off + 17) & 0xff
          require(depth == 8 && ct == 2 && (bytes(off + 20) & 0xff) == 0,
            s"unsupported PNG variant depth=$depth ct=$ct")
        case "IDAT" => idat.write(bytes, off + 8, len); nIdat += 1
        case _ => ()
      }
      off += 12 + len
    }
    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride))
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inflater.finished())
      got += inflater.inflate(raw, got, raw.length - got)
    inflater.end()
    require(got == raw.length, s"short inflate: $got of ${raw.length}")
    // unfilter in place into row-major pixels (all five standard filters)
    val img = new Array[Byte](h * stride)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xff
      val src = y * (1 + stride) + 1
      val dst = y * stride
      var i = 0
      while (i < stride) {
        val x = raw(src + i) & 0xff
        val a = if (i >= 3) img(dst + i - 3) & 0xff else 0 // left
        val b = if (y > 0) img(dst - stride + i) & 0xff else 0 // above
        val c = if (i >= 3 && y > 0) img(dst - stride + i - 3) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, c)
          case other => sys.error(s"unknown filter type $other")
        }
        img(dst + i) = v.toByte
        i += 1
      }
      y += 1
    }
    def px(x: Int, yy: Int): Int = {
      val o = yy * stride + x * 3
      ((img(o) & 0xff) << 16) | ((img(o + 1) & 0xff) << 8) | (img(o + 2) & 0xff)
    }
    PngInfo(w, h, depth, ct, raw.length, nIdat, px(0, 0), px(w - 1, h - 1))
  }
}
