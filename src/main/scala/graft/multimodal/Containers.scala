package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL container codecs, pure JVM (round 7): BMP (24-bit uncompressed,
  * Windows BITMAPINFOHEADER) and WAV (RIFF PCM16 mono) encoded and
  * parsed byte-for-byte to spec — bottom-up BGR rows with 4-byte row
  * padding on the BMP side, little-endian chunked RIFF on the WAV side.
  * These are the standard formats simple enough to carry without any
  * codec library, which upgrades the multimodal story from "stubbed
  * decode" to "real decode for real containers": any external tool can
  * open what [[encodeBmp24]]/[[encodeWavPcm16]] emit (MultimodalSpec
  * pins golden byte vectors), and [[decodeBmp24]]/[[decodeWavPcm16]]
  * parse offsets/endianness/padding/sign exactly — the failure modes
  * q163's oracle is built to catch. Only the EMBEDDING step
  * ([[MediaCodec.decodeStub]]) remains a stand-in, because model
  * weights, not parsers, are what this environment cannot hold. */
object Containers {

  /** Bytes per BMP pixel row including the 4-byte alignment padding. */
  def bmpStride(width: Int): Int = (width * 3 + 3) & ~3

  /** Total encoded size: 14-byte file header + 40-byte info header + rows. */
  def bmpSize(width: Int, height: Int): Int = 54 + bmpStride(width) * height

  /** 24-bit uncompressed BMP; `pixel(x, y)` returns (r, g, b) for the
    * IMAGE-space coordinate (origin top-left) — rows are written
    * bottom-up in BGR order as the format demands. */
  def encodeBmp24(width: Int, height: Int,
                  pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val stride = bmpStride(width)
    val size = bmpSize(width, height)
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte) // BITMAPFILEHEADER
    b.putInt(size).putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER, bottom-up
    b.putShort(1).putShort(24).putInt(0).putInt(stride * height)
    b.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, no palette
    var y = height - 1
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, bl) = pixel(x, y)
        b.put(bl.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var p = width * 3
      while (p < stride) { b.put(0.toByte); p += 1 }
      y -= 1
    }
    b.array()
  }

  /** Decoded BMP facts. Pixels are reported packed r·65536 + g·256 + b. */
  final case class BmpInfo(width: Int, height: Int, bitsPerPixel: Int,
                           fileSize: Int, firstPixel: Int, lastPixel: Int)

  /** Parse a 24-bit uncompressed BMP. `firstPixel` is IMAGE-space
    * (0,0) — the first pixel of the LAST stored row (bottom-up), so a
    * decoder that ignores row order or padding returns wrong values. */
  def decodeBmp24(bytes: Array[Byte]): BmpInfo = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(b.get(0) == 'B'.toByte && b.get(1) == 'M'.toByte, "not a BMP")
    val fileSize = b.getInt(2)
    val dataOffset = b.getInt(10)
    val width = b.getInt(18)
    val height = b.getInt(22)
    val bpp = b.getShort(28).toInt
    require(bpp == 24 && b.getInt(30) == 0, s"unsupported BMP variant bpp=$bpp")
    val stride = bmpStride(width)
    def px(x: Int, y: Int): Int = { // y in image space, storage bottom-up
      val off = dataOffset + (height - 1 - y) * stride + x * 3
      val bl = bytes(off) & 0xff
      val g = bytes(off + 1) & 0xff
      val r = bytes(off + 2) & 0xff
      (r << 16) | (g << 8) | bl
    }
    BmpInfo(width, height, bpp, fileSize, px(0, 0), px(width - 1, height - 1))
  }

  /** RIFF/WAVE, PCM (format 1), 16-bit signed little-endian, mono. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val b = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1) // PCM, mono
    b.putInt(sampleRate).putInt(sampleRate * 2) // byte rate
    b.putShort(2).putShort(16) // block align, bits
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(b.putShort)
    b.array()
  }

  final case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           nSamples: Int, firstSample: Int, midSample: Int,
                           lastSample: Int)

  /** Parse a PCM16 mono RIFF/WAVE by walking chunks (fmt may be
    * followed by others before data — real files do this). */
  def decodeWavPcm16(bytes: Array[Byte]): WavInfo = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
    require(ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE", "not a WAVE")
    var off = 12
    var sr = 0; var ch = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length) {
      val id = ascii(off, 4)
      val len = b.getInt(off + 4)
      id match {
        case "fmt " =>
          require(b.getShort(off + 8) == 1, "not PCM")
          ch = b.getShort(off + 10).toInt
          sr = b.getInt(off + 12)
          bits = b.getShort(off + 22).toInt
        case "data" => dataOff = off + 8; dataLen = len
        case _ => ()
      }
      off += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    require(dataOff >= 0 && bits == 16 && ch == 1, "unsupported WAVE layout")
    val n = dataLen / 2
    def s(i: Int): Int = b.getShort(dataOff + i * 2).toInt
    WavInfo(sr, ch, bits, n, s(0), s(n / 2), s(n - 1))
  }
}
