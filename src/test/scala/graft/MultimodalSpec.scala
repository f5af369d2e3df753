package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import graft.multimodal.{Containers, MediaCodec, Multimodal, Png}

/** Pins the multimodal plumbing: schema, header/metadata synthesis,
  * stub-codec determinism, batch transforms, and that the binary column
  * is dropped before shuffling. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-multimodal-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("binaryFile source ingests raw media files into the asset pipeline") {
    // The object-storage ingestion path at corpus scale: media lands as
    // FILES; spark.read.format("binaryFile") gives (path, modTime,
    // length, content) without any decode, and the stub codec runs over
    // `content` exactly as over synthesized assets. pathGlobFilter
    // prunes by extension BEFORE any bytes are read.
    val mediaDir = java.nio.file.Files.createTempDirectory("graft-media")
    (0 until 6).foreach { i =>
      val ext = if (i % 2 == 0) "png" else "txt"
      java.nio.file.Files.write(mediaDir.resolve(f"asset$i%02d.$ext"),
        (s"IMG0payload-$i" * (i + 1)).getBytes("UTF-8"))
    }
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png")
      .load(mediaDir.toString)
    assert(files.columns.toSet == Set("path", "modificationTime", "length", "content"))
    val rows = files.selectExpr("path", "length", "content").collect()
    assert(rows.length == 3, "glob filter must prune non-media files from the listing")
    // codec over file bytes: deterministic 16-dim features, same contract
    rows.foreach { r =>
      val feat = MediaCodec.decodeStub(r.getAs[Array[Byte]]("content"))
      assert(feat.length == 16 && math.abs(feat.sum - 1.0f) < 1e-3,
        "histogram features must normalize over file content")
    }
  }

  test("assets carry kind-specific magic headers and metadata") {
    val assets = Multimodal.synthesizeAssets(spark, dir).collect()
    assert(assets.length == 500)
    assets.foreach { a =>
      val header = new String(a.media.take(4), "UTF-8")
      val expected = a.kind match {
        case "image" => "IMG0"; case "audio" => "AUD0"; case "video" => "VID0"
      }
      assert(header == expected, s"asset ${a.asset_id}")
      if (a.kind == "image") assert(a.width > 0 && a.height > 0 && a.sample_rate == 0)
      if (a.kind == "audio") assert(a.sample_rate == 16000 && a.width == 0)
    }
  }

  test("feature extraction is deterministic, fixed-width, and histogram-normalized") {
    val f1 = Multimodal.extractFeatures(Multimodal.synthesizeAssets(spark, dir))
      .collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(Multimodal.synthesizeAssets(spark, dir))
      .collect().sortBy(_.asset_id)
    assert(f1.length == 500)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.features.toSeq == b.features.toSeq, s"asset ${a.asset_id} not deterministic")
    }
    f1.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3, "histogram must be normalized")
    }
  }

  test("decode parses header fields back out of the binary, not from metadata") {
    // round-trip: synthesized width/height/sample_rate must come back
    // from the BYTES (big-endian at offsets 4/8/12) and the payload
    // digest must match the source text — the q50 oracle contract.
    val assets = Multimodal.synthesizeAssets(spark, dir).collect().sortBy(_.asset_id)
    val feats = Multimodal.extractFeatures(Multimodal.synthesizeAssets(spark, dir))
      .collect().sortBy(_.asset_id).toIndexedSeq
    assets.zip(feats).foreach { case (a, f) =>
      assert(f.width == a.width && f.height == a.height && f.sample_rate == a.sample_rate,
        s"asset ${a.asset_id}: decoded header fields must equal the synthesized ones")
      assert(f.n_bytes == a.media.length.toLong)
      val expectedSig = java.security.MessageDigest.getInstance("MD5")
        .digest(java.util.Arrays.copyOfRange(a.media, Multimodal.HeaderBytes, a.media.length))
        .map("%02x".format(_)).mkString
      assert(f.payload_sig == expectedSig, s"asset ${a.asset_id}: payload digest mismatch")
    }
  }

  test("stub codec boundary: known bytes produce the expected histogram") {
    val features = MediaCodec.decodeStub(Array[Byte](0x00, 0x10, 0x20, 0x30))
    assert(features(0) == 0.25f && features(1) == 0.25f
      && features(2) == 0.25f && features(3) == 0.25f)
    assert(features.drop(4).forall(_ == 0f))
    assert(MediaCodec.decodeStub(Array.emptyByteArray).forall(_ == 0f))
  }

  test("resize truncates payloads; frame-sample touches only video") {
    val assets = Multimodal.synthesizeAssets(spark, dir)
    val resized = Multimodal.resize(assets, maxBytes = 64).collect()
    assert(resized.forall(_.media.length <= 64))
    val sampled = Multimodal.frameSample(assets, everyNth = 4).collect()
    sampled.foreach { a =>
      val orig = a.kind == "video"
      if (orig) assert(a.media.length <= (a.duration_ms / 10 + 16) / 4 + 1)
    }
    val nonVideoUnchanged = Multimodal.frameSample(assets, 4).filter(_.kind != "video")
      .collect().map(_.media.length).sum
    val origNonVideo = assets.collect().filter(_.kind != "video")
      .map(_.media.length).sum
    assert(nonVideoUnchanged == origNonVideo)
  }

  test("feature table drops the binary column before the shuffle") {
    val ft = Multimodal.featureTable(spark, dir)
    assert(!ft.columns.contains("media"), "binary payload must not travel through shuffles")
    assert(ft.columns.toSet == Set("asset_id", "kind", "n_bytes", "header",
      "width", "height", "sample_rate", "payload_sig", "features"))
  }

  // ---- real container codecs (round 7) ------------------------------

  test("golden bytes: a 1x1 red pixel encodes as a spec-exact 58-byte BMP") {
    // Hand-written from the BMP spec: BITMAPFILEHEADER (14) +
    // BITMAPINFOHEADER (40) + one BGR pixel padded to a 4-byte row.
    // Any external viewer opens these bytes.
    val golden = Array[Int](
      0x42, 0x4D, 0x3A, 0, 0, 0, 0, 0, 0, 0, 0x36, 0, 0, 0, // "BM", size 58, offset 54
      0x28, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0x18, 0, // header 40, 1x1, 1 plane, 24bpp
      0, 0, 0, 0, 4, 0, 0, 0, 0x13, 0x0B, 0, 0, 0x13, 0x0B, 0, 0, // no compression, 4 data bytes, 72dpi
      0, 0, 0, 0, 0, 0, 0, 0, // no palette
      0, 0, 0xFF, 0 // BGR red + row pad
    ).map(_.toByte)
    val encoded = Containers.encodeBmp24(1, 1, (_, _) => (255, 0, 0))
    assert(encoded.sameElements(golden),
      s"BMP bytes diverge from the spec:\n got ${encoded.map("%02X".format(_)).mkString(" ")}")
    val d = Containers.decodeBmp24(golden)
    assert(d == Containers.BmpInfo(1, 1, 24, 58, 0xFF0000, 0xFF0000))
  }

  test("golden bytes: one PCM16 sample encodes as a spec-exact 46-byte WAV") {
    val golden = Array[Int](
      0x52, 0x49, 0x46, 0x46, 0x26, 0, 0, 0, // "RIFF", chunk size 38
      0x57, 0x41, 0x56, 0x45, // "WAVE"
      0x66, 0x6D, 0x74, 0x20, 0x10, 0, 0, 0, // "fmt ", 16
      1, 0, 1, 0, // PCM, mono
      0x80, 0x3E, 0, 0, 0, 0x7D, 0, 0, // 16000 Hz, 32000 B/s
      2, 0, 0x10, 0, // block align 2, 16 bits
      0x64, 0x61, 0x74, 0x61, 2, 0, 0, 0, // "data", 2 bytes
      0xFE, 0xFF // sample -2, little-endian
    ).map(_.toByte)
    val encoded = Containers.encodeWavPcm16(16000, Array((-2).toShort))
    assert(encoded.sameElements(golden),
      s"WAV bytes diverge from the spec:\n got ${encoded.map("%02X".format(_)).mkString(" ")}")
    val d = Containers.decodeWavPcm16(golden)
    assert(d == Containers.WavInfo(16000, 1, 16, 1, -2, -2, -2))
  }

  test("BMP round-trip exercises bottom-up rows and stride padding") {
    // 3x2: stride = 12 (9 data + 3 pad); y-dependent pixels mean a
    // top-down or pad-blind decoder returns the wrong probes
    val d = Containers.decodeBmp24(Containers.encodeBmp24(3, 2,
      (x, y) => (10 * x + 1, 20 * y + 2, x + y)))
    assert(d.width == 3 && d.height == 2)
    assert(d.fileSize == 54 + 12 * 2)
    assert(d.firstPixel == (1 << 16 | 2 << 8 | 0), "image-space (0,0) is the LAST stored row")
    assert(d.lastPixel == (21 << 16 | 22 << 8 | 3))
  }

  test("WAV decoder walks chunks and reads signed samples at odd indices") {
    val samples = Array.tabulate(7)(i => (i * 1000 - 3000).toShort) // includes negatives
    val d = Containers.decodeWavPcm16(Containers.encodeWavPcm16(44100, samples))
    assert(d == Containers.WavInfo(44100, 1, 16, 7, -3000, 0, 3000))
  }

  // ---- PNG: the compressed container (round 7) ----------------------

  private def pngPixel(x: Int, y: Int): (Int, Int, Int) = (x * 40 + 1, y * 50 + 2, x + y)

  test("PNG round-trip: signature, CRCs, zlib, and None/Up unfiltering") {
    val bytes = Png.encode(5, 4, pngPixel)
    assert(bytes.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    val d = Png.decode(bytes)
    assert(d.width == 5 && d.height == 4 && d.bitDepth == 8 && d.colorType == 2)
    assert(d.rawBytes == 4 * (1 + 15), "raw scanline bytes are h*(1+3w)")
    assert(d.firstPixel == (1 << 16 | 2 << 8 | 0))
    assert(d.lastPixel == (161 << 16 | 152 << 8 | 7))
  }

  test("PNG decode rejects a corrupted chunk CRC") {
    val bytes = Png.encode(3, 3, pngPixel)
    bytes(bytes.length - 20) = (bytes(bytes.length - 20) ^ 0x40).toByte // inside IDAT
    val e = intercept[IllegalArgumentException](Png.decode(bytes))
    assert(e.getMessage.contains("CRC"))
  }

  test("PNG decode concatenates split IDAT chunks like real files") {
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + body.length)
      b.putInt(body.length).put(tag.getBytes("US-ASCII")).put(body)
      val crc = new java.util.zip.CRC32
      crc.update(tag.getBytes("US-ASCII")); crc.update(body)
      b.putInt(crc.getValue.toInt).array()
    }
    val whole = Png.encode(4, 4, pngPixel)
    // locate the single IDAT chunk and split its body into two chunks
    val bb = java.nio.ByteBuffer.wrap(whole)
    var off = 8
    while (new String(whole, off + 4, 4, "US-ASCII") != "IDAT") off += 12 + bb.getInt(off)
    val len = bb.getInt(off)
    val body = whole.slice(off + 8, off + 8 + len)
    val (b1, b2) = body.splitAt(len / 2)
    val rebuilt = whole.take(off) ++ chunk("IDAT", b1) ++ chunk("IDAT", b2) ++
      whole.drop(off + 12 + len)
    val d = Png.decode(rebuilt)
    assert(d.nIdatChunks == 2 && d == Png.decode(whole).copy(nIdatChunks = 2))
  }

  test("PNG decoder unfilters all five standard filter types") {
    // hand-build a 2-wide, 5-row image whose rows use filters
    // 0,1,2,3,4 in order, then verify the decoder recovers the pixels
    val w = 2; val stride = w * 3
    val pixels = Array.tabulate(5, stride)((y, i) => (y * 37 + i * 11) % 256)
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until 5) {
      raw.write(y) // filter type = row index
      for (i <- 0 until stride) {
        val x = pixels(y)(i)
        val a = if (i >= 3) pixels(y)(i - 3) else 0
        val b = if (y > 0) pixels(y - 1)(i) else 0
        val c = if (i >= 3 && y > 0) pixels(y - 1)(i - 3) else 0
        val p = a + b - c
        val paeth =
          if (math.abs(p - a) <= math.abs(p - b) && math.abs(p - a) <= math.abs(p - c)) a
          else if (math.abs(p - b) <= math.abs(p - c)) b else c
        val enc = y match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth
        }
        raw.write(enc & 0xff)
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw.toByteArray); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + body.length)
      b.putInt(body.length).put(tag.getBytes("US-ASCII")).put(body)
      val crc = new java.util.zip.CRC32
      crc.update(tag.getBytes("US-ASCII")); crc.update(body)
      b.putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(5)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    val png = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", comp.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
    val d = Png.decode(png)
    def packed(y: Int, x: Int) =
      (pixels(y)(x * 3) << 16) | (pixels(y)(x * 3 + 1) << 8) | pixels(y)(x * 3 + 2)
    assert(d.firstPixel == packed(0, 0))
    assert(d.lastPixel == packed(4, 1),
      "last pixel is reachable only through Sub/Up/Average/Paeth unfiltering chains")
  }
}
