package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import scala.collection.mutable.ArrayBuffer

/** HPACK header compression (RFC 7541) — the header layer of the
  * hand-rolled h2c transport ([[H2c]]), built the same dependency-free
  * way [[ProtoWire]] hand-rolls proto3: the public spec, primitive by
  * primitive, pinned by the RFC's own Appendix C golden vectors in
  * H2cSpec.
  *
  * Decode implements the full required surface — indexed fields
  * (static + dynamic table), all three literal forms, dynamic-table
  * size updates, and Huffman-coded string literals (Appendix B code
  * table; stock gRPC clients Huffman-encode method paths, so a server
  * claiming "a tonic client could connect" cannot skip it). Encode
  * uses exact-match/name-match static indexing plus literals
  * without indexing (Huffman optional per call — encoders MAY always
  * send raw, RFC 7541 §5.2), which is all a server response needs.
  *
  * Each connection direction owns one [[Hpack]] instance: the dynamic
  * table is connection state (RFC 7541 §2.2), never shared across
  * connections or directions. */
final class Hpack {

  import Hpack._

  // ---- dynamic table (decode side) ----------------------------------

  private val dynamic = ArrayBuffer.empty[(String, String)] // most recent first
  private var maxSize = 4096
  private var curSize = 0

  private def entrySize(e: (String, String)): Int = e._1.length + e._2.length + 32

  private def evict(): Unit =
    while (curSize > maxSize && dynamic.nonEmpty) {
      curSize -= entrySize(dynamic.remove(dynamic.size - 1))
    }

  private def addEntry(name: String, value: String): Unit = {
    dynamic.insert(0, (name, value))
    curSize += entrySize((name, value))
    evict()
  }

  private def lookup(index: Int): (String, String) =
    if (index >= 1 && index <= StaticTable.length) StaticTable(index - 1)
    else {
      val di = index - StaticTable.length - 1
      require(di >= 0 && di < dynamic.size, s"HPACK index $index out of range")
      dynamic(di)
    }

  // ---- decode -------------------------------------------------------

  /** Decodes one header block into (name, value) pairs in order. */
  def decode(block: Array[Byte]): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var i = 0
    def readInt(prefixBits: Int): Long = {
      val mask = (1 << prefixBits) - 1
      var v = (block(i) & mask).toLong; i += 1
      if (v == mask) {
        var shift = 0; var more = true
        while (more) {
          require(i < block.length, "truncated HPACK integer")
          val b = block(i); i += 1
          v += (b & 0x7FL) << shift; shift += 7; more = (b & 0x80) != 0
        }
      }
      v
    }
    def readString(): String = {
      val huff = (block(i) & 0x80) != 0
      val len = readInt(7).toInt
      require(i + len <= block.length, "truncated HPACK string")
      val raw = java.util.Arrays.copyOfRange(block, i, i + len); i += len
      if (huff) huffmanDecode(raw) else new String(raw, ISO_8859_1)
    }
    while (i < block.length) {
      val b = block(i) & 0xFF
      if ((b & 0x80) != 0) { // indexed (§6.1)
        val idx = readInt(7).toInt
        require(idx != 0, "HPACK index 0 is a decoding error")
        out += lookup(idx)
      } else if ((b & 0xC0) == 0x40) { // literal, incremental indexing (§6.2.1)
        val idx = readInt(6).toInt
        val name = if (idx == 0) readString() else lookup(idx)._1
        val value = readString()
        addEntry(name, value)
        out += ((name, value))
      } else if ((b & 0xE0) == 0x20) { // table size update (§6.3)
        maxSize = readInt(5).toInt
        evict()
      } else { // literal without indexing / never indexed (§6.2.2/§6.2.3)
        val idx = readInt(4).toInt
        val name = if (idx == 0) readString() else lookup(idx)._1
        val value = readString()
        out += ((name, value))
      }
    }
    out.result()
  }

  // ---- encode -------------------------------------------------------

  /** Encodes a header list: exact static matches as indexed fields,
    * static name matches as literal-without-indexing with the indexed
    * name, the rest as full literals. Never touches the dynamic table
    * (stateless output — correct for any peer). */
  def encode(headers: Seq[(String, String)], huffman: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def writeInt(prefixBits: Int, firstByteHigh: Int, v0: Long): Unit = {
      val mask = (1 << prefixBits) - 1
      var v = v0
      if (v < mask) out.write(firstByteHigh | v.toInt)
      else {
        out.write(firstByteHigh | mask); v -= mask
        while (v >= 0x80) { out.write(((v & 0x7F) | 0x80).toInt); v >>= 7 }
        out.write(v.toInt)
      }
    }
    def writeString(s: String): Unit = {
      val raw = s.getBytes(ISO_8859_1)
      val enc = if (huffman) huffmanEncode(raw) else raw
      // Huffman only when it actually shrinks (RFC: encoders choose)
      if (huffman && enc.length < raw.length) {
        writeInt(7, 0x80, enc.length.toLong); out.write(enc, 0, enc.length)
      } else {
        writeInt(7, 0x00, raw.length.toLong); out.write(raw, 0, raw.length)
      }
    }
    headers.foreach { case (name, value) =>
      StaticIndex.get((name, value)) match {
        case Some(idx) => writeInt(7, 0x80, idx.toLong)
        case None =>
          StaticNameIndex.get(name) match {
            case Some(idx) => writeInt(4, 0x00, idx.toLong); writeString(value)
            case None => out.write(0x00); writeString(name); writeString(value)
          }
      }
    }
    out.toByteArray
  }
}

object Hpack {

  /** RFC 7541 Appendix A — the 61-entry static table. */
  val StaticTable: Array[(String, String)] = Array(
    (":authority", ""), (":method", "GET"), (":method", "POST"), (":path", "/"),
    (":path", "/index.html"), (":scheme", "http"), (":scheme", "https"),
    (":status", "200"), (":status", "204"), (":status", "206"), (":status", "304"),
    (":status", "400"), (":status", "404"), (":status", "500"),
    ("accept-charset", ""), ("accept-encoding", "gzip, deflate"),
    ("accept-language", ""), ("accept-ranges", ""), ("accept", ""),
    ("access-control-allow-origin", ""), ("age", ""), ("allow", ""),
    ("authorization", ""), ("cache-control", ""), ("content-disposition", ""),
    ("content-encoding", ""), ("content-language", ""), ("content-length", ""),
    ("content-location", ""), ("content-range", ""), ("content-type", ""),
    ("cookie", ""), ("date", ""), ("etag", ""), ("expect", ""), ("expires", ""),
    ("from", ""), ("host", ""), ("if-match", ""), ("if-modified-since", ""),
    ("if-none-match", ""), ("if-range", ""), ("if-unmodified-since", ""),
    ("last-modified", ""), ("link", ""), ("location", ""), ("max-forwards", ""),
    ("proxy-authenticate", ""), ("proxy-authorization", ""), ("range", ""),
    ("referer", ""), ("refresh", ""), ("retry-after", ""), ("server", ""),
    ("set-cookie", ""), ("strict-transport-security", ""),
    ("transfer-encoding", ""), ("user-agent", ""), ("vary", ""), ("via", ""),
    ("www-authenticate", ""))

  private val StaticIndex: Map[(String, String), Int] =
    StaticTable.zipWithIndex.map { case (e, i) => e -> (i + 1) }.toMap
  private val StaticNameIndex: Map[String, Int] =
    StaticTable.zipWithIndex.reverse.map { case ((n, _), i) => n -> (i + 1) }.toMap

  /** RFC 7541 Appendix B — Huffman code per symbol 0..255 + EOS(256),
    * as (code, bitLength). */
  val HuffmanCodes: Array[(Int, Int)] = Array(
    (0x1ff8, 13), (0x7fffd8, 23), (0xfffffe2, 28), (0xfffffe3, 28),
    (0xfffffe4, 28), (0xfffffe5, 28), (0xfffffe6, 28), (0xfffffe7, 28),
    (0xfffffe8, 28), (0xffffea, 24), (0x3ffffffc, 30), (0xfffffe9, 28),
    (0xfffffea, 28), (0x3ffffffd, 30), (0xfffffeb, 28), (0xfffffec, 28),
    (0xfffffed, 28), (0xfffffee, 28), (0xfffffef, 28), (0xffffff0, 28),
    (0xffffff1, 28), (0xffffff2, 28), (0x3ffffffe, 30), (0xffffff3, 28),
    (0xffffff4, 28), (0xffffff5, 28), (0xffffff6, 28), (0xffffff7, 28),
    (0xffffff8, 28), (0xffffff9, 28), (0xffffffa, 28), (0xffffffb, 28),
    (0x14, 6), (0x3f8, 10), (0x3f9, 10), (0xffa, 12), (0x1ff9, 13),
    (0x15, 6), (0xf8, 8), (0x7fa, 11), (0x3fa, 10), (0x3fb, 10), (0xf9, 8),
    (0x7fb, 11), (0xfa, 8), (0x16, 6), (0x17, 6), (0x18, 6), (0x0, 5),
    (0x1, 5), (0x2, 5), (0x19, 6), (0x1a, 6), (0x1b, 6), (0x1c, 6),
    (0x1d, 6), (0x1e, 6), (0x1f, 6), (0x5c, 7), (0xfb, 8), (0x7ffc, 15),
    (0x20, 6), (0xffb, 12), (0x3fc, 10), (0x1ffa, 13), (0x21, 6), (0x5d, 7),
    (0x5e, 7), (0x5f, 7), (0x60, 7), (0x61, 7), (0x62, 7), (0x63, 7),
    (0x64, 7), (0x65, 7), (0x66, 7), (0x67, 7), (0x68, 7), (0x69, 7),
    (0x6a, 7), (0x6b, 7), (0x6c, 7), (0x6d, 7), (0x6e, 7), (0x6f, 7),
    (0x70, 7), (0x71, 7), (0x72, 7), (0xfc, 8), (0x73, 7), (0xfd, 8),
    (0x1ffb, 13), (0x7fff0, 19), (0x1ffc, 13), (0x3ffc, 14), (0x22, 6),
    (0x7ffd, 15), (0x3, 5), (0x23, 6), (0x4, 5), (0x24, 6), (0x5, 5),
    (0x25, 6), (0x26, 6), (0x27, 6), (0x6, 5), (0x74, 7), (0x75, 7),
    (0x28, 6), (0x29, 6), (0x2a, 6), (0x7, 5), (0x2b, 6), (0x76, 7),
    (0x2c, 6), (0x8, 5), (0x9, 5), (0x2d, 6), (0x77, 7), (0x78, 7),
    (0x79, 7), (0x7a, 7), (0x7b, 7), (0x7ffe, 15), (0x7fc, 11), (0x3ffd, 14),
    (0x1ffd, 13), (0xffffffc, 28), (0xfffe6, 20), (0x3fffd2, 22),
    (0xfffe7, 20), (0xfffe8, 20), (0x3fffd3, 22), (0x3fffd4, 22),
    (0x3fffd5, 22), (0x7fffd9, 23), (0x3fffd6, 22), (0x7fffda, 23),
    (0x7fffdb, 23), (0x7fffdc, 23), (0x7fffdd, 23), (0x7fffde, 23),
    (0xffffeb, 24), (0x7fffdf, 23), (0xffffec, 24), (0xffffed, 24),
    (0x3fffd7, 22), (0x7fffe0, 23), (0xffffee, 24), (0x7fffe1, 23),
    (0x7fffe2, 23), (0x7fffe3, 23), (0x7fffe4, 23), (0x1fffdc, 21),
    (0x3fffd8, 22), (0x7fffe5, 23), (0x3fffd9, 22), (0x7fffe6, 23),
    (0x7fffe7, 23), (0xffffef, 24), (0x3fffda, 22), (0x1fffdd, 21),
    (0xfffe9, 20), (0x3fffdb, 22), (0x3fffdc, 22), (0x7fffe8, 23),
    (0x7fffe9, 23), (0x1fffde, 21), (0x7fffea, 23), (0x3fffdd, 22),
    (0x3fffde, 22), (0xfffff0, 24), (0x1fffdf, 21), (0x3fffdf, 22),
    (0x7fffeb, 23), (0x7fffec, 23), (0x1fffe0, 21), (0x1fffe1, 21),
    (0x3fffe0, 22), (0x1fffe2, 21), (0x7fffed, 23), (0x3fffe1, 22),
    (0x7fffee, 23), (0x7fffef, 23), (0xfffea, 20), (0x3fffe2, 22),
    (0x3fffe3, 22), (0x3fffe4, 22), (0x7ffff0, 23), (0x3fffe5, 22),
    (0x3fffe6, 22), (0x7ffff1, 23), (0x3ffffe0, 26), (0x3ffffe1, 26),
    (0xfffeb, 20), (0x7fff1, 19), (0x3fffe7, 22), (0x7ffff2, 23),
    (0x3fffe8, 22), (0x1ffffec, 25), (0x3ffffe2, 26), (0x3ffffe3, 26),
    (0x3ffffe4, 26), (0x7ffffde, 27), (0x7ffffdf, 27), (0x3ffffe5, 26),
    (0xfffff1, 24), (0x1ffffed, 25), (0x7fff2, 19), (0x1fffe3, 21),
    (0x3ffffe6, 26), (0x7ffffe0, 27), (0x7ffffe1, 27), (0x3ffffe7, 26),
    (0x7ffffe2, 27), (0xfffff2, 24), (0x1fffe4, 21), (0x1fffe5, 21),
    (0x3ffffe8, 26), (0x3ffffe9, 26), (0xffffffd, 28), (0x7ffffe3, 27),
    (0x7ffffe4, 27), (0x7ffffe5, 27), (0xfffec, 20), (0xfffff3, 24),
    (0xfffed, 20), (0x1fffe6, 21), (0x3fffe9, 22), (0x1fffe7, 21),
    (0x1fffe8, 21), (0x7ffff3, 23), (0x3fffea, 22), (0x3fffeb, 22),
    (0x1ffffee, 25), (0x1ffffef, 25), (0xfffff4, 24), (0xfffff5, 24),
    (0x3ffffea, 26), (0x7ffff4, 23), (0x3ffffeb, 26), (0x7ffffe6, 27),
    (0x3ffffec, 26), (0x3ffffed, 26), (0x7ffffe7, 27), (0x7ffffe8, 27),
    (0x7ffffe9, 27), (0x7ffffea, 27), (0x7ffffeb, 27), (0xffffffe, 28),
    (0x7ffffec, 27), (0x7ffffed, 27), (0x7ffffee, 27), (0x7ffffef, 27),
    (0x7fffff0, 27), (0x3ffffee, 26), (0x3fffffff, 30))

  // Decode trie: arrays of (left, right) child indices; leaves hold the
  // symbol. Built once from the code table.
  private val trieChildren = ArrayBuffer[(Int, Int)]((-1, -1))
  private val trieSymbol = ArrayBuffer[Int](-1)
  HuffmanCodes.zipWithIndex.foreach { case ((code, len), sym) =>
    var node = 0
    var bit = len - 1
    while (bit >= 0) {
      val goRight = ((code >>> bit) & 1) == 1
      val (l, r) = trieChildren(node)
      val next = if (goRight) r else l
      val child = if (next == -1) {
        trieChildren += ((-1, -1)); trieSymbol += -1
        val id = trieChildren.size - 1
        trieChildren(node) = if (goRight) (l, id) else (id, r)
        id
      } else next
      node = child
      bit -= 1
    }
    trieSymbol(node) = sym
  }

  def huffmanDecode(data: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder()
    var node = 0
    var depth = 0
    var pathAllOnes = true
    data.foreach { b =>
      var bit = 7
      while (bit >= 0) {
        val goRight = ((b >>> bit) & 1) == 1
        val (l, r) = trieChildren(node)
        node = if (goRight) r else l
        require(node != -1, "invalid Huffman code")
        depth += 1
        pathAllOnes &&= goRight
        val sym = trieSymbol(node)
        if (sym >= 0) {
          require(sym != 256, "EOS inside Huffman string is a decoding error")
          sb.append(sym.toChar)
          node = 0; depth = 0; pathAllOnes = true
        }
        bit -= 1
      }
    }
    // trailing bits must be a prefix of EOS (all ones), ≤ 7 bits — the
    // padding rule (RFC 7541 §5.2); a leftover path that took any
    // 0-branch is NOT an EOS prefix and is a decoding error.
    require(depth <= 7, "Huffman padding longer than 7 bits")
    require(depth == 0 || pathAllOnes, "Huffman padding is not an EOS prefix")
    new String(sb)
  }

  def huffmanEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    data.foreach { b =>
      val (code, len) = HuffmanCodes(b & 0xFF)
      acc = (acc << len) | (code.toLong & ((1L << len) - 1))
      nbits += len
      while (nbits >= 8) {
        out.write(((acc >>> (nbits - 8)) & 0xFF).toInt)
        nbits -= 8
      }
    }
    if (nbits > 0) {
      // pad with EOS prefix (all ones)
      val pad = 8 - nbits
      out.write((((acc << pad) | ((1 << pad) - 1)) & 0xFF).toInt)
    }
    out.toByteArray
  }
}
