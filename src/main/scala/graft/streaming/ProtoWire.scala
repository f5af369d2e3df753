package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Protobuf wire-format codec for the publish payload — the one
  * remaining byte-level divergence of earlier rounds, closed without a
  * dependency: the reference prost-encodes
  * `EventNotificationMessage { resource, updated_type, resource_id }`
  * before publishing (`/root/reference/src/stream_handler/natsio.rs:67-74`)
  * and prost-decodes it at delivery (`public_event_server.rs:425`);
  * this object produces/consumes the same wire bytes.
  *
  * Wire layout (the protobuf encoding spec, which prost implements):
  *  - field 1 `resource`     (enum, varint)            tag 0x08
  *  - field 2 `updated_type` (enum, varint)            tag 0x10
  *  - field 3 `resource_id`  (string, length-delimited) tag 0x1A
  *  - proto3 default values are OMITTED: a zero enum / empty string
  *    contributes no bytes (prost's `encode_to_vec` behavior);
  *  - varints are little-endian base-128 with the high bit as the
  *    continuation flag.
  *
  * Field and enum NUMBERS are declared here as the repo's canonical
  * mapping: the upstream `.proto` lives in the external aruna-rust-api
  * crate (not vendored into the reference), so the assignment below
  * follows the generated struct's field order (natsio.rs:68-71) and the
  * v1 enum declaration order. Given the same numbers, the byte stream
  * is exactly what prost emits — the golden vectors in ProtoWireSpec
  * are hand-computed from the wire spec above.
  *
  * Two faces, one format:
  *  - scalar [[encodeEvent]]/[[decodeEvent]] — the protocol/spec seam;
  *  - [[payloadCol]] — the SAME encoding as a pure built-in Column
  *    expression (byte literals + `encode`/`concat`/`unhex`), so the
  *    streaming ingest path stays inside whole-stage codegen with no
  *    UDF, exactly like the fan-out it rides with.
  */
object ProtoWire {
  /** storage/models/v1 `ResourceType` numbering (declaration order). */
  val resourceTypeId: Map[String, Int] = Map(
    "UNSPECIFIED" -> 0, "PROJECT" -> 1, "COLLECTION" -> 2,
    "OBJECT" -> 3, "OBJECTGROUP" -> 4, "ALL" -> 5)

  /** notification/services/v1 `EventType` numbering (declaration order). */
  val eventTypeId: Map[String, Int] = Map(
    "UNSPECIFIED" -> 0, "CREATED" -> 1, "UPDATED" -> 2,
    "DELETED" -> 3, "ALL" -> 4)

  private[streaming] def writeVarint(out: java.io.ByteArrayOutputStream, n0: Long): Unit = {
    var n = n0
    while ((n & ~0x7FL) != 0L) { out.write(((n & 0x7F) | 0x80).toInt); n >>>= 7 }
    out.write(n.toInt)
  }

  /** prost-parity encode (proto3: default fields omitted). */
  def encodeEvent(resource: Int, updatedType: Int, resourceId: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (resource != 0) { out.write(0x08); writeVarint(out, resource.toLong) }
    if (updatedType != 0) { out.write(0x10); writeVarint(out, updatedType.toLong) }
    val idb = resourceId.getBytes(UTF_8)
    if (idb.nonEmpty) { out.write(0x1A); writeVarint(out, idb.length.toLong); out.write(idb, 0, idb.length) }
    out.toByteArray
  }

  /** Name-keyed convenience over the enum tables. */
  def encodeEvent(resource: String, eventType: String, resourceId: String): Array[Byte] =
    encodeEvent(resourceTypeId.getOrElse(resource, 0),
      eventTypeId.getOrElse(eventType, 0), resourceId)

  /** prost-parity decode: any field order, unknown fields skipped by
    * wire type (what a generated decoder does), absent fields default.
    * Returns (resource, updated_type, resource_id). */
  def decodeEvent(bytes: Array[Byte]): (Int, Int, String) = {
    var i = 0
    def varint(): Long = {
      var shift = 0; var v = 0L; var more = true
      while (more) {
        require(i < bytes.length, "truncated varint")
        val b = bytes(i); i += 1
        v |= (b & 0x7FL) << shift; shift += 7; more = (b & 0x80) != 0
      }
      v
    }
    var resource = 0; var updated = 0; var id = ""
    while (i < bytes.length) {
      val tag = varint()
      val (field, wire) = ((tag >>> 3).toInt, (tag & 7).toInt)
      (field, wire) match {
        case (1, 0) => resource = varint().toInt
        case (2, 0) => updated = varint().toInt
        case (3, 2) =>
          val len = varint().toInt
          require(i + len <= bytes.length, "truncated string field")
          id = new String(bytes, i, len, UTF_8); i += len
        case (_, 0) => varint(); ()                       // skip unknown varint
        case (_, 2) => val len = varint().toInt; i += len // skip unknown bytes
        case (_, 5) => i += 4                             // skip 32-bit
        case (_, 1) => i += 8                             // skip 64-bit
        case _ => throw new IllegalArgumentException(s"unsupported wire type $wire")
      }
    }
    (resource, updated, id)
  }

  // ---- Column face: identical bytes, built from codegen'd built-ins --

  private val emptyBin = lit(Array.empty[Byte])

  /** One byte from an int column in [0, 255]. */
  private def byteCol(n: Column): Column = unhex(lpad(hex(n), 2, "0"))

  /** Tag+value bytes for an enum field: the (tag, id) pair is a
    * CONSTANT per enum name, so each branch is a 2-byte literal and the
    * whole lookup folds into the fan-out's existing `when` chain.
    * Unknown names encode as UNSPECIFIED (0) = omitted — the proto3
    * open-enum default. */
  private def enumField(tagByte: Int, name: Column, ids: Map[String, Int]): Column =
    ids.filter(_._2 != 0).foldLeft(when(lit(false), emptyBin)) { case (acc, (n, id)) =>
      acc.when(name === n, lit(Array(tagByte.toByte, id.toByte)))
    }.otherwise(emptyBin)

  /** `resource_id` as tag 0x1A + varint byte length + UTF-8 bytes.
    * Varint branches cover lengths < 2^21 (ids are short tokens; the
    * subject grammar rejects dots/wildcards, nothing near 2 MB). */
  private def idField(id: Column): Column = {
    val idb = encode(id, "UTF-8")
    val len = length(idb)
    // Column `/` is DOUBLE division — varint byte math needs `div`
    def d(c: Column, by: Int): Column = floor(c / by).cast("int")
    val varint =
      when(len < 128, byteCol(len))
        .when(len < 16384,
          concat(byteCol(len % 128 + 128), byteCol(d(len, 128))))
        .otherwise(
          concat(byteCol(len % 128 + 128), byteCol(d(len, 128) % 128 + 128),
            byteCol(d(len, 16384))))
    when(len === 0, emptyBin)
      .otherwise(concat(lit(Array(0x1A.toByte)), varint, idb))
  }

  /** The full message as a BINARY column — bit-identical to
    * [[encodeEvent]] (ProtoWireSpec proves it differentially). */
  def payloadCol(resource: Column, eventType: Column, resourceId: Column): Column =
    concat(
      enumField(0x08, resource, resourceTypeId),
      enumField(0x10, eventType, eventTypeId),
      idField(resourceId))
}
