package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import graft.core.{DeliveryChunk, Hierarchy, RelationCtx}

/** The NETWORK-FACING message layer — the repo's analog of the
  * reference's protobuf service surface, hand-encoded in proto3 wire
  * format with the same dependency-free primitives as [[ProtoWire]].
  *
  * What is mirrored and what diverges (both deliberate, both
  * documented):
  *  - MESSAGE layer: mirrored. The reference's bidi
  *    `ReadStreamGroupMessagesRequest` is a oneof of Init{stream_group
  *    _id} and Ack{chunk_ids} (public_event_server.rs:192-247,
  *    read_stream_group_messages_request::StreamAction), its unary RPCs
  *    are CreateEventStreamingGroup / DeleteEventStreamingGroup
  *    (:52,:177), and the internal server carries emit
  *    (internal_event_server.rs:18). [[WireRequest]] is exactly that
  *    oneof, extended with the explicit Close arm (the reference closes
  *    via its `close: bool` flag, :321-323) and a Poll arm (the pull
  *    analog of its push loop — natsio.rs:198-204 bounded batches).
  *  - TRANSPORT layer: diverges. tonic gives the reference gRPC over
  *    HTTP/2; this repo is offline with no codegen or HTTP stack, so
  *    frames are 4-byte big-endian length prefixes over TCP — the
  *    standard protobuf stream framing. Token rides IN the message
  *    (the reference carries it in gRPC metadata, :201-215 — a
  *    transport facility we do not have).
  *
  * Every encoder follows prost/proto3 conventions byte-for-byte:
  * default-valued fields omitted, oneof arms present-with-length-0 when
  * empty, unknown fields skipped by wire type on decode
  * ([[ProtoWireSpec]] establishes the conventions; [[WireBoundarySpec]]
  * pins these messages with golden bytes + round-trips). */
object WireProtocol {

  // ---- requests -----------------------------------------------------

  sealed trait WireRequest
  final case class Init(streamGroupId: String, token: Option[String] = None) extends WireRequest
  final case class Ack(chunkIds: Seq[String]) extends WireRequest
  case object Close extends WireRequest
  case object Poll extends WireRequest
  /** `hierarchy` + `moreHierarchies` model the reference request's
    * REPEATED `hierarchies` field (the arm it truncates to
    * `hierarchies[0]`, public_event_server.rs:145-152): every element
    * encodes as one more occurrence of field 4, so a single-hierarchy
    * message is byte-identical to the pre-round-13 form (golden bytes
    * unchanged) and a multi-hierarchy create routes to the engines'
    * union-of-matchers registration. */
  final case class CreateGroup(groupId: String, resourceType: String, resourceId: String,
                               hierarchy: Hierarchy, includeSub: Boolean,
                               eventType: String, token: Option[String] = None,
                               moreHierarchies: Seq[Hierarchy] = Seq.empty) extends WireRequest {
    def hierarchies: Seq[Hierarchy] = hierarchy +: moreHierarchies
  }
  final case class DeleteGroup(groupId: String) extends WireRequest
  final case class Emit(resourceType: String, eventType: String, resourceId: String,
                        relation: RelationCtx, token: Option[String] = None) extends WireRequest

  // ---- responses ----------------------------------------------------

  sealed trait WireResponse
  /** One deliverable chunk — the repo's delivery unit, matching the
    * reference's per-stream `ack_chunks` batches keyed by chunk id
    * (public_event_server.rs:318-319,416-420). */
  final case class Notification(groupId: String, chunkId: String, batchId: Long,
                                subjects: Seq[String], resourceIds: Seq[String]) extends WireResponse
  /** In-session failure as a stream element (the reference's error
    * channel, public_event_server.rs:325,395-401). */
  final case class WireError(message: String) extends WireResponse
  /** Terminator of every request's reply sequence. */
  case object Ok extends WireResponse

  def toNotification(c: DeliveryChunk): Notification =
    Notification(c.groupId, c.chunkId, c.batchId, c.subjects, c.resourceIds)

  // ---- proto3 primitives -------------------------------------------

  private def tag(field: Int, wire: Int): Int = (field << 3) | wire

  private final class W {
    val out = new ByteArrayOutputStream()
    def varint(field: Int, v: Long): Unit =
      if (v != 0L) { ProtoWire.writeVarint(out, tag(field, 0).toLong); ProtoWire.writeVarint(out, v) }
    def bool(field: Int, v: Boolean): Unit = varint(field, if (v) 1L else 0L)
    def str(field: Int, v: String): Unit = if (v.nonEmpty) bytes(field, v.getBytes(UTF_8))
    def strs(field: Int, vs: Seq[String]): Unit = vs.foreach(v => bytes(field, v.getBytes(UTF_8)))
    def bytes(field: Int, b: Array[Byte]): Unit = {
      ProtoWire.writeVarint(out, tag(field, 2).toLong)
      ProtoWire.writeVarint(out, b.length.toLong)
      out.write(b, 0, b.length)
    }
    /** Oneof arm / nested message: ALWAYS emitted, even when empty —
      * presence is the arm's identity (prost encodes `Some(Empty)` as
      * tag + length 0). */
    def msg(field: Int, body: W): Unit = bytes(field, body.out.toByteArray)
    def result(): Array[Byte] = out.toByteArray
  }

  private final class R(bytes: Array[Byte]) {
    private var i = 0
    def hasMore: Boolean = i < bytes.length
    def varint(): Long = {
      var shift = 0; var v = 0L; var more = true
      while (more) {
        require(i < bytes.length, "truncated varint")
        val b = bytes(i); i += 1
        v |= (b & 0x7FL) << shift; shift += 7; more = (b & 0x80) != 0
      }
      v
    }
    def key(): (Int, Int) = { val t = varint(); ((t >>> 3).toInt, (t & 7).toInt) }
    def lenBytes(): Array[Byte] = {
      val len = varint().toInt
      require(i + len <= bytes.length, "truncated length-delimited field")
      val b = java.util.Arrays.copyOfRange(bytes, i, i + len); i += len; b
    }
    def str(): String = new String(lenBytes(), UTF_8)
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 2 => lenBytes(); ()
      case 5 => i += 4
      case 1 => i += 8
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  // ---- request codec ------------------------------------------------

  private def hierarchyW(h: Hierarchy): W = {
    val w = new W
    w.str(1, h.projectId); w.str(2, h.collectionId); w.str(3, h.sharedObjectId)
    w.str(4, h.objectId); w.str(5, h.sharedObjectGroupId); w.str(6, h.objectGroupId)
    w
  }

  private def relationW(r: RelationCtx): W = {
    val w = new W
    w.str(1, r.project); w.str(2, r.collection); w.str(3, r.sharedObject)
    w.strs(4, r.objectGroups)
    w
  }

  def encodeRequest(req: WireRequest): Array[Byte] = {
    val w = new W
    req match {
      case Init(id, token) =>
        val b = new W; b.str(1, id); token.foreach(b.str(2, _)); w.msg(1, b)
      case Ack(ids) =>
        val b = new W; b.strs(1, ids); w.msg(2, b)
      case Close => w.msg(3, new W)
      case cg @ CreateGroup(id, rt, rid, _, sub, et, token, _) =>
        val b = new W
        b.str(1, id); b.str(2, rt); b.str(3, rid)
        cg.hierarchies.foreach(h => b.msg(4, hierarchyW(h))) // repeated
        b.bool(5, sub); b.str(6, et); token.foreach(b.str(7, _))
        w.msg(4, b)
      case DeleteGroup(id) =>
        val b = new W; b.str(1, id); w.msg(5, b)
      case Emit(rt, et, rid, rel, token) =>
        val b = new W
        b.str(1, rt); b.str(2, et); b.str(3, rid); b.msg(4, relationW(rel))
        token.foreach(b.str(5, _))
        w.msg(6, b)
      case Poll => w.msg(7, new W)
    }
    w.result()
  }

  private def decodeHierarchy(bytes: Array[Byte]): Hierarchy = {
    val r = new R(bytes)
    var h = Hierarchy()
    while (r.hasMore) r.key() match {
      case (1, 2) => h = h.copy(projectId = r.str())
      case (2, 2) => h = h.copy(collectionId = r.str())
      case (3, 2) => h = h.copy(sharedObjectId = r.str())
      case (4, 2) => h = h.copy(objectId = r.str())
      case (5, 2) => h = h.copy(sharedObjectGroupId = r.str())
      case (6, 2) => h = h.copy(objectGroupId = r.str())
      case (_, w) => r.skip(w)
    }
    h
  }

  private def decodeRelation(bytes: Array[Byte]): RelationCtx = {
    val r = new R(bytes)
    var rel = RelationCtx()
    while (r.hasMore) r.key() match {
      case (1, 2) => rel = rel.copy(project = r.str())
      case (2, 2) => rel = rel.copy(collection = r.str())
      case (3, 2) => rel = rel.copy(sharedObject = r.str())
      case (4, 2) => rel = rel.copy(objectGroups = rel.objectGroups :+ r.str())
      case (_, w) => r.skip(w)
    }
    rel
  }

  def decodeRequest(bytes: Array[Byte]): WireRequest = {
    val r = new R(bytes)
    var req: Option[WireRequest] = None
    while (r.hasMore) r.key() match {
      case (1, 2) =>
        val b = new R(r.lenBytes())
        var id = ""; var token: Option[String] = None
        while (b.hasMore) b.key() match {
          case (1, 2) => id = b.str()
          case (2, 2) => token = Some(b.str())
          case (_, w) => b.skip(w)
        }
        req = Some(Init(id, token))
      case (2, 2) =>
        val b = new R(r.lenBytes())
        val ids = Seq.newBuilder[String]
        while (b.hasMore) b.key() match {
          case (1, 2) => ids += b.str()
          case (_, w) => b.skip(w)
        }
        req = Some(Ack(ids.result()))
      case (3, 2) => r.lenBytes(); req = Some(Close)
      case (4, 2) =>
        val b = new R(r.lenBytes())
        var id = ""; var rt = ""; var rid = ""
        val hs = Seq.newBuilder[Hierarchy] // repeated field 4
        var sub = false; var et = ""; var token: Option[String] = None
        while (b.hasMore) b.key() match {
          case (1, 2) => id = b.str()
          case (2, 2) => rt = b.str()
          case (3, 2) => rid = b.str()
          case (4, 2) => hs += decodeHierarchy(b.lenBytes())
          case (5, 0) => sub = b.varint() != 0L
          case (6, 2) => et = b.str()
          case (7, 2) => token = Some(b.str())
          case (_, w) => b.skip(w)
        }
        val all = hs.result()
        req = Some(CreateGroup(id, rt, rid,
          all.headOption.getOrElse(Hierarchy()), sub, et, token,
          if (all.isEmpty) Seq.empty else all.tail))
      case (5, 2) =>
        val b = new R(r.lenBytes())
        var id = ""
        while (b.hasMore) b.key() match {
          case (1, 2) => id = b.str()
          case (_, w) => b.skip(w)
        }
        req = Some(DeleteGroup(id))
      case (6, 2) =>
        val b = new R(r.lenBytes())
        var rt = ""; var et = ""; var rid = ""
        var rel = RelationCtx(); var token: Option[String] = None
        while (b.hasMore) b.key() match {
          case (1, 2) => rt = b.str()
          case (2, 2) => et = b.str()
          case (3, 2) => rid = b.str()
          case (4, 2) => rel = decodeRelation(b.lenBytes())
          case (5, 2) => token = Some(b.str())
          case (_, w) => b.skip(w)
        }
        req = Some(Emit(rt, et, rid, rel, token))
      case (7, 2) => r.lenBytes(); req = Some(Poll)
      case (_, w) => r.skip(w)
    }
    req.getOrElse(throw new IllegalArgumentException("could not read stream action value"))
  }

  // ---- response codec -----------------------------------------------

  def encodeResponse(resp: WireResponse): Array[Byte] = {
    val w = new W
    resp match {
      case Notification(gid, cid, bid, subjects, rids) =>
        val b = new W
        b.str(1, gid); b.str(2, cid); b.varint(3, bid)
        b.strs(4, subjects); b.strs(5, rids)
        w.msg(1, b)
      case WireError(msg) =>
        val b = new W; b.str(1, msg); w.msg(2, b)
      case Ok => w.msg(3, new W)
    }
    w.result()
  }

  def decodeResponse(bytes: Array[Byte]): WireResponse = {
    val r = new R(bytes)
    var resp: Option[WireResponse] = None
    while (r.hasMore) r.key() match {
      case (1, 2) =>
        val b = new R(r.lenBytes())
        var gid = ""; var cid = ""; var bid = 0L
        val subjects = Seq.newBuilder[String]; val rids = Seq.newBuilder[String]
        while (b.hasMore) b.key() match {
          case (1, 2) => gid = b.str()
          case (2, 2) => cid = b.str()
          case (3, 0) => bid = b.varint()
          case (4, 2) => subjects += b.str()
          case (5, 2) => rids += b.str()
          case (_, w) => b.skip(w)
        }
        resp = Some(Notification(gid, cid, bid, subjects.result(), rids.result()))
      case (2, 2) =>
        val b = new R(r.lenBytes())
        var msg = ""
        while (b.hasMore) b.key() match {
          case (1, 2) => msg = b.str()
          case (_, w) => b.skip(w)
        }
        resp = Some(WireError(msg))
      case (3, 2) => r.lenBytes(); resp = Some(Ok)
      case (_, w) => r.skip(w)
    }
    resp.getOrElse(throw new IllegalArgumentException("empty response frame"))
  }

  // ---- framing ------------------------------------------------------

  /** 4-byte big-endian length prefix (the standard protobuf stream
    * framing; the reference gets HTTP/2 frames from tonic instead). */
  def writeFrame(out: java.io.DataOutputStream, bytes: Array[Byte]): Unit = {
    out.writeInt(bytes.length)
    out.write(bytes)
    out.flush()
  }

  /** Reads one frame; None on clean EOF at a frame boundary. */
  def readFrame(in: java.io.DataInputStream): Option[Array[Byte]] = {
    val len =
      try in.readInt()
      catch { case _: java.io.EOFException => return None }
    require(len >= 0 && len <= 64 * 1024 * 1024, s"bad frame length $len")
    val buf = new Array[Byte](len)
    in.readFully(buf)
    Some(buf)
  }
}
