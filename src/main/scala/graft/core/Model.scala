package graft.core

import java.sql.Timestamp

/** Data model for the streaming core, mirroring the wire shapes the
  * reference exchanges (all citations into `/root/reference/`):
  *
  *  - [[Event]]        — `EventNotificationMessage` (src/stream_handler/natsio.rs:67-71)
  *  - [[RelationCtx]]  — `Relation` fan-out context (natsio.rs:78-129,
  *                       iterated at src/server/internal_event_server.rs:51-63)
  *  - [[StreamGroup]]  — stream-group metadata record
  *                       (src/storage_test_server/storage_endpoint_mock.rs:32-38)
  *  - [[Hierarchy]]    — resolved ancestors (storage_endpoint_mock.rs:129-149)
  *
  * Enums travel as Strings (not ints) so Spark plans stay readable and
  * the columns compress well at scale; the numeric protobuf ids of the
  * reference carry no extra information.
  */

/** ResourceType — the six variants matched at natsio.rs:78-129. */
sealed abstract class ResourceType(val name: String) extends Serializable
object ResourceType {
  case object Unspecified extends ResourceType("UNSPECIFIED")
  case object Project extends ResourceType("PROJECT")
  case object Collection extends ResourceType("COLLECTION")
  case object Object extends ResourceType("OBJECT")
  case object ObjectGroup extends ResourceType("OBJECTGROUP")
  case object All extends ResourceType("ALL")
  val values: Seq[ResourceType] = Seq(Unspecified, Project, Collection, Object, ObjectGroup, All)
  def fromName(s: String): ResourceType =
    values.find(_.name == s.toUpperCase).getOrElse(
      throw new IllegalArgumentException(s"unknown ResourceType: $s"))
}

/** EventType — the reference only ever exercises ALL
  * (public_event_server.rs:127, e2e/tests.rs:157); we keep the full set. */
object EventType {
  val All = "ALL"
  val Created = "CREATED"
  val Updated = "UPDATED"
  val Deleted = "DELETED"
}

/** The event row (natsio.rs:67-71) plus the fan-out context it was
  * emitted with and an ingest timestamp (the reference declares
  * sequence/timestamp but never populates them —
  * public_event_server.rs:426-430; we do populate them).
  *
  * `eventId` is a DRIVER-ASSIGNED per-engine emission sequence (0 for
  * rows built outside an engine, e.g. spec fixtures). It exists so
  * delivery-order (`seq`) and the multi-matcher dedup key are derived
  * from ROW CONTENT instead of `monotonically_increasing_id` — a
  * nondeterministic expression whose values a retried/speculative
  * upstream task can renumber, reordering a chunk internally or
  * re-keying a message between join branches (SPARK-23207 class;
  * round-13 ADVICE + VERDICT task 6). Because the id is assigned
  * BEFORE the row enters Spark, every recompute sees the same value. */
final case class Event(
    resource: String,   // ResourceType name
    eventType: String,  // EventType name
    resourceId: String,
    project: String,            // RelationCtx inlined for Dataset ergonomics
    collection: String,
    sharedObject: String,
    objectGroups: Seq[String],  // shared_object_group_ids (natsio.rs:92,107)
    ts: Timestamp,
    eventId: Long = 0L)

object Event {
  def apply(resource: ResourceType, eventType: String, resourceId: String,
            ctx: RelationCtx, ts: Timestamp): Event =
    Event(resource.name, eventType, resourceId,
      ctx.project, ctx.collection, ctx.sharedObject, ctx.objectGroups, ts)
}

/** Fan-out context — `Relation` (natsio.rs:78-129). */
final case class RelationCtx(
    project: String = "",
    collection: String = "",
    sharedObject: String = "",
    objectGroups: Seq[String] = Seq.empty)

/** Subscription record — the reference's stream-group metadata
  * (storage_endpoint_mock.rs:32-38) plus the compiled filter subject
  * (natsio.rs:176-182 registers it as the JetStream consumer's
  * `filter_subject`; we store it and filter with [[Subjects.matchesLit]]).
  *
  * `extraFilterSubjects` completes the reference's MULTI-HIERARCHY
  * request arm: its create path takes `hierarchies[0]` only and errors
  * when empty (public_event_server.rs:145-152), although a resource can
  * sit in several hierarchies (N ancestor chains → N filter subjects).
  * Here ONE group carries the UNION of its hierarchies' compiled
  * matchers; delivery matches a message against ANY of them and
  * delivers it ONCE (the JetStream multi-filter-subject consumer
  * semantic). Single-hierarchy groups keep the primary field alone —
  * wire format, WAL, and existing call sites are unchanged. */
final case class StreamGroup(
    id: String,
    resourceType: String,
    resourceId: String,
    eventType: String,
    notifyOnSubResource: Boolean,
    filterSubject: String,
    extraFilterSubjects: Seq[String] = Seq.empty) {
  /** All compiled matchers, primary first. */
  def filterSubjects: Seq[String] = filterSubject +: extraFilterSubjects
}

/** Resolved ancestor chain (storage_endpoint_mock.rs:129-149). The mock
  * returns project/collection/object ids; object queries additionally
  * need the shared ids (utils.rs:91-126), so we carry them too. */
final case class Hierarchy(
    projectId: String = "",
    collectionId: String = "",
    sharedObjectId: String = "",
    objectId: String = "",
    sharedObjectGroupId: String = "",
    objectGroupId: String = "")

/** One delivered chunk awaiting ack — the reference's
  * `ack_chunks: HashMap<chunk_id, Vec<Message>>`
  * (public_event_server.rs:318-319,416-420). The client-facing,
  * payload-hydrated view: engines materialize it on demand from the
  * distributed deliveries table (see `streaming.DeliveryTable`). */
final case class DeliveryChunk(
    groupId: String,
    chunkId: String,
    batchId: Long,
    subjects: Seq[String],
    resourceIds: Seq[String],
    deliveredAt: Timestamp,
    acked: Boolean)

/** Driver-resident chunk METADATA — what the delivery ledger and its
  * WAL actually hold. The payload (subjects/resourceIds) lives in the
  * partitioned deliveries table, written by executors inside
  * foreachBatch; keeping only ids+counts on the driver is what removes
  * the reference's every-event-through-the-driver bottleneck at scale
  * (the reference holds full `Vec<Message>`s in its in-server map). */
final case class ChunkMeta(
    groupId: String,
    chunkId: String,
    batchId: Long,
    rows: Long,
    deliveredAt: Timestamp,
    acked: Boolean)
