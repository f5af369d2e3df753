package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Subjects

/** R4 — per-event 1→N subject fan-out
  * (`/root/reference/src/stream_handler/natsio.rs:78-129`), as a pure
  * Column expression so it runs inside whole-stage codegen on both the
  * batch and the streaming path (no UDF, no collect):
  *
  *  - PROJECT      → [ project_subject(resource_id) ]
  *  - COLLECTION   → [ collection_subject(relation.project, resource_id) ]
  *  - OBJECTGROUP  → one object-group subject per relation.object_groups
  *  - OBJECT       → its object-groups' subjects PLUS its own object
  *                   subject (natsio.rs:104-127 — the arm that makes
  *                   object events visible to group subscribers)
  *
  * The reference leaves Unspecified/All as `todo!()` (natsio.rs:79,128);
  * here they produce an empty set (no publish), the only semantics
  * consistent with the subject grammar.
  */
object FanOut {
  def subjectsCol(resource: Column, resourceId: Column, project: Column,
                  collection: Column, sharedObject: Column, objectGroups: Column): Column = {
    val groupSubjects = transform(objectGroups,
      g => Subjects.objectGroupSubjectCol(project, collection, g, resourceId))
    when(resource === "PROJECT",
        array(Subjects.projectSubjectCol(resourceId)))
      .when(resource === "COLLECTION",
        array(Subjects.collectionSubjectCol(project, resourceId)))
      .when(resource === "OBJECTGROUP", groupSubjects)
      .when(resource === "OBJECT",
        concat(groupSubjects,
          array(Subjects.objectSubjectCol(project, collection, sharedObject, resourceId))))
      .otherwise(array().cast("array<string>"))
  }

  /** Fan a Dataset[Event]-shaped frame out into one row per (event,
    * subject), the engine's event-log row format. Wire payload is the
    * protobuf-encoded `EventNotificationMessage` (natsio.rs:67-74), as
    * BINARY, via [[ProtoWire.payloadCol]] — byte-for-byte the
    * reference's wire bytes, still a pure codegen'd Column (no UDF).
    *
    * `eventId` (driver-assigned emission sequence, see
    * [[graft.core.Event]]) and `spos` (this subject's position in the
    * event's fan-out array, via posexplode) together identify one
    * published message deterministically from row content — the basis
    * for [[seqCol]] and the multi-matcher dedup key, replacing
    * `monotonically_increasing_id` (VERDICT round-13 task 6). */
  def explodeSubjects(events: DataFrame): DataFrame =
    events
      .withColumn("subjects", subjectsCol(col("resource"), col("resourceId"),
        col("project"), col("collection"), col("sharedObject"), col("objectGroups")))
      .select(col("*"), posexplode(col("subjects")).as(Seq("spos", "subject")))
      .withColumn("payload",
        ProtoWire.payloadCol(col("resource"), col("eventType"), col("resourceId")))
      .select("subject", "payload", "resource", "eventType", "resourceId", "ts",
        "eventId", "spos")

  /** Content-derived delivery-order key of one published message:
    * emission order (eventId), fan-out position within the event
    * (spos) as tiebreak. The 20-bit split supports 2^43 events per
    * engine incarnation and 2^20 subjects per event (an object's
    * fan-out is one subject per object group — a million-group object
    * would wrap the tiebreak, never the event order). Deterministic
    * under task retries because both inputs are row content. */
  def seqCol: Column = shiftleft(col("eventId"), 20) + col("spos")
}
