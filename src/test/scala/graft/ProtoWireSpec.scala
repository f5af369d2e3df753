package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core._
import graft.streaming.{FanOut, ProtoWire}

/** Wire fidelity of the protobuf payload codec (natsio.rs:67-74 /
  * public_event_server.rs:425): golden byte-for-byte vectors computed
  * BY HAND from the protobuf encoding spec, a round-trip property, a
  * prost-semantics decode (field order, unknown-field skip), and a
  * differential proof that the codegen'd Column face emits exactly the
  * scalar encoder's bytes. */
class ProtoWireSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-protowire-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("golden vectors: hand-computed wire bytes") {
    // PROJECT(1), ALL(4), "p1": tag 0x08 varint 1, tag 0x10 varint 4,
    // tag 0x1A len 2 + UTF-8
    assert(ProtoWire.encodeEvent("PROJECT", "ALL", "p1").toSeq ==
      Seq(0x08, 0x01, 0x10, 0x04, 0x1A, 0x02, 'p'.toInt, '1'.toInt).map(_.toByte))
    // proto3 omits defaults: everything at zero encodes to NOTHING
    assert(ProtoWire.encodeEvent("UNSPECIFIED", "UNSPECIFIED", "").isEmpty)
    // partial defaults: only the non-default field appears
    assert(ProtoWire.encodeEvent("COLLECTION", "UNSPECIFIED", "").toSeq ==
      Seq(0x08, 0x02).map(_.toByte))
    // multi-byte varint: length 200 = 0xC8 0x01 little-endian base-128
    val longId = "x" * 200
    val enc = ProtoWire.encodeEvent("UNSPECIFIED", "UNSPECIFIED", longId)
    assert(enc.take(3).toSeq == Seq(0x1A, 0xC8, 0x01).map(_.toByte))
    assert(enc.length == 3 + 200)
    // multi-byte varint in a VALUE position (scalar face allows any id)
    assert(ProtoWire.encodeEvent(300, 0, "").toSeq ==
      Seq(0x08, 0xAC, 0x02).map(_.toByte))
    // UTF-8: length counts BYTES, not chars ("é" is 2 bytes)
    assert(ProtoWire.encodeEvent(0, 0, "é").toSeq ==
      Seq(0x1A, 0x02, 0xC3, 0xA9).map(_.toByte))
  }

  test("decode: round-trip, any field order, unknown fields skipped") {
    for {
      r <- ProtoWire.resourceTypeId.values
      u <- ProtoWire.eventTypeId.values
      id <- Seq("", "p1", "é-ünïcødé", "y" * 300)
    } {
      val (r2, u2, id2) = ProtoWire.decodeEvent(ProtoWire.encodeEvent(r, u, id))
      assert((r2, u2, id2) == (r, u, id), s"round-trip failed for ($r, $u, $id)")
    }
    // a conforming decoder accepts fields in ANY order
    val reordered = Array(0x1A, 0x01, 'x'.toInt, 0x08, 0x02).map(_.toByte)
    assert(ProtoWire.decodeEvent(reordered) == ((2, 0, "x")))
    // unknown field 4 (varint) and field 5 (length-delimited) are
    // skipped by wire type, like any generated decoder
    val withUnknown = Array(
      0x20, 0x07,                   // field 4, varint 7
      0x2A, 0x02, 0xFF, 0xFF,       // field 5, 2 opaque bytes
      0x08, 0x01).map(_.toByte)     // field 1 = 1
    assert(ProtoWire.decodeEvent(withUnknown) == ((1, 0, "")))
  }

  test("Column face emits byte-identical payloads to the scalar encoder") {
    import spark.implicits._
    val id: Gen[String] = Gen.listOf(Gen.frequency(
      9 -> Gen.alphaNumChar, 1 -> Gen.oneOf('é', 'ß', '中'))).map(_.mkString)
    val evGen = for {
      r <- Gen.oneOf(ProtoWire.resourceTypeId.keys.toSeq)
      u <- Gen.oneOf(ProtoWire.eventTypeId.keys.toSeq)
      rid <- Gen.oneOf(id, Gen.const("z" * 150)) // exercise 2-byte varint
    } yield (r, u, rid)
    val cases = (1 to 400).map(i => evGen.pureApply(Gen.Parameters.default, Seed(i)))
    val viaColumn = cases.toDF("resource", "eventType", "resourceId")
      .select(ProtoWire.payloadCol(
        org.apache.spark.sql.functions.col("resource"),
        org.apache.spark.sql.functions.col("eventType"),
        org.apache.spark.sql.functions.col("resourceId")).as("p"))
      .collect().map(_.getAs[Array[Byte]]("p").toSeq)
    val viaScalar = cases.map { case (r, u, rid) =>
      ProtoWire.encodeEvent(r, u, rid).toSeq }
    assert(viaColumn.toSeq == viaScalar)
  }

  test("fan-out rows carry the decodable wire payload") {
    import spark.implicits._
    val events = Seq(
      Event("PROJECT", "ALL", "p1", "p1", "", "", Seq.empty, new Timestamp(0L)),
      Event("COLLECTION", "CREATED", "c1", "p1", "c1", "", Seq.empty, new Timestamp(1L)))
    val rows = FanOut.explodeSubjects(events.toDF())
      .select("payload", "resource", "eventType", "resourceId").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (res, up, id) = ProtoWire.decodeEvent(r.getAs[Array[Byte]]("payload"))
      assert(ProtoWire.resourceTypeId(r.getString(1)) == res)
      assert(ProtoWire.eventTypeId(r.getString(2)) == up)
      assert(r.getString(3) == id)
    }
  }
}
