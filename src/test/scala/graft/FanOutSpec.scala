package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core._
import graft.streaming.FanOut

/** Differential test: the codegen'd Column fan-out must agree with an
  * independent pure-Scala model of natsio.rs:78-129 on generated events. */
class FanOutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-fanout-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** The reference fan-out, restated directly from the match arms. */
  private def model(e: Event): Seq[String] = e.resource match {
    case "PROJECT" => Seq(Subjects.projectSubject(e.resourceId))
    case "COLLECTION" => Seq(Subjects.collectionSubject(e.project, e.resourceId))
    case "OBJECTGROUP" =>
      e.objectGroups.map(g => Subjects.objectGroupSubject(e.project, e.collection, g, e.resourceId))
    case "OBJECT" =>
      e.objectGroups.map(g => Subjects.objectGroupSubject(e.project, e.collection, g, e.resourceId)) :+
        Subjects.objectSubject(e.project, e.collection, e.sharedObject, e.resourceId)
    case _ => Seq.empty
  }

  test("Column fan-out agrees with the pure model on generated events") {
    import spark.implicits._
    val id: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val resGen = Gen.oneOf("PROJECT", "COLLECTION", "OBJECT", "OBJECTGROUP")
    val evGen = for {
      r <- resGen; rid <- id; p <- id; c <- id; so <- id
      gs <- Gen.listOfN(3, id).map(_.distinct)
      ng <- Gen.choose(0, 3)
    } yield Event(r, "ALL", rid, p, c, so, gs.take(ng), new Timestamp(0L))
    val events = (1 to 300).map(i => evGen.pureApply(Gen.Parameters.default, Seed(i)))

    val viaColumns = FanOut.explodeSubjects(events.toDF())
      .groupBy("resourceId").agg(
        org.apache.spark.sql.functions.collect_list("subject").as("subjects"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).sorted).toMap

    val viaModel = events.flatMap(e => model(e).map(e.resourceId -> _))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }

    assert(viaColumns == viaModel)
  }
}
