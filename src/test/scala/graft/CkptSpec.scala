package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ckpt

/** Pins [[Ckpt.serRound]]'s release contract: it frees exactly the
  * superseded round's checkpoint blocks, attributed by the
  * checkpoint's OWN LogicalRDD id — never a bystander persist whose
  * first materialization happens to fall inside the eager-checkpoint
  * window (round-11 ADVICE: the old persisted-id keySet diff swept
  * those in and silently unpersisted them a round later). */
class CkptSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ckpt-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("serRound releases the previous round's blocks and ONLY them") {
    val sc = spark.sparkContext
    val (r1, ids1) = Ckpt.serRound(spark.range(1000).toDF("x"), Set.empty)
    assert(ids1.nonEmpty, "round ids must name the checkpoint's RDD")
    assert(ids1.subsetOf(sc.getPersistentRDDs.keySet),
      "the eager checkpoint is persisted when serRound returns")

    // A bystander Dataset cache whose FIRST materialization happens
    // inside the next round's checkpoint window: r2 is derived from it,
    // so ser(r2) forces the InMemoryRelation buffers to persist
    // mid-window. The id-delta version attributed these to the round.
    val persistedBefore = sc.getPersistentRDDs.keySet.toSet
    val bystander = spark.range(1000).toDF("x").cache()
    val (r2, ids2) = Ckpt.serRound(bystander.selectExpr("x + 1 as x"), ids1)
    assert(r2.count() == 1000)
    val persistedAfter = sc.getPersistentRDDs.keySet.toSet
    val bystanderIds = persistedAfter -- persistedBefore -- ids2
    assert(bystanderIds.nonEmpty,
      "test wiring: the lazy cache must first materialize inside the window")
    assert((ids2 & bystanderIds).isEmpty,
      "round ids are the checkpoint's own, not the window's persist delta")
    assert((ids1 & sc.getPersistentRDDs.keySet.toSet).isEmpty,
      "the superseded round's blocks are released deterministically")

    // Releasing round 2 must leave the bystander cache untouched.
    val (r3, ids3) = Ckpt.serRound(r2.selectExpr("x + 1 as x"), ids2)
    assert(r3.count() == 1000)
    assert((ids2 & sc.getPersistentRDDs.keySet.toSet).isEmpty)
    assert(bystanderIds.subsetOf(sc.getPersistentRDDs.keySet),
      "a bystander cache must survive the round release")
    ids3.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    bystander.unpersist()
  }
}
