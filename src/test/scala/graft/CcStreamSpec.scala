package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps
import graft.streaming.CcStream

/** The live streaming half of the q202 story: edges arrive through a
  * REAL readStream → foreachBatch pipeline, [[CcStream]] folds every
  * micro-batch into parquet-persisted component labels by re-contracting
  * (labels-as-edges ∪ batch) — cost ∝ nodes + batch, never ∝ cumulative
  * edges — and after EVERY batch the live labels must equal the
  * from-scratch star contraction of all edges seen so far (the
  * SaIndexStreamSpec "maintained state ≡ batch recomputation" contract
  * applied to graph connectivity). The batch schedule is adversarial on
  * purpose: components GROW across batches (a chain laid down two edges
  * at a time), MERGE (two separately-built components joined by one
  * late bridge edge), and absorb strictly-interior edges (no-op folds).
  * Also pins replay idempotence and restart-from-disk. */
class CcStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-cc-stream-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def df(es: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    es.toDF("a", "b")
  }

  private def labelRows(d: DataFrame): Seq[(Long, Long)] =
    d.select("node", "comp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)

  private def rebuild(es: Seq[(Long, Long)]): Seq[(Long, Long)] =
    labelRows(GraphOps.connectedComponents(df(es)))

  // chain 10–15 grown two edges at a time; star at 20; component {30,31}
  // and {40,41} built separately, then MERGED by the late 31–40 bridge;
  // final batch is interior-only edges (fold must be a label no-op)
  private val batches: Seq[Seq[(Long, Long)]] = Seq(
    Seq((10L, 11L), (11L, 12L), (30L, 31L)),
    Seq((12L, 13L), (13L, 14L), (20L, 21L), (20L, 22L)),
    Seq((14L, 15L), (40L, 41L), (20L, 23L)),
    Seq((31L, 40L)),
    Seq((10L, 12L), (20L, 21L)))

  test("a live foreachBatch edge stream maintains labels; after every batch they equal the batch rebuild") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cc-stream").toString
    val maintainer = new CcStream(spark, s"$root/state")
    val in = MemoryStream[(Long, Long)](spark, numPartitions = 1)
    val q = in.toDS().toDF("a", "b").writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(maintainer.sink _)
      .start()
    var seen = Seq.empty[(Long, Long)]
    try {
      batches.foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
        seen ++= chunk
        assert(labelRows(maintainer.currentLabels) == rebuild(seen),
          s"live labels diverged from the rebuild after ${seen.size} edges")
      }
    } finally q.stop()

    // the bridge batch actually merged {30,31} and {40,41} into one
    val comps = labelRows(maintainer.currentLabels).map(_._2).distinct
    assert(comps.sorted == Seq(10L, 20L, 30L),
      "expected exactly {10..15}, {20..23} and the bridged {30,31,40,41}")

    // replay: re-sinking the last applied batch id is a no-op
    val before = labelRows(maintainer.currentLabels)
    val lastId = maintainer.appliedBatches.last
    maintainer.sink(df(batches.head), lastId)
    assert(labelRows(maintainer.currentLabels) == before,
      "replayed batch id must not change the published labels")

    // restart: a fresh maintainer on the same root resumes from disk
    val resumed = new CcStream(spark, s"$root/state")
    assert(labelRows(resumed.currentLabels) == before)
    val extra = Seq((15L, 20L))
    resumed.sink(df(extra), lastId + 1)
    assert(labelRows(resumed.currentLabels) == rebuild(seen ++ extra),
      "post-restart fold must still equal the batch rebuild")
    // exactly one label version is retained on disk
    assert(resumed.appliedBatches == Seq(lastId + 1),
      "superseded label versions must be pruned on publish")
  }
}
