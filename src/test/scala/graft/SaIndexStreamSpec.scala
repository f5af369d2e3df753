package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SelectionOps
import graft.streaming.SaIndexStream

/** The live streaming half of the q194 story (round-8 verdict task 7):
  * documents arrive through a REAL readStream → foreachBatch pipeline,
  * [[SaIndexStream]] merge-appends every micro-batch into a parquet-
  * persisted suffix array, and after EVERY batch the live index must
  * equal a from-scratch [[SelectionOps.suffixArrayOf]] rebuild of all
  * documents seen so far — the IncrementalDedupSpec/LayoutSpec
  * "maintained state ≡ batch recomputation" contract applied to the
  * suffix array. Also pins the operational properties the batch twin
  * cannot: replayed micro-batches are no-ops (idempotent foreachBatch),
  * and a RESTARTED maintainer resumes from the on-disk index. */
class SaIndexStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sa-index-stream-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // the SaAppendSpec corpus shape: shared long spans (so ranks collide
  // and the doubling rounds actually run) plus unique tails
  private def salad(seed: Int, n: Int): String =
    (0 until n).map(i => s"w${(seed * 31 + i * 7) % 97}").mkString(" ")
  private val corpus: Seq[(Long, String)] = Seq(
    (1L, salad(1, 30)),
    (2L, salad(1, 30) + " tail two"),
    (3L, salad(2, 24)),
    (4L, "zz " + salad(2, 24)),
    (5L, salad(3, 18) + " " + salad(1, 9)),
    (6L, "a b a b a b a"),
    (7L, salad(4, 21)))

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def saRows(d: DataFrame): Seq[(Long, Long, Long)] =
    d.select("sa_pos", "doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(identity)

  test("a live foreachBatch stream maintains the SA; after every batch it equals the rebuild") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-sa-stream").toString
    val maintainer = new SaIndexStream(spark, s"$root/index")
    val in = MemoryStream[(Long, String)](spark, numPartitions = 1)
    val q = in.toDS().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(maintainer.sink _)
      .start()
    try {
      val batches = Seq(corpus.take(2), corpus.slice(2, 3), corpus.slice(3, 6),
        corpus.drop(6))
      var seen = Seq.empty[(Long, String)]
      batches.foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
        seen ++= chunk
        val live = saRows(maintainer.currentSa)
        val rebuilt = saRows(SelectionOps.suffixArrayOf(df(seen)))
        assert(live == rebuilt,
          s"live index diverged from the rebuild after ${seen.size} docs")
        assert(live.map(_._1) == (1L to live.size).toSeq,
          "live index ranks must stay contiguous 1..N")
      }
    } finally q.stop()

    // replay idempotence: re-applying the last micro-batch id is a no-op
    val before = saRows(maintainer.currentSa)
    val lastId = maintainer.appliedBatches.last
    maintainer.sink(df(corpus.drop(6)), lastId)
    assert(saRows(maintainer.currentSa) == before,
      "replaying an applied micro-batch must not change the index")

    // restart: a fresh maintainer on the same root resumes from disk
    // and keeps append ≡ rebuild for the next batch
    val resumed = new SaIndexStream(spark, s"$root/index")
    assert(saRows(resumed.currentSa) == before, "restart must resume the on-disk index")
    val extra = Seq((8L, "zz zy zx"), (9L, salad(5, 12)))
    resumed.sink(df(extra), lastId + 1)
    assert(saRows(resumed.currentSa) == saRows(SelectionOps.suffixArrayOf(df(corpus ++ extra))),
      "post-restart append must still equal the rebuild")
    // exactly one SA version is retained on disk
    assert(resumed.appliedBatches == Seq(lastId + 1),
      "superseded SA versions must be pruned on publish")
  }
}
