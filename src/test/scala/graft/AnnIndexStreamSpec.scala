package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VectorOps
import graft.streaming.AnnIndexStream

/** The live streaming half of the LSH funnel (q47/q62/q159's shared
  * buckets + candidate pairs): embeddings arrive through a REAL
  * readStream → foreachBatch pipeline, [[AnnIndexStream]] folds every
  * micro-batch, and after EVERY batch the live signature table AND the
  * live candidate-pair set must equal the from-scratch batch funnel of
  * all vectors seen so far — at the shape [[VectorOps.lshShape]]
  * derives for the CURRENT corpus size, so the batch sequence is
  * deliberately sized to cross a shape boundary (bits 3→4, tables
  * 12→16 at N = 256) and prove the extension path, not just the
  * append path. Also pins replay idempotence and restart-from-disk
  * (the SaIndexStreamSpec / SketchStreamSpec contract). */
class AnnIndexStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ann-index-stream-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // deterministic dense vectors with repeated values across vectors so
  // buckets genuinely collide (candidate pairs are non-trivial)
  private def vec(i: Long): Array[Float] =
    Array.tabulate(64)(j => (((i * 31 + j * 7) % 17) - 8).toFloat / 8f)

  private def df(rows: Seq[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def bucketRows(d: DataFrame): Seq[(Long, Long, Long)] =
    d.select("vec_id", "tk", "bk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(identity)

  private def pairRows(d: DataFrame): Seq[(Long, Long)] =
    d.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)

  /** The from-scratch funnel at the shape the corpus size derives. */
  private def rebuild(rows: Seq[(Long, Array[Float])]): (Seq[(Long, Long, Long)], Seq[(Long, Long)]) = {
    val (bits, nt) = VectorOps.lshShape(rows.size.toLong, 12)
    val b = VectorOps.bucketContrib(df(rows), 0, bits, 0, nt)
      .localCheckpoint(true)
    val p = b.select(col("vec_id").as("a"), col("tk"), col("bk"))
      .join(b.select(col("vec_id").as("b"), col("tk"), col("bk")), Seq("tk", "bk"))
      .filter(col("a") < col("b")).select("a", "b").distinct()
    (bucketRows(b), pairRows(p))
  }

  test("live funnel equals the batch rebuild after every micro-batch, across a shape boundary") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ann-stream").toString
    val maintainer = new AnnIndexStream(spark, s"$root/state")
    val in = MemoryStream[(Long, Array[Float])](spark, numPartitions = 1)
    val q = in.toDS().toDF("vec_id", "embedding").writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(maintainer.sink _)
      .start()
    try {
      // N = 100 → (3, 12); 200 → (3, 12) same-shape append;
      // 320 → (4, 16) crosses the boundary: bit growth on stored
      // signatures AND four brand-new tables; 340 → (4, 16) append
      // again at the widened shape
      val cuts = Seq(0L until 100L, 100L until 200L, 200L until 320L,
        320L until 340L)
      var seen = Seq.empty[(Long, Array[Float])]
      cuts.foreach { ids =>
        val chunk = ids.map(i => (i, vec(i)))
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
        seen ++= chunk
        val (wantB, wantP) = rebuild(seen)
        val (bits, nt) = VectorOps.lshShape(seen.size.toLong, 12)
        assert(maintainer.currentMeta == ((bits, nt, seen.size.toLong)),
          s"shape drifted at n=${seen.size}")
        assert(bucketRows(maintainer.currentBuckets) == wantB,
          s"live buckets diverged from the rebuild at n=${seen.size}")
        assert(pairRows(maintainer.currentPairs) == wantP,
          s"live pairs diverged from the rebuild at n=${seen.size}")
      }
      // the boundary actually moved the shape (the test's whole point)
      assert(VectorOps.lshShape(200L, 12) == ((3, 12)))
      assert(VectorOps.lshShape(340L, 12) == ((4, 16)))
    } finally q.stop()

    // replay idempotence: re-applying the last micro-batch id is a no-op
    val (bBefore, pBefore) =
      (bucketRows(maintainer.currentBuckets), pairRows(maintainer.currentPairs))
    val lastId = maintainer.appliedBatches.last
    maintainer.sink(df((320L until 340L).map(i => (i, vec(i)))), lastId)
    assert(bucketRows(maintainer.currentBuckets) == bBefore)
    assert(pairRows(maintainer.currentPairs) == pBefore)

    // restart: a fresh maintainer on the same root resumes from disk
    // and keeps folding correctly (same-shape append after restart)
    val resumed = new AnnIndexStream(spark, s"$root/state")
    assert(bucketRows(resumed.currentBuckets) == bBefore)
    val extra = (340L until 360L).map(i => (i, vec(i)))
    resumed.sink(df(extra), lastId + 1)
    val (wantB, wantP) = rebuild((0L until 360L).map(i => (i, vec(i))))
    assert(bucketRows(resumed.currentBuckets) == wantB,
      "post-restart fold must still equal the batch rebuild")
    assert(pairRows(resumed.currentPairs) == wantP,
      "post-restart pair fold must still equal the batch rebuild")
    // exactly one index version is retained on disk
    assert(resumed.appliedBatches == Seq(lastId + 1),
      "superseded index versions must be pruned on publish")
  }
}
