package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SketchOps
import graft.streaming.SketchStream

/** The live streaming half of the q197/q198/q199/q200 story: documents
  * arrive through a REAL readStream → foreachBatch pipeline,
  * [[SketchStream]] folds every micro-batch into parquet-persisted
  * CMS, KMV and quantile-sketch state, and after EVERY batch the live
  * sketches must equal the from-scratch
  * batch sketches of all documents seen so far — the SaIndexStreamSpec
  * "maintained state ≡ batch recomputation" contract applied to
  * mergeable summaries. This is the operational proof of the merge
  * algebra SketchSpec pins statically: CMS merges by bucket addition,
  * KMV by re-minimizing the union, so per-batch cost is ∝ batch while
  * the state stays fixed-size. Also pins replay idempotence and
  * restart-from-disk. */
class SketchStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sketch-stream-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // enough distinct shingles per source that the KMV top-k ordering is
  // non-trivial, plus cross-source shared runs so sketches overlap
  private def prose(seed: Int, n: Int): String =
    (0 until n).map(i => s"w${(seed * 53 + i * 11) % 211}").mkString(" ")
  private val corpus: Seq[(Long, String, String)] = Seq(
    (1L, prose(1, 80), "alpha"),
    (2L, prose(1, 60) + " " + prose(2, 40), "alpha"),
    (3L, prose(2, 90), "beta"),
    (4L, prose(3, 70), "beta"),
    (5L, prose(1, 30) + " " + prose(3, 50), "gamma"),
    (6L, prose(4, 85), "gamma"),
    (7L, prose(2, 25) + " tail x y", "alpha"))

  private def df(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  private def cmsRows(d: DataFrame): Seq[(Int, Int, Long)] =
    d.select("row", "bucket", "cnt").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sortBy(identity)

  private def kmvRows(d: DataFrame): Seq[(String, Long)] =
    d.select("source", "hv").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(identity)

  private def batchCms(rows: Seq[(Long, String, String)]): Seq[(Int, Int, Long)] =
    cmsRows(SketchOps.cmsOf(SketchOps.shingleStreamOf(df(rows)).select("w")))

  private def batchKmv(rows: Seq[(Long, String, String)]): Seq[(String, Long)] =
    kmvRows(SketchOps.kmvTopK(SketchOps.kmvHashes(SketchOps.shingleStreamOf(df(rows)))))

  private def qntRows(d: DataFrame): Seq[(String, Long, String, Long)] =
    d.select("g", "h", "rid", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(identity)

  private def batchQnt(rows: Seq[(Long, String, String)]): Seq[(String, Long, String, Long)] =
    qntRows(SketchOps.qsTopK(SketchOps.qsRowsOf(df(rows))))

  // spec-sized Bloom width (the stream fixes m at construction)
  private val bloomM = 1L << 12

  private def bloomRows(d: DataFrame): Seq[(Long, Long)] =
    d.select("widx", "bits").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)

  private def batchBloom(rows: Seq[(Long, String, String)]): Seq[(Long, Long)] =
    bloomRows(SketchOps.bloomOf(
      SketchOps.shingleStreamOf(df(rows)).select("w").distinct(), bloomM))

  private def wsRows(d: DataFrame): Seq[(Long, String, Long, Long)] =
    d.select("doc_id", "source", "w", "hv_min").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(identity)

  private def batchWsample(rows: Seq[(Long, String, String)]): Seq[(Long, String, Long, Long)] =
    wsRows(graft.operators.SelectionOps.wsampleKeysOf(df(rows))
      .orderBy("hv_min", "doc_id").limit(graft.operators.SelectionOps.WsK))

  test("a live foreachBatch stream maintains both sketches; after every batch they equal the batch rebuild") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-sketch-stream").toString
    val maintainer = new SketchStream(spark, s"$root/state", bloomM)
    val in = MemoryStream[(Long, String, String)](spark, numPartitions = 1)
    val q = in.toDS().toDF("doc_id", "text", "source").writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(maintainer.sink _)
      .start()
    try {
      val batches = Seq(corpus.take(2), corpus.slice(2, 4), corpus.slice(4, 6),
        corpus.drop(6))
      var seen = Seq.empty[(Long, String, String)]
      batches.foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
        seen ++= chunk
        assert(cmsRows(maintainer.currentCms) == batchCms(seen),
          s"live CMS diverged from the batch sketch after ${seen.size} docs")
        assert(kmvRows(maintainer.currentKmv) == batchKmv(seen),
          s"live KMV diverged from the batch sketch after ${seen.size} docs")
        assert(qntRows(maintainer.currentQnt) == batchQnt(seen),
          s"live quantile sketch diverged from the batch sketch after ${seen.size} docs")
        assert(bloomRows(maintainer.currentBloom) == batchBloom(seen),
          s"live Bloom filter diverged from the batch filter after ${seen.size} docs")
        assert(wsRows(maintainer.currentWsample) == batchWsample(seen),
          s"live weighted sample diverged from the batch draw after ${seen.size} docs")
      }
    } finally q.stop()

    // replay idempotence: re-applying the last micro-batch id is a no-op
    val (cmsBefore, kmvBefore, qntBefore) =
      (cmsRows(maintainer.currentCms), kmvRows(maintainer.currentKmv),
        qntRows(maintainer.currentQnt))
    val bloomBefore = bloomRows(maintainer.currentBloom)
    val wsBefore = wsRows(maintainer.currentWsample)
    val lastId = maintainer.appliedBatches.last
    maintainer.sink(df(corpus.drop(6)), lastId)
    assert(cmsRows(maintainer.currentCms) == cmsBefore)
    assert(kmvRows(maintainer.currentKmv) == kmvBefore)
    assert(qntRows(maintainer.currentQnt) == qntBefore)
    assert(bloomRows(maintainer.currentBloom) == bloomBefore)
    assert(wsRows(maintainer.currentWsample) == wsBefore)

    // restart: a fresh maintainer on the same root resumes from disk
    val resumed = new SketchStream(spark, s"$root/state", bloomM)
    assert(cmsRows(resumed.currentCms) == cmsBefore)
    val extra = Seq((8L, prose(5, 75), "delta"), (9L, prose(1, 45), "alpha"))
    resumed.sink(df(extra), lastId + 1)
    assert(cmsRows(resumed.currentCms) == batchCms(corpus ++ extra),
      "post-restart CMS fold must still equal the batch sketch")
    assert(kmvRows(resumed.currentKmv) == batchKmv(corpus ++ extra),
      "post-restart KMV fold must still equal the batch sketch")
    assert(qntRows(resumed.currentQnt) == batchQnt(corpus ++ extra),
      "post-restart quantile fold must still equal the batch sketch")
    assert(bloomRows(resumed.currentBloom) == batchBloom(corpus ++ extra),
      "post-restart Bloom fold must still equal the batch filter")
    assert(wsRows(resumed.currentWsample) == batchWsample(corpus ++ extra),
      "post-restart weighted-sample fold must still equal the batch draw")
    // exactly one sketch version is retained on disk
    assert(resumed.appliedBatches == Seq(lastId + 1),
      "superseded sketch versions must be pruned on publish")
  }
}
