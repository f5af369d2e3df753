package graft.streaming

import java.io.File
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{SelectionOps, SketchOps}

/** STREAMING sketch maintenance — the q197/q198/q199/q200/q203
  * mergeability claim made operational (the [[SaIndexStream]] pattern
  * applied to summary state): a `foreachBatch` sink that folds each
  * arriving micro-batch of documents into live, parquet-persisted CMS,
  * KMV, quantile, Bloom and weighted-sample states. This is the
  * sketches' whole value proposition at 100 TB: the state on disk is
  * KILOBYTES (≤4096 CMS cells + k·|sources| KMV hashes + k·|sources|
  * quantile-sample rows + m/32 Bloom words + the 100-row weighted
  * draw), a batch update costs one pass over the BATCH — the corpus is
  * never re-read — and because all five merges are associative
  * ([[SketchOps.cmsMerge]] bucket addition; [[SketchOps.kmvTopK]],
  * [[SketchOps.qsMerge]] and
  * [[graft.operators.SelectionOps.wsampleMerge]] re-minimization;
  * [[SketchOps.bloomMerge]] word-wise OR), the live state is provably
  * identical to the batch sketch of everything seen so far, which is
  * exactly what [[SketchStreamSpec]] asserts after every micro-batch.
  * (q201's Misra–Gries summary deliberately stays OUT of this sink:
  * its counter values depend on the merge tree, so a live fold could
  * not hash-match a canonical rebuild — its arbitrary-tree merge law
  * is SketchSpec's property check instead.)
  *
  * State layout under `root`: `sk_b<id>/cms`, `sk_b<id>/kmv`,
  * `sk_b<id>/qnt`, `sk_b<id>/bloom` and `sk_b<id>/wsample` — one
  * directory per applied micro-batch, written
  * under `tmp_b<id>` and published by rename (the single commit
  * point), after which older `sk_b*` versions are pruned, so storage
  * holds exactly one sketch version (all five states). Crash/replay safety follows the
  * idempotent-foreachBatch
  * contract ([[DurableEventLog]], [[SaIndexStream]]): batch ids are
  * monotone and a replayed id whose `sk_b<id>` exists is a no-op; a
  * crash between the two child writes leaves only an unpublished
  * `tmp_b<id>`, invisible to readers, and the retry's overwrite
  * converges. */
final class SketchStream(spark: SparkSession, root: String,
    bloomM: Long = 1L << 18) {
  new File(root).mkdirs()

  private def batchIds: Seq[Long] =
    Option(new File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("sk_b"))
      .map(_.getName.stripPrefix("sk_b").toLong).toSeq.sorted

  /** Micro-batch ids whose merged sketches were published. */
  def appliedBatches: Seq[Long] = batchIds

  private def emptyCms: DataFrame = {
    import spark.implicits._
    Seq.empty[(Int, Int, Long)].toDF("row", "bucket", "cnt")
  }

  private def emptyKmv: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long)].toDF("source", "hv")
  }

  private def emptyQnt: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, String, Long)].toDF("g", "h", "rid", "v")
  }

  private def emptyBloom: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("widx", "bits")
  }

  private def emptyWsample: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String, Long, Long)].toDF("doc_id", "source", "w", "hv_min")
  }

  /** The live CMS state (row, bucket, cnt) as of the last batch. */
  def currentCms: DataFrame = appliedBatches.lastOption
    .map(id => spark.read.parquet(s"$root/sk_b$id/cms"))
    .getOrElse(emptyCms)

  /** The live KMV state (source, hv) as of the last batch. */
  def currentKmv: DataFrame = appliedBatches.lastOption
    .map(id => spark.read.parquet(s"$root/sk_b$id/kmv"))
    .getOrElse(emptyKmv)

  /** The live quantile-sketch state (g, h, rid, v) — per source, the
    * k rows of minimal (h, rid) with v = token count (q199's bottom-k
    * hash sample over the document stream). */
  def currentQnt: DataFrame = appliedBatches.lastOption
    .map(id => spark.read.parquet(s"$root/sk_b$id/qnt"))
    .getOrElse(emptyQnt)

  /** The live Bloom membership state (widx, bits) — `bloomM` bits of
    * packed words over every shingle seen so far (q200's filter, width
    * FIXED at construction: filters of different widths cannot merge).
    * Word-wise OR is idempotent, so this is the replay-safest of the
    * four folds — a re-applied batch is a literal no-op on the bits. */
  def currentBloom: DataFrame = appliedBatches.lastOption
    .map(id => spark.read.parquet(s"$root/sk_b$id/bloom"))
    .getOrElse(emptyBloom)

  /** The live weighted-sample state (doc_id, source, w, hv_min) —
    * q203's 100-row Efraimidis–Spirakis draw over every document seen
    * so far. A doc's key is a pure content-addressed function of the
    * doc, so the fold is one batch-side map pass + a bottom-k
    * re-minimization against the 100-row state, and a replayed batch
    * dedups to a no-op. */
  def currentWsample: DataFrame = appliedBatches.lastOption
    .map(id => spark.read.parquet(s"$root/sk_b$id/wsample"))
    .getOrElse(emptyWsample)

  /** The foreachBatch sink: fold one micro-batch of documents
    * (doc_id, text, source) into both sketches. Idempotent on replay;
    * empty batches are no-ops. */
  def sink(batch: Dataset[Row], batchId: Long): Unit = synchronized {
    if (!new File(s"$root/sk_b$batchId").exists()) {
      val b = batch.select(col("doc_id"), col("source"), col("text"))
        .localCheckpoint(true)
      if (!b.isEmpty) {
        val before = appliedBatches
        val sh = SketchOps.shingleStreamOf(b).localCheckpoint(true)
        val cms = SketchOps.cmsMerge(currentCms, SketchOps.cmsOf(sh.select("w")))
        // distinct: a hash already in the state must not double-count
        // toward this source's k minima
        val kmv = SketchOps.kmvTopK(
          currentKmv.union(SketchOps.kmvHashes(sh)).distinct())
        // quantile sketch: re-minimize the union (qsMerge dedups rows,
        // so a replayed document cannot occupy two of the k slots)
        val qnt = SketchOps.qsMerge(currentQnt, SketchOps.qsRowsOf(b))
        val blm = SketchOps.bloomMerge(currentBloom,
          SketchOps.bloomOf(sh.select("w").distinct(), bloomM))
        val wsp = SelectionOps.wsampleMerge(currentWsample,
          SelectionOps.wsampleKeysOf(b))
        cms.write.mode("overwrite").parquet(s"$root/tmp_b$batchId/cms")
        kmv.write.mode("overwrite").parquet(s"$root/tmp_b$batchId/kmv")
        qnt.write.mode("overwrite").parquet(s"$root/tmp_b$batchId/qnt")
        blm.write.mode("overwrite").parquet(s"$root/tmp_b$batchId/bloom")
        wsp.write.mode("overwrite").parquet(s"$root/tmp_b$batchId/wsample")
        require(new File(s"$root/tmp_b$batchId")
          .renameTo(new File(s"$root/sk_b$batchId")),
          s"could not publish sk_b$batchId")
        before.foreach { old =>
          val dir = new File(s"$root/sk_b$old")
          Seq("cms", "kmv", "qnt", "bloom", "wsample").foreach { sub =>
            val d = new File(dir, sub)
            Option(d.listFiles()).foreach(_.foreach(_.delete()))
            d.delete()
          }
          dir.delete()
        }
      }
    }
  }
}
