package graft.streaming

import java.io.File
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** STREAMING connected-components maintenance — the q202 star
  * contraction driven by a live EDGE stream (the fourth
  * [[SaIndexStream]]/[[SketchStream]]/[[AnnIndexStream]] instance, for
  * the one index family that still rebuilt from scratch on every
  * arrival): a `foreachBatch` sink that folds each arriving micro-batch
  * of edges into live, parquet-persisted component labels.
  *
  * The fold exploits that a star contraction IS a lossless summary of
  * the graph's connectivity: the current labels, read back as edges
  * (node → comp), preserve exactly the components of every edge seen
  * so far, so folding a batch is
  * `connectedComponents(labelEdges ∪ batchEdges)` — cost ∝ (labeled
  * nodes + batch edges), NEVER ∝ cumulative edges. A 100 TB dup graph
  * re-clusters each arrival against its own contraction, not its
  * history: the edge stream can be discarded after folding, the state
  * on disk is one row per clustered node, and the result provably
  * equals the batch rebuild over everything seen (min-id labels are a
  * unique fixpoint; contraction preserves components, so CC∘(contract
  * ∪ batch) = CC∘(all edges) — [[CcStreamSpec]] asserts the equality
  * after EVERY micro-batch, under replay, and across restart).
  *
  * State layout under `root`: `cc_b<id>/` — the labels (node, comp) as
  * of applied micro-batch `id`, written under `tmp_b<id>` and published
  * by rename (the single commit point), after which older `cc_b*`
  * versions are pruned. Crash/replay safety follows the
  * [[DurableEventLog]] idempotent-foreachBatch contract: ids are
  * monotone, and a replayed batch whose `cc_b<id>` exists is a no-op.
  */
final class CcStream(spark: SparkSession, root: String) {
  new File(root).mkdirs()

  /** Micro-batch ids whose labels were published (commit points). */
  def appliedBatches: Seq[Long] =
    Option(new File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("cc_b"))
      .map(_.getName.stripPrefix("cc_b").toLong).toSeq.sorted

  private def emptyLabels: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("node", "comp")
  }

  /** The live labels (node, comp) as of the last applied micro-batch:
    * every node that has appeared in an edge, labeled with its
    * component's minimum node id. */
  def currentLabels: DataFrame = appliedBatches.lastOption
    .map(id => spark.read.parquet(s"$root/cc_b$id"))
    .getOrElse(emptyLabels)

  /** The foreachBatch sink: fold one micro-batch of edges (a, b).
    * Idempotent on replay; empty batches are no-ops. */
  def sink(batch: Dataset[Row], batchId: Long): Unit = synchronized {
    if (!new File(s"$root/cc_b$batchId").exists()) {
      val b = batch.select(col("a"), col("b")).localCheckpoint(true)
      if (!b.isEmpty) {
        val before = appliedBatches
        val labelEdges = currentLabels
          .select(col("node").as("a"), col("comp").as("b"))
        val folded = GraphOps.connectedComponents(labelEdges.union(b))
        folded.write.mode("overwrite").parquet(s"$root/tmp_b$batchId")
        require(new File(s"$root/tmp_b$batchId")
          .renameTo(new File(s"$root/cc_b$batchId")),
          s"could not publish cc_b$batchId")
        before.foreach { old =>
          val dir = new File(s"$root/cc_b$old")
          Option(dir.listFiles()).foreach(_.foreach(_.delete()))
          dir.delete()
        }
      }
    }
  }
}
