package graft.streaming

import java.io.File
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** STREAMING ANN-index maintenance — the third instance of the
  * [[SaIndexStream]]/[[SketchStream]] pattern (round-9 verdict task 4),
  * applied to the LSH funnel that q47/q62/q159 share: a `foreachBatch`
  * sink that folds each arriving micro-batch of embeddings into a
  * LIVE, parquet-persisted bucket-signature table `(vec_id, tk, bk)`
  * and candidate-pair set `(a, b)` — the two memoized stages of the
  * batch funnel ([[VectorOps]] sharedBuckets/adaptiveCands), which
  * until now were rebuild-only: one arriving embedding invalidated the
  * whole funnel.
  *
  * Incrementality has two regimes, both exact:
  *
  *  - SAME SHAPE (the steady state): a signature is a pure per-vector
  *    function of the broadcast planes, so the batch's rows are
  *    computed from the BATCH alone and appended; new candidate pairs
  *    are the batch signatures equi-joined against the merged bucket
  *    table on `(tk, bk)` — cost ∝ batch × bucket occupancy, and the
  *    dedup (`distinct`) runs on the ADD-set only, never the stored
  *    pair set (a pair involves ≥1 batch vector, so the add-set is
  *    disjoint from the stored pairs by construction).
  *  - SHAPE BOUNDARY (O(log N) times in a corpus's life —
  *    [[VectorOps.lshShape]] widens as N doubles): stored signatures
  *    EXTEND instead of rebuilding. The stride-12 plane seeds give
  *    table k's bit i an absolute weight `1 << i`, so growing `bits`
  *    is one map-only [[VectorOps.bucketContrib]] pass over the old
  *    corpus ADDED to the stored signatures, and new tables are one
  *    contrib pass over old + batch for `tk ∈ [ntOld, nt)`. Only the
  *    pair set pays a corpus-shaped stage here (one self-equi-join
  *    rebuild): growing bits SPLITS buckets — a subset relation the
  *    stored (a, b) list cannot express without the signatures — so
  *    the rebuild is the honest amortized cost, paid at doublings,
  *    not per batch.
  *
  * State layout under `root` (the [[SaIndexStream]] commit protocol):
  *  - `emb_b<id>/` — the embeddings of micro-batch `id`, written
  *    BEFORE the index is published; shards above the last published
  *    id are invisible (a crash orphan converges on replay).
  *  - `ann_b<id>/{buckets,pairs,meta}` — the index as of batch `id`;
  *    the directory rename from `tmp_b<id>` IS the commit point, after
  *    which older `ann_b*` versions are pruned. `meta` pins the shape
  *    `(bits, nt, n)` the stored signatures were built at, so a
  *    restart resumes at the exact boundary arithmetic.
  *
  * [[AnnIndexStreamSpec]] proves live ≡ rebuild (buckets AND pairs)
  * after EVERY micro-batch, across a shape boundary, under replay, and
  * after restart-from-disk — the q161 "append, never rebuild" contract
  * for the vector funnel. */
final class AnnIndexStream(spark: SparkSession, root: String) {
  new File(root).mkdirs()

  private def batchIds(prefix: String): Seq[Long] =
    Option(new File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .map(_.getName.stripPrefix(prefix).toLong).toSeq.sorted

  /** Micro-batch ids whose merged index was published (commit points). */
  def appliedBatches: Seq[Long] = batchIds("ann_b")

  private def emptyBuckets: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long)].toDF("vec_id", "tk", "bk")
  }

  private def emptyPairs: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("a", "b")
  }

  /** The live signature table `(vec_id, tk, bk)`. */
  def currentBuckets: DataFrame = appliedBatches.lastOption
    .map(id => spark.read.parquet(s"$root/ann_b$id/buckets"))
    .getOrElse(emptyBuckets)

  /** The live candidate-pair set `(a, b)`, a < b, distinct. */
  def currentPairs: DataFrame = appliedBatches.lastOption
    .map(id => spark.read.parquet(s"$root/ann_b$id/pairs"))
    .getOrElse(emptyPairs)

  /** The shape the stored signatures were built at, plus the covered
    * vector count: `(bits, nt, n)`. */
  def currentMeta: (Int, Int, Long) = appliedBatches.lastOption
    .map { id =>
      val r = spark.read.parquet(s"$root/ann_b$id/meta").head()
      (r.getInt(0), r.getInt(1), r.getLong(2))
    }
    .getOrElse((0, 0, 0L))

  /** The embeddings the live index covers: shards at or below the last
    * commit point. */
  def currentEmb: DataFrame = {
    val upTo = appliedBatches.lastOption.getOrElse(-1L)
    val shards = batchIds("emb_b").filter(_ <= upTo).map(id => s"$root/emb_b$id")
    if (shards.isEmpty) {
      import spark.implicits._
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    } else spark.read.parquet(shards: _*).select(col("vec_id"), col("embedding"))
  }

  /** The foreachBatch sink: fold one micro-batch of embeddings.
    * Idempotent on replay; empty batches are no-ops. */
  def sink(batch: Dataset[Row], batchId: Long): Unit = synchronized {
    if (!new File(s"$root/ann_b$batchId").exists()) {
      val b = batch.select(col("vec_id"), col("embedding")).localCheckpoint(true)
      val m = b.count()
      if (m > 0) {
        val before = appliedBatches
        val (bitsOld, ntOld, nOld) = currentMeta
        val n = nOld + m
        val (bits, nt) = VectorOps.lshShape(n, 12)
        b.write.mode("overwrite").parquet(s"$root/emb_b$batchId")
        val oldB = currentBuckets
        val sameShape = bits == bitsOld && nt == ntOld
        // ∝ batch either way; materialized once, consumed by the union
        // AND the pair-append join
        val batchSigs = VectorOps.bucketContrib(b, 0, bits, 0, nt)
          .localCheckpoint(true)
        val buckets =
          if (sameShape) oldB.unionByName(batchSigs)
          else {
            val allOld = currentEmb
            // (a) existing tables gain high bits: map-only over the OLD
            //     corpus, ADDED to stored signatures (absolute weights)
            val extended =
              if (bits > bitsOld && nOld > 0)
                oldB.join(
                  VectorOps.bucketContrib(allOld, bitsOld, bits, 0, ntOld)
                    .withColumnRenamed("bk", "addbk"),
                  Seq("vec_id", "tk"))
                  .select(col("vec_id"), col("tk"),
                    (col("bk") + col("addbk")).as("bk"))
              else oldB
            // (b) brand-new tables cover the old corpus (the batch's
            //     rows for ALL nt tables arrive via batchSigs)
            val newTables =
              if (nt > ntOld && nOld > 0)
                VectorOps.bucketContrib(allOld, 0, bits, ntOld, nt)
              else emptyBuckets
            extended.unionByName(newTables).unionByName(batchSigs)
          }
        val tmp = s"$root/tmp_b$batchId"
        buckets.write.mode("overwrite").parquet(s"$tmp/buckets")
        // pairs derive from exactly the published signatures
        val bm = spark.read.parquet(s"$tmp/buckets")
        val pairs =
          if (sameShape) {
            val add = batchSigs.select(col("vec_id").as("x"), col("tk"), col("bk"))
              .join(bm.select(col("vec_id").as("y"), col("tk"), col("bk")),
                Seq("tk", "bk"))
              .filter(col("x") =!= col("y"))
              .select(least(col("x"), col("y")).as("a"),
                greatest(col("x"), col("y")).as("b"))
              .distinct() // add-set only — never the stored pairs
            currentPairs.unionByName(add)
          } else
            // bits grew → buckets split → pairs shrink: the one
            // corpus-shaped stage, amortized over O(log N) boundaries
            bm.select(col("vec_id").as("a"), col("tk"), col("bk"))
              .join(bm.select(col("vec_id").as("b"), col("tk"), col("bk")),
                Seq("tk", "bk"))
              .filter(col("a") < col("b")).select("a", "b").distinct()
        pairs.write.mode("overwrite").parquet(s"$tmp/pairs")
        import spark.implicits._
        Seq((bits, nt, n)).toDF("bits", "nt", "n")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/meta")
        require(new File(tmp).renameTo(new File(s"$root/ann_b$batchId")),
          s"could not publish ann_b$batchId")
        before.foreach { old =>
          val dir = new File(s"$root/ann_b$old")
          Seq("buckets", "pairs", "meta").foreach { sub =>
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
