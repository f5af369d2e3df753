package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Eager `localCheckpoint` at SERIALIZED storage — the repo's policy
  * for CORPUS-SCALE lineage truncation (round-10 found-and-fixed from
  * the first full-suite 100× bench run):
  *
  * `localCheckpoint(true)` defaults to a DESERIALIZED memory level, so
  * a checkpointed block that was evicted to disk is re-inflated into
  * object rows when a later stage reads it back
  * (`BlockManager.maybeCacheDiskValuesInMemory` → unroll into a
  * deserialized values holder). Object rows cost ~5–10× their
  * UnsafeRow bytes and the unroll size-tracking samples lag real
  * allocation, so 32 concurrent tasks each re-promoting a
  * corpus-scale partition (the 100× suffix-array build caches a
  * 225M-row frame per doubling round) OOMed the 48 GiB suite JVM at
  * stage ~324 of the first whole-suite 100× run — even though every
  * query passes in ISOLATION with the same heap (round-9 TimeQ
  * measurements): the composition failure mode the q159 codegen
  * overflow already demonstrated for plans, here for storage.
  *
  * `MEMORY_AND_DISK_SER` keeps checkpoint blocks as compact serialized
  * bytes end-to-end: unroll accounting is exact (bytes reserved as
  * they are written), disk read-back caches BYTES (or stays on disk
  * when memory is short) instead of inflating objects, and eviction is
  * graceful. The price — per-read deserialization — is one in-memory
  * pass over data that already paid a shuffle to get there; the 100×
  * suite runs to completion, which the deserialized default does not.
  *
  * Batch-proportional checkpoints (streaming sinks' micro-batches,
  * assignment frames ∝ batch) may keep the deserialized default —
  * their blocks are bounded by construction. Anything whose size
  * scales with the CORPUS goes through [[ser]]. */
object Ckpt {
  def ser[T](ds: Dataset[T]): Dataset[T] =
    ds.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)

  /** [[ser]] for ITERATIVE builds: checkpoint the new round, then
    * release the previous round's blocks. A loop that only reassigns
    * `base = Ckpt.ser(next)` keeps every round's blocks alive until
    * the GC + ContextCleaner happen to run — O(rounds × corpus)
    * storage: the 300× suffix-array build (6 rounds × ~20 GB
    * serialized chars frame) filled a 70 GB disk and died mid-round,
    * found by the round-11 tail rehearsal. Because [[ser]] is EAGER
    * and truncates lineage, the new round's blocks are complete and
    * self-contained when it returns, so the predecessor is dead the
    * moment the call finishes — this frees it deterministically
    * instead of hoping for a timely GC.
    *
    * Tracking is by the checkpoint's OWN RDD id, read from the
    * returned Dataset's LogicalRDD root
    * (`CheckpointBridge.checkpointRddIds`) — a keySet diff around the
    * eager checkpoint would attribute ANY RDD first persisted inside
    * the window (e.g. a lazily-built `.cache()` elsewhere whose first
    * action happens during `ser(ds)`) and silently unpersist it next
    * round. Returns (checkpointed round, its ids) — thread the ids
    * back in on the next call. */
  def serRound[T](ds: Dataset[T], prevIds: Set[Int]): (Dataset[T], Set[Int]) = {
    val sc = ds.sparkSession.sparkContext
    val out = ser(ds)
    val created =
      org.apache.spark.sql.graft.CheckpointBridge.checkpointRddIds(out)
    prevIds.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    (out, created)
  }
}
