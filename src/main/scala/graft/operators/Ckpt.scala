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
}
