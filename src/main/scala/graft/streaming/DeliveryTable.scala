package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The distributed half of the delivery ledger: chunk PAYLOADS
  * (subject, resourceId rows) as a parquet dataset partitioned by
  * `(groupId, chunkId)`.
  *
  * The reference keeps every delivered message in an in-server
  * `HashMap<chunk_id, Vec<Message>>` until acked
  * (public_event_server.rs:318-319) — at 100 TB that routes the whole
  * event volume through one process's heap. Here executors write each
  * micro-batch's payload straight to this table inside foreachBatch;
  * the driver ledger keeps only [[graft.core.ChunkMeta]] (ids + row
  * counts), and a consumer pulling its pending chunks reads exactly its
  * own `(groupId, chunkId)` partition directories back — partition
  * pruning makes the re-read proportional to what THAT consumer has
  * outstanding, not to the log.
  *
  * Writes use dynamic partition overwrite so a foreachBatch replay
  * (micro-batch retry / restart) rewrites the same partitions with
  * identical content instead of appending duplicates — the write is
  * idempotent per (groupId, chunkId), matching the WAL's replay rule.
  *
  * `seq` preserves delivery order within a chunk (monotonic per
  * partition, partition-major across them — the same order the old
  * driver-side `collect()` produced).
  */
final class DeliveryTable(spark: SparkSession, val dir: String) {
  import DeliveryTable.esc

  private def fs = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Cumulative per-phase wall (ns) of this table's operations — the
    * decomposition surface for the many-groups per-batch floor
    * (round-11 verdict task 8). A few nanoTime calls per micro-batch;
    * read via [[phaseSeconds]]. */
  private val prof =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private def timed[T](phase: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f finally {
      prof.computeIfAbsent(phase,
        _ => new java.util.concurrent.atomic.AtomicLong)
        .addAndGet(System.nanoTime() - t0); ()
    }
  }
  def phaseSeconds: Map[String, Double] = {
    val it = prof.entrySet().iterator()
    val b = Map.newBuilder[String, Double]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.get / 1e9 }
    b.result()
  }

  /** Payload of one chunk for one group (per-group delivery queries).
    * One group ⇒ full write parallelism (splits = shuffle partitions). */
  def write(groupId: String, chunkId: String, rows: DataFrame): Unit =
    writeMulti(rows
      .withColumn("groupId", lit(groupId))
      .withColumn("chunkId", lit(chunkId)),
      splitsPerChunk =
        spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  /** Payload rows spanning many groups in one pass (multiplexed
    * delivery: one distributed write per micro-batch for ALL groups).
    * `rows` must carry groupId, chunkId, subject, resourceId.
    * `splitsPerChunk` — see [[prepare]]. */
  def writeMulti(rows: DataFrame, splitsPerChunk: Int = 1): Unit = timed("write") {
    prepare(rows, splitsPerChunk).write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("groupId", "chunkId")
      .parquet(dir)
  }

  /** `seq` is assigned BEFORE the group repartition so delivery order
    * inside a chunk survives the shuffle (read() sorts on it); the
    * repartition makes each `(groupId, chunkId)` dir the product of
    * `splitsPerChunk` tasks → that many parquet files per chunk.
    * Without the repartition every source task opens a writer for
    * every group it touches — at G=2000 with 8 source partitions that
    * is ~16k files PER BATCH (measured as 98% of the many-groups
    * per-batch floor, BASELINE.md round-12).
    *
    * `splitsPerChunk` reconciles the two delivery regimes: MANY groups
    * want 1 (file count = groups matched, the floor is one
    * file+rename per group); FEW groups with big batches want
    * parts/groups (repartition by group alone caps a group's write
    * parallelism at ONE task — measured 2.1× on the 5-group 10M-event
    * replay). The engine passes max(1, parts / registered-groups).
    * read() merges a chunk's files by sorting on seq, so the split is
    * invisible to consumers. */
  private def prepare(rows: DataFrame, splitsPerChunk: Int): DataFrame = {
    // EXPLICIT partition count: a column-only repartition leaves the
    // count to AQE, which coalesces a small micro-batch to ONE
    // partition — and one task then writes every group's file
    // sequentially (measured 5× on the write at G=1000,
    // BASELINE.md round-12 crossover table).
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val keyed = rows.select(col("groupId"), col("chunkId"), col("subject"),
      col("resourceId"), monotonically_increasing_id().as("seq"))
    if (splitsPerChunk <= 1) keyed.repartition(parts, col("groupId"))
    else keyed.repartition(parts, col("groupId"),
      pmod(xxhash64(col("seq")), lit(splitsPerChunk)))
  }

  /** Payload write + per-group row counts from ONE pass over the batch
    * (persisted, then written and aggregated — two jobs over cached
    * batch-proportional data). This is the multiplexed engine's ONLY
    * regime since round 12: [[chunkCounts]] costs one filesystem
    * existence probe PER REGISTERED GROUP per micro-batch — O(G) stat
    * calls whether or not a group matched anything — while this count
    * is an aggregation over the already-groupId-partitioned cached
    * batch (shuffle-free at splitsPerChunk = 1, the many-groups case;
    * with splits > 1 the partial agg leaves ≤ groups × parts rows to
    * exchange), measured FLAT in G (no crossover exists; BASELINE.md
    * round-12 table). The footer path remains for the single-group
    * engines' shape (one probe, no batch persist). */
  def writeMultiWithCounts(rows: DataFrame, splitsPerChunk: Int = 1): Map[String, Long] = {
    val prepared = prepare(rows, splitsPerChunk)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      timed("write") {
        prepared.write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("groupId", "chunkId")
          .parquet(dir)
      }
      timed("count") {
        prepared.groupBy("groupId").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      }
    } finally { prepared.unpersist(); () }
  }

  /** Hydrate the payloads of `chunkIds` for `groupId` in ONE pruned
    * scan: (chunkId → (subjects, resourceIds)), each in delivery order.
    * This is the consumer-pull path — materialization happens at the
    * consumer, per chunk, never at delivery time. */
  /** Fixed read schema (incl. partition columns): hydration never pays
    * footer-sampling schema inference, and an existing-but-empty dir
    * reads as empty instead of failing inference. */
  private val readSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("subject", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("resourceId", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("groupId", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("chunkId", org.apache.spark.sql.types.StringType)))

  def read(groupId: String, chunkIds: Seq[String]): Map[String, (Seq[String], Seq[String])] = timed("read") {
    val (filesystem, path) = fs
    if (chunkIds.isEmpty || !filesystem.exists(path)) Map.empty
    else readPruned(filesystem, path, groupId, chunkIds)
  }

  private def readPruned(filesystem: org.apache.hadoop.fs.FileSystem,
                         path: org.apache.hadoop.fs.Path, groupId: String,
                         chunkIds: Seq[String]): Map[String, (Seq[String], Seq[String])] = {
    // Read EXACTLY the requested chunk partitions as direct paths. The
    // old root-dir read partition-PRUNED correctly but had to LIST the
    // whole tree first — at thousands of groups that listing is itself
    // a distributed job per pull (paths beyond the parallel-discovery
    // threshold), it scales with the TOTAL group count instead of this
    // consumer's outstanding chunks, and it races group-churn deletes
    // of OTHER groups' dirs (task-time FileNotFound, surfaced by
    // GroupScaleProbe at 10k groups with churn). Direct paths keep the
    // pull O(this group's pending); the existence filter makes a
    // concurrently-dropped chunk read as absent, never as a failed job
    // — and because exists-then-read is a TOCTOU window (a chunk
    // dropped between the filter and the job's file listing would
    // still fail the job), the read also sets ignoreMissingFiles,
    // scoped to this pull path only. Partition values are escaped the
    // same way the parquet writer escapes them (space, ':', '%', '=',
    // … land in %XX dirs), so caller-supplied group ids round-trip.
    val chunkPaths = chunkIds.distinct
      .map(c => new org.apache.hadoop.fs.Path(path,
        s"groupId=${esc(groupId)}/chunkId=${esc(c)}"))
      .filter(filesystem.exists)
    if (chunkPaths.isEmpty) Map.empty
    else spark.read.option("basePath", dir).schema(readSchema)
      .option("ignoreMissingFiles", true)
      .parquet(chunkPaths.map(_.toString): _*)
      .select("chunkId", "subject", "resourceId", "seq")
      .collect()
      .groupBy(_.getString(0))
      .map { case (cid, rs) =>
        val ordered = rs.sortBy(_.getLong(3))
        (cid, (ordered.map(_.getString(1)).toSeq, ordered.map(_.getString(2)).toSeq))
      }
  }

  /** Row counts of one batch's just-written chunks from parquet
    * METADATA only: a filesystem existence probe per candidate group
    * (groups whose join matched nothing wrote no partition), then one
    * footer-count job over exactly those chunk directories. This is the
    * second half of the write-first delivery pattern — the batch is
    * traversed ONCE (by the payload write); counts come from file
    * metadata, never from a second pass over the data. */
  def chunkCounts(groupIds: Seq[String], chunkIdFor: String => String): Map[String, Long] = timed("count") {
    val (filesystem, path) = fs
    val present = groupIds.filter { g =>
      filesystem.exists(new org.apache.hadoop.fs.Path(path,
        s"groupId=${esc(g)}/chunkId=${esc(chunkIdFor(g))}"))
    }
    if (present.isEmpty) Map.empty
    else {
      val paths = present.map(g =>
        s"$dir/groupId=${esc(g)}/chunkId=${esc(chunkIdFor(g))}")
      spark.read.option("basePath", dir).schema(readSchema)
        .option("ignoreMissingFiles", true).parquet(paths: _*)
        .groupBy("groupId").count()
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
    }
  }

  /** Chunk ids with durable payload partitions for a group — the
    * FULL delivery history (acked included), read from the partitioned
    * table itself. This is the post-eviction history surface: the
    * driver ledger keeps only pending + out-of-order-acked metas
    * ([[ChunkLedger]]), so "all chunks ever" is answered by the durable
    * layer that actually retains them. One directory listing. */
  def listChunks(groupId: String): Seq[String] = {
    val (filesystem, path) = fs
    val gdir = new org.apache.hadoop.fs.Path(path, s"groupId=${esc(groupId)}")
    if (!filesystem.exists(gdir)) return Seq.empty
    filesystem.listStatus(gdir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("chunkId="))
      .map(n => DeliveryTable.unesc(n.stripPrefix("chunkId=")))
  }

  /** Drop a group's payload partitions (group delete / retention). */
  def drop(groupId: String): Unit = {
    val (filesystem, path) = fs
    val gdir = new org.apache.hadoop.fs.Path(path, s"groupId=${esc(groupId)}")
    if (filesystem.exists(gdir)) { filesystem.delete(gdir, true); () }
  }
}

object DeliveryTable {
  /** Engine-owned scratch location for in-process/test wiring;
    * production passes a durable shared path instead. */
  def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft-deliveries-").toString

  /** Hive-style partition-value escaping, the SAME function the
    * parquet writer applies when materializing `groupId=…/chunkId=…`
    * directories — hand-built paths (read/chunkCounts/listChunks/drop)
    * must escape identically or a group id containing ' ', ':', '%',
    * '=' … resolves to a directory that never exists and the pull
    * silently returns empty. */
  private[streaming] def esc(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(v)
  private[streaming] def unesc(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(v)
}
