package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.LayoutOps
import graft.sources.Tables

/** Measured evidence for the q190 compaction plan: EXECUTE it against
  * real parquet and count real files. The "before" layout materializes
  * the file inventory q190 plans over — one physical file per
  * (event_date, user_id % 64), the shape a by-user-bucketed streaming
  * sink leaves behind — and the "after" layout rewrites one file per
  * planned bin. Assertions:
  *
  *  - the rewrite reduces the file count to exactly the plan's bin
  *    count (one task per bin via repartition on the bin key, so the
  *    committer writes exactly one file per (date, bin) directory);
  *  - rows survive the rewrite bit-for-bit (count + content checksum);
  *  - the plan's own packing bound holds: every bin closes below
  *    target + its largest member (the greedy cumulative-sum bound —
  *    what makes the plan valid without first-fit's sequential state).
  */
class CompactionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.01"
  private val target = 1024L

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-compaction-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def parquetFiles(root: Path): Seq[Path] = {
    val s = Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet")).toList
    } finally s.close()
  }

  private def checksum(pathStr: String): (Long, Long) = {
    val df = spark.read.parquet(pathStr)
    val r = df.agg(
      count(lit(1)).cast("long"),
      sum(crc32(concat_ws("|", col("event_id"), col("user_id"), col("props"))))
        .cast("long")).head()
    (r.getLong(0), r.getLong(1))
  }

  test("executing the bin-pack plan compacts to one file per bin with rows intact") {
    val tmp = Files.createTempDirectory("graft-compaction-")
    try {
      val rows = Tables.load(spark, dir, "events")
        .withColumn("event_date", to_date(col("ts")))
        .withColumn("file_id", expr("user_id % 64"))

      // BEFORE: the small-file layout the plan is about — one physical
      // file per (date, file) key. repartition on the key puts each
      // key's rows in one task, partitionBy makes each key a directory,
      // so the writer emits exactly one file per inventory entry.
      val before = tmp.resolve("before")
      rows.repartition(col("event_date"), col("file_id"))
        .write.partitionBy("event_date", "file_id").parquet(before.toString)
      val filesBefore = parquetFiles(before).size

      // The plan (the q190 QueryDef itself), plus its per-file bin
      // assignment re-derived for the rewrite join.
      val plan = LayoutOps.q190_compaction_binpack.run(spark, dir).cache()
      val nBins = plan.count()

      // Plan-level packing bound, BOTH halves (round-7 advice): greedy
      // cumulative-sum binning closes every bin under target + its own
      // largest member, and — descending file order + ⌊cum/target⌋
      // imply it — every non-final bin per partition closes above
      // target − the partition's largest member (only the final bin
      // holds an arbitrarily small remainder). A regression that
      // under-fills bins now fails here instead of passing silently.
      val overflow = plan
        .filter(col("bin_bytes") >= lit(target) + col("max_file_bytes")).count()
      assert(overflow === 0,
        s"$overflow bins exceed target + max_file_bytes")
      import org.apache.spark.sql.expressions.{Window => W}
      val dw = W.partitionBy("event_date")
      val underfill = plan
        .withColumn("last_bin", max("bin").over(dw))
        .withColumn("date_max_file", max("max_file_bytes").over(dw))
        .filter(col("bin") =!= col("last_bin") &&
          col("bin_bytes") <= lit(target) - col("date_max_file"))
        .count()
      assert(underfill === 0,
        s"$underfill non-final bins closed at or below target - partition max file")

      // AFTER: rewrite one file per bin. The assignment join mirrors
      // the plan's window (same ordering, same integer division).
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_date")
        .orderBy(col("bytes").desc, col("file_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val assignment = rows.groupBy("event_date", "file_id")
        .agg(sum(length(col("props"))).cast("long").as("bytes"))
        .withColumn("cum_before", coalesce(sum("bytes").over(w), lit(0L)))
        .withColumn("bin", expr(s"cum_before div $target"))
        .select("event_date", "file_id", "bin")
      val after = tmp.resolve("after")
      rows.join(assignment, Seq("event_date", "file_id"))
        .repartition(col("event_date"), col("bin"))
        .write.partitionBy("event_date", "bin").parquet(after.toString)
      val filesAfter = parquetFiles(after).size

      assert(filesAfter.toLong === nBins,
        s"expected one file per bin ($nBins), found $filesAfter")
      assert(filesAfter < filesBefore / 4,
        s"compaction should collapse the file count ($filesBefore -> $filesAfter)")

      // Rows survive the rewrite: count and content checksum both match
      // the source (order-independent sum of per-row CRCs).
      val (n0, c0) = checksum(before.toString)
      val (n1, c1) = checksum(after.toString)
      assert(n0 === rows.count() && n1 === n0, s"row counts diverged: $n0 vs $n1")
      assert(c0 === c1, "content checksum diverged across the rewrite")
      plan.unpersist()
      ()
    } finally {
      import scala.jdk.CollectionConverters._
      val s = Files.walk(tmp)
      try s.iterator().asScala.toList.reverse.foreach(p => Files.deleteIfExists(p))
      finally s.close()
    }
  }
}
