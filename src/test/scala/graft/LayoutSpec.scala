package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import graft.operators.LayoutOps
import graft.sources.Tables

/** Measured evidence for the Z-order layout claim (q179): writing the
  * SAME rows z-sorted vs insertion-ordered, with small parquet row
  * groups, and reading the per-row-group min/max statistics back from
  * the footers. The metric is the summed (x-range × y-range) bounding
  * area across row groups — exactly the quantity a min/max-pruning scan
  * planner consults: a predicate box intersects a row group iff it
  * intersects that rectangle, so smaller summed area = more skipped
  * groups for ANY 2-D (and most 1-D) predicates.
  *
  * Insertion order (event_id) is uncorrelated with (user_id, value), so
  * every insertion-ordered row group spans ~the full 256×256 domain —
  * zero skipping. The z-sorted layout must cut the summed area by ≥ 4×
  * (observed: far more); a second assertion counts row groups a
  * concrete 32×32 query box can prune.
  */
class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.01"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-layout-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // small row groups so a 10k-row fixture yields a meaningful number
    // of groups; production uses the default 128 MB with the same math
    .config("spark.hadoop.parquet.block.size", "16384")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** (rowGroups, Σ (x_range+1)·(y_range+1), overlaps of box [0,31]²). */
  private def footerStats(pathStr: String): (Int, Long, Int) = {
    val conf = new Configuration()
    val fs = new Path(pathStr).getFileSystem(conf)
    val files = fs.listStatus(new Path(pathStr)).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
    var nGroups = 0
    var area = 0L
    var boxOverlaps = 0
    files.foreach { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        reader.getFooter.getBlocks.forEach { block =>
          val cols = block.getColumns
          var xMin = 0L; var xMax = 0L; var yMin = 0L; var yMax = 0L
          cols.forEach { c =>
            val name = c.getPath.toDotString
            val st = c.getStatistics
            if (name == "x") {
              xMin = st.genericGetMin.asInstanceOf[java.lang.Long].longValue
              xMax = st.genericGetMax.asInstanceOf[java.lang.Long].longValue
            } else if (name == "y") {
              yMin = st.genericGetMin.asInstanceOf[java.lang.Long].longValue
              yMax = st.genericGetMax.asInstanceOf[java.lang.Long].longValue
            }
          }
          nGroups += 1
          area += (xMax - xMin + 1) * (yMax - yMin + 1)
          if (xMin <= 31 && yMin <= 31) boxOverlaps += 1
        }
      } finally reader.close()
    }
    (nGroups, area, boxOverlaps)
  }

  test("z-sorted row groups bound (x,y) rectangles; insertion order does not") {
    val base = Tables.load(spark, dir, "events")
      .select(col("event_id"),
        col("user_id").bitwiseAND(lit(255L)).as("x"),
        floor(col("value")).cast("long").bitwiseAND(lit(255L)).as("y"))
      .withColumn("z", LayoutOps.morton8(col("x"), col("y")))

    val tmp = Files.createTempDirectory("graft-layout").toFile
    tmp.deleteOnExit()
    val zPath = s"${tmp.getAbsolutePath}/zsorted"
    val naivePath = s"${tmp.getAbsolutePath}/insertion"

    // one output partition each so the comparison is purely row-group
    // ordering; at scale this is repartitionByRange(z) with the same
    // per-partition sort
    base.coalesce(1).sortWithinPartitions("z")
      .write.mode("overwrite").parquet(zPath)
    base.coalesce(1).sortWithinPartitions("event_id")
      .write.mode("overwrite").parquet(naivePath)

    val (zGroups, zArea, zBoxHits) = footerStats(zPath)
    val (nGroups, nArea, nBoxHits) = footerStats(naivePath)
    info(s"z-sorted: $zGroups groups, area $zArea, box overlaps $zBoxHits; " +
      s"insertion: $nGroups groups, area $nArea, box overlaps $nBoxHits " +
      f"(area ratio ${nArea.toDouble / zArea}%.1fx)")

    assert(zGroups >= 4 && nGroups >= 4,
      s"need several row groups for the comparison to mean anything, got z=$zGroups naive=$nGroups")
    assert(zArea * 4 <= nArea,
      s"z-sorted summed bounding area must be >=4x smaller: z=$zArea naive=$nArea " +
        s"(groups z=$zGroups naive=$nGroups)")
    // a 32x32 corner box: the naive layout's full-domain groups ALL
    // overlap it; the z layout confines it to the curve's first stretch
    assert(nBoxHits == nGroups,
      s"insertion-ordered groups should all span the query box ($nBoxHits of $nGroups)")
    assert(zBoxHits < zGroups,
      s"z-sorted layout must let the box skip at least one group ($zBoxHits of $zGroups)")
  }

  test("streaming ingest can cluster-on-write: every z-sorted micro-batch file " +
    "bounds (x,y) tighter than its insertion-ordered twin") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.{Dataset, Row}
    import spark.implicits._
    // the 100 TB shape: an ingest stream whose foreachBatch sink sorts
    // each micro-batch by z before writing, so files are born skippable
    // instead of needing a separate compaction pass
    val rows = Tables.load(spark, dir, "events")
      .select(col("event_id"),
        col("user_id").bitwiseAND(lit(255L)).as("x"),
        floor(col("value")).cast("long").bitwiseAND(lit(255L)).as("y"))
      .withColumn("z", LayoutOps.morton8(col("x"), col("y")))
      .as[(Long, Long, Long, Long)].collect().toSeq

    val tmp = Files.createTempDirectory("graft-layout-stream").toFile
    tmp.deleteOnExit()
    val zPath = s"${tmp.getAbsolutePath}/z"
    val naivePath = s"${tmp.getAbsolutePath}/naive"

    val in = MemoryStream[(Long, Long, Long, Long)](spark, numPartitions = 1)
    val q = in.toDS().toDF("event_id", "x", "y", "z")
      .writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.coalesce(1).sortWithinPartitions("z")
          .write.mode("append").parquet(zPath)
        batch.coalesce(1).sortWithinPartitions("event_id")
          .write.mode("append").parquet(naivePath)
        ()
      }
      .start()
    try {
      rows.grouped(2500).foreach { g => in.addData(g); q.processAllAvailable() }
    } finally q.stop()

    val (zGroups, zArea, _) = footerStats(zPath)
    val (nGroups, nArea, _) = footerStats(naivePath)
    assert(zGroups >= 4 && nGroups >= 4)
    assert(zArea * 2 <= nArea,
      s"per-micro-batch z sort must still bound rectangles: z=$zArea naive=$nArea")
    info(s"streaming: z $zGroups groups area $zArea vs naive $nGroups groups area $nArea " +
      f"(${nArea.toDouble / zArea}%.1fx)")
  }

  test("morton8 is a bijection on the 16-bit domain and tiles 32x32 per 1024-z run") {
    // local mirror of the Column math: the curve's defining properties
    def m(x: Int, y: Int): Int =
      (0 until 8).map(k => (((x >> k) & 1) << (2 * k)) | (((y >> k) & 1) << (2 * k + 1))).sum
    val all = for (x <- 0 until 256; y <- 0 until 256) yield m(x, y)
    assert(all.distinct.size == 65536, "interleave must be a bijection")
    // every 1024-wide z bucket covers exactly one 32x32 rectangle
    val byBucket = (for (x <- 0 until 256; y <- 0 until 256) yield (m(x, y) / 1024, x, y))
      .groupBy(_._1)
    byBucket.foreach { case (b, pts) =>
      val xs = pts.map(_._2); val ys = pts.map(_._3)
      assert(xs.max - xs.min == 31 && ys.max - ys.min == 31,
        s"bucket $b spans ${xs.min}-${xs.max} x ${ys.min}-${ys.max}")
      assert(pts.size == 1024)
    }
  }
}
