package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.DeliveryTable

/** Contracts of the distributed chunk-payload store that the delivery
  * ledger's scale story rests on: partition-pruned hydration, replay
  * idempotence via dynamic partition overwrite, and group-scoped drop. */
class DeliveryTableSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-delivery-table-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def payload(rows: Seq[(String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("subject", "resourceId")
  }

  test("write/read round-trips payloads per chunk, in delivery order") {
    val t = new DeliveryTable(spark, DeliveryTable.tempDir())
    t.write("g1", "g1-0", payload(Seq(("s1", "r1"), ("s2", "r2"))))
    t.write("g1", "g1-1", payload(Seq(("s3", "r3"))))
    t.write("g2", "g2-0", payload(Seq(("sX", "rX"))))
    val got = t.read("g1", Seq("g1-0", "g1-1"))
    assert(got.keySet == Set("g1-0", "g1-1"))
    assert(got("g1-0") == (Seq("s1", "s2"), Seq("r1", "r2")))
    assert(got("g1-1") == (Seq("s3"), Seq("r3")))
    // group isolation: g2's chunk is invisible to a g1 read
    assert(t.read("g1", Seq("g2-0")).isEmpty)
  }

  test("replayed write overwrites its own partitions — no duplication, others untouched") {
    val t = new DeliveryTable(spark, DeliveryTable.tempDir())
    t.write("g", "g-0", payload(Seq(("s1", "r1"), ("s2", "r2"))))
    t.write("g", "g-1", payload(Seq(("s3", "r3"))))
    // foreachBatch replay after a crash re-runs batch 0 with identical rows
    t.write("g", "g-0", payload(Seq(("s1", "r1"), ("s2", "r2"))))
    val got = t.read("g", Seq("g-0", "g-1"))
    assert(got("g-0") == (Seq("s1", "s2"), Seq("r1", "r2")),
      "replay must rewrite, not append duplicates")
    assert(got("g-1") == (Seq("s3"), Seq("r3")),
      "dynamic overwrite must not clobber sibling chunks")
  }

  test("read touches only the requested group's chunk dirs: a concurrently-dropped sibling group never fails a pull") {
    val t = new DeliveryTable(spark, DeliveryTable.tempDir())
    t.write("keep", "keep-0", payload(Seq(("s1", "r1"))))
    t.write("gone", "gone-0", payload(Seq(("s2", "r2"))))
    // churn: the sibling group is removed between this consumer's pull
    // planning and execution — its dir vanishing must be invisible here
    t.drop("gone")
    assert(t.read("keep", Seq("keep-0")) ==
      Map("keep-0" -> ((Seq("s1"), Seq("r1")))))
    // and a chunk id whose OWN dir was dropped reads as absent, not as
    // a failed job (the churn-tolerance contract of the direct-path read)
    assert(t.read("gone", Seq("gone-0")).isEmpty)
    // mixed list: present chunk hydrates, dropped chunk is skipped
    t.write("keep", "keep-1", payload(Seq(("s3", "r3"))))
    t.drop("gone")
    assert(t.read("keep", Seq("keep-0", "gone-0", "keep-1")).keySet ==
      Set("keep-0", "keep-1"))
  }

  test("read of an empty table / unknown chunks is empty; drop removes a group only") {
    val t = new DeliveryTable(spark, DeliveryTable.tempDir())
    assert(t.read("g", Seq("g-0")).isEmpty, "missing dir reads empty")
    t.write("g", "g-0", payload(Seq(("s1", "r1"))))
    t.write("h", "h-0", payload(Seq(("s2", "r2"))))
    assert(t.read("g", Seq("nope")).isEmpty)
    t.drop("g")
    assert(t.read("g", Seq("g-0")).isEmpty, "dropped group reads empty")
    assert(t.read("h", Seq("h-0")) == Map("h-0" -> (Seq("s2"), Seq("r2"))),
      "drop must be group-scoped")
  }

  test("path-unsafe group/chunk ids round-trip: hand-built read paths escape like the writer") {
    // Spark escapes ' ', ':', '%', '=', … when materializing partition
    // dirs; the read/count/list/drop paths are hand-built and must
    // escape IDENTICALLY or the pull silently returns empty (round-11
    // ADVICE). Exercise every character class the writer escapes.
    val t = new DeliveryTable(spark, DeliveryTable.tempDir())
    val g = "team a:b%c=d#e"
    val c = "chunk 0:1%2=3"
    t.write(g, c, payload(Seq(("s1", "r1"), ("s2", "r2"))))
    assert(t.read(g, Seq(c)) == Map(c -> ((Seq("s1", "s2"), Seq("r1", "r2")))),
      "escaped partition dirs must hydrate under the raw ids")
    assert(t.listChunks(g) == Seq(c), "listChunks must UNescape dir names")
    assert(t.chunkCounts(Seq(g), _ => c) == Map(g -> 2L),
      "chunkCounts must probe the escaped path AND group back by raw id")
    t.drop(g)
    assert(t.read(g, Seq(c)).isEmpty, "drop must resolve the escaped dir")
  }

  test("a chunk split across several files reads back in delivery order") {
    // Few-groups regime: splitsPerChunk > 1 spreads one chunk over
    // several write tasks (round-12 write-parallelism hint). The split
    // must be invisible to consumers — read() merges the files by seq.
    val dir = DeliveryTable.tempDir()
    val t = new DeliveryTable(spark, dir)
    val rows = (0 until 200).map(i => (f"s$i%03d", f"r$i%03d"))
    t.writeMulti(payload(rows)
      .withColumn("groupId", lit("g"))
      .withColumn("chunkId", lit("g-0")),
      splitsPerChunk = 4)
    val files = new java.io.File(s"$dir/groupId=g/chunkId=g-0")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files > 1, s"test wiring: expected a multi-file chunk, got $files")
    assert(t.read("g", Seq("g-0")) ==
      Map("g-0" -> ((rows.map(_._1), rows.map(_._2)))),
      "delivery order must survive the multi-file split")
    assert(t.chunkCounts(Seq("g"), _ => "g-0") == Map("g" -> 200L),
      "footer counts must sum across a chunk's files")
  }

  test("multi-group batch write serves every group in one pass") {
    val t = new DeliveryTable(spark, DeliveryTable.tempDir())
    val batch = payload(Seq(("sA", "rA"), ("sB", "rB"), ("sC", "rC")))
      .withColumn("groupId",
        when(col("subject") === "sA", "gA").otherwise("gB"))
      .withColumn("chunkId", concat(col("groupId"), lit("-7")))
    t.writeMulti(batch)
    assert(t.read("gA", Seq("gA-7")) == Map("gA-7" -> (Seq("sA"), Seq("rA"))))
    val gB = t.read("gB", Seq("gB-7"))("gB-7")
    assert(gB._1.toSet == Set("sB", "sC") && gB._2.toSet == Set("rB", "rC"))
  }
}
