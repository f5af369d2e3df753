package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

case class IncDoc(doc_id: Long, text: String)

/** Pins q161's load-bearing claim: the arrival-ordered batch
  * formulation ("dup iff some verified near-dup partner arrived
  * earlier") is EXACTLY what an incremental pipeline computes when it
  * appends each micro-batch's shingles to the matching index and checks
  * arrivals against (index ∪ earlier-in-batch) — for EVERY way of
  * cutting the arrival sequence into batches. That equivalence is what
  * makes the q161 oracle a faithful twin of index maintenance at
  * 100 TB (append, never rebuild), the same way q150-q152 twin the
  * streaming operators.
  *
  * Corpus: synthetic, deterministic — three near-dup families (sizes
  * 4/3/2) plus unique fillers, shingled by the q43 formula (distinct
  * 3-word shingles, exact Jaccard ≥ 0.8 verify). Arrival order is
  * md5(doc_id), matching q161's Spark/DuckDB device bit-for-bit.
  */
class IncrementalDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-incremental-dedup-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // ---- corpus -----------------------------------------------------------

  private def salad(seed: Int, n: Int): String =
    (0 until n).map(i => s"w${(seed * 31 + i * 7) % 97}").mkString(" ")

  /** Near-dup family: one base text, variants replace the last word —
    * long docs with a 1-word delta sit far above Jaccard 0.8. */
  private def family(baseSeed: Int, size: Int, firstId: Long): Seq[(Long, String)] = {
    val base = salad(baseSeed, 40)
    (0 until size).map { k =>
      val text = if (k == 0) base else base.split(' ').dropRight(1).mkString(" ") + s" v$k"
      (firstId + k, text)
    }
  }

  private lazy val docs: DataFrame = {
    val rows = family(1, 4, 100L) ++ family(2, 3, 200L) ++ family(3, 2, 300L) ++
      (0 until 8).map(i => (400L + i, salad(50 + i, 35)))
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** q43's shingle formula (distinct 3-word windows). */
  private def shingles(d: DataFrame): DataFrame =
    d.withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, size(words) - 3)," +
          " i -> concat_ws(' ', words[i], words[i+1], words[i+2])))")).as("sh"))

  /** Verified near-dup pairs (exact Jaccard ≥ 0.8) between the two doc
    * sets, arbitrary direction (l from `a`, r from `b`). */
  private def verifiedPairs(a: DataFrame, b: DataFrame): DataFrame = {
    val sa = shingles(a); val sb = shingles(b)
    val na = sa.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val nb = sb.groupBy("doc_id").agg(count(lit(1)).as("n"))
    sa.select(col("doc_id").as("l"), col("sh"))
      .join(sb.select(col("doc_id").as("r"), col("sh")), Seq("sh"))
      .groupBy("l", "r").agg(count(lit(1)).as("c"))
      .join(na.select(col("doc_id").as("l"), col("n").as("nl")), "l")
      .join(nb.select(col("doc_id").as("r"), col("n").as("nr")), "r")
      .filter(col("c") / (col("nl") + col("nr") - col("c")) >= 0.8)
      .select("l", "r")
  }

  /** The q161 batch formulation over this corpus: flagged = later
    * arrival of any verified pair (arrival key = (md5(id), id)). */
  private def batchFlagged(): Set[Long] = {
    val m = docs.select(col("doc_id"), md5(col("doc_id").cast("string")).as("m"))
    verifiedPairs(docs, docs)
      .filter(col("l") < col("r"))
      .join(m.select(col("doc_id").as("l"), col("m").as("ml")), "l")
      .join(m.select(col("doc_id").as("r"), col("m").as("mr")), "r")
      .select(when(col("ml") < col("mr")
          || (col("ml") === col("mr") && col("l") < col("r")),
          col("r")).otherwise(col("l")).as("doc_id"))
      .distinct().collect().map(_.getLong(0)).toSet
  }

  /** Incremental run: cut the md5-arrival order into `cuts` batches;
    * per batch, flag arrivals whose verified partner is in the index
    * OR earlier within the batch, then append the WHOLE batch to the
    * index (q161's matching-index semantics). */
  private def incrementalFlagged(cuts: Int): Set[Long] = {
    val ordered = docs
      .withColumn("m", md5(col("doc_id").cast("string")))
      .orderBy("m", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val batches = {
      val per = math.max(1, math.ceil(ordered.length.toDouble / cuts).toInt)
      ordered.grouped(per).toSeq
    }
    import spark.implicits._
    var index: DataFrame = Seq.empty[(Long, String)].toDF("doc_id", "text")
    var flagged = Set.empty[Long]
    for (batch <- batches) {
      val arriving = docs.filter(col("doc_id").isin(batch.map(_._1): _*))
      // vs the already-built index
      val vsIndex = verifiedPairs(arriving, index)
        .select(col("l").as("doc_id")).distinct()
        .collect().map(_.getLong(0)).toSet
      // vs earlier arrivals WITHIN the batch (per-row arrival order)
      val pos = batch.map(_._1).zipWithIndex.toMap
      val vsSelf = verifiedPairs(arriving, arriving)
        .filter(col("l") =!= col("r"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .filter { case (l, r) => pos(r) < pos(l) }.map(_._1).toSet
      flagged ++= vsIndex ++ vsSelf
      index = index.unionByName(arriving)
    }
    flagged
  }

  test("families produce verified pairs and the corpus has non-dup fillers") {
    val flagged = batchFlagged()
    assert(flagged.nonEmpty, "fixture must produce near-dup flags")
    // in each family exactly the earliest arrival survives: 4+3+2 docs
    // across 3 families -> 3 survivors among family docs
    val familyIds = Set(100L, 101L, 102L, 103L, 200L, 201L, 202L, 300L, 301L)
    assert(familyIds.diff(flagged).size == 3,
      s"one survivor per family expected, flagged=$flagged")
    assert((400L until 408L).forall(id => !flagged.contains(id)),
      "unique fillers must never be flagged")
  }

  test("incremental index-append equals the q161 batch formulation for every batch split") {
    val expected = batchFlagged()
    for (cuts <- Seq(1, 2, 3, 5, 17)) {
      assert(incrementalFlagged(cuts) == expected,
        s"incremental run with $cuts batches diverged from the batch twin")
    }
  }

  test("a LIVE foreachBatch stream maintaining a parquet index reproduces the batch twin") {
    // End-to-end through the real engine: documents arrive as a stream,
    // each micro-batch is checked against the parquet index built from
    // every prior batch (plus earlier arrivals within the batch), then
    // appended — the q161 semantics as an actual readStream pipeline,
    // not a simulation.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-inc-stream")
    val indexPath = s"$tmp/index"
    val ckpt = s"$tmp/ckpt"
    docs.limit(0).write.parquet(indexPath) // empty schema-bearing index
    val flagged = scala.collection.mutable.Set.empty[Long]
    var batchesSeen = 0

    val in = MemoryStream[IncDoc](spark, numPartitions = 1)
    val q = in.toDS().writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[IncDoc], _: Long) =>
        val arr = batch.toDF()
        if (!arr.isEmpty) {
          batchesSeen += 1
          val index = spark.read.parquet(indexPath)
          val vsIndex = verifiedPairs(arr, index)
            .select("l").distinct().collect().map(_.getLong(0))
          val pos = arr.select(col("doc_id"),
              md5(col("doc_id").cast("string")).as("m"))
            .collect().map(r => (r.getLong(0), r.getString(1)))
            .sortBy(identity[(Long, String)] _ andThen (t => (t._2, t._1)))
            .map(_._1).zipWithIndex.toMap
          val vsSelf = verifiedPairs(arr, arr)
            .filter(col("l") =!= col("r"))
            .collect().map(r => (r.getLong(0), r.getLong(1)))
            .filter { case (l, r) => pos(r) < pos(l) }.map(_._1)
          flagged.synchronized { flagged ++= vsIndex ++ vsSelf }
          arr.write.mode("append").parquet(indexPath)
        }
        ()
      }
      .start()
    try {
      val ordered = docs
        .withColumn("m", md5(col("doc_id").cast("string")))
        .orderBy("m", "doc_id")
        .select("doc_id", "text")
        .collect().map(r => IncDoc(r.getLong(0), r.getString(1)))
      for (chunk <- Seq(ordered.take(5), ordered.slice(5, 13), ordered.drop(13))) {
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    assert(batchesSeen >= 3, s"expected >=3 non-empty micro-batches, saw $batchesSeen")
    assert(flagged.toSet == batchFlagged(),
      "the live streaming index-append run diverged from the q161 batch twin")
  }
}
