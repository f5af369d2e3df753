package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.DotProduct.dot_ff
import graft.sources.Tables

/** Measured comparison of candidate-generation strategies for the
  * low-threshold cosine self-join (the q47/q62 family) — the evidence
  * behind BASELINE.md's low-threshold analysis (which this probe
  * CORRECTED: scaled IVF prunes fastest but random centroids cap
  * recall ~0.7; exact brute force stays competitive because 64-float
  * dots are cheaper than shuffling 10⁸ candidate rows; the real
  * production dial is the threshold itself):
  *
  *  - exact: all-pairs ground truth (O(N²) — only run at probe time);
  *  - bands: hyperplane LSH, 8 tables × 3 bits (the q62 oracle shape);
  *  - ivf: deterministic md5-derived centroids, each vector assigned
  *    to its top-nProbe cells by dot score (multi-probe), candidates =
  *    pairs sharing a cell.
  *
  * Prints seconds, candidate volume, found pairs, and recall vs exact
  * for each method. Usage:
  *   sbt "runMain graft.tools.IvfProbe <sfDir> [nCells] [threshold] [nProbe] [nTrain] [seedMode]"
  * seedMode `rand` (md5 hyperplanes, the round-5 runs) or `kpp`
  * (k-means|| oversampling seeding — q160's operator, probe-grade) —
  * measuring whether principled seeding closes the trained-centroid
  * recall ceiling the round-5 study hit (~0.77 at cos 0.45 with 3
  * Lloyd steps from random seeds).
  */
object IvfProbe {
  private def hyperplane(h: Int): Seq[Float] = (0 until 64).map { j =>
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${h}_$j".getBytes("UTF-8"))
    (((hex(0) >> 4) & 0xf) - 7.5).toFloat
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nCells = if (args.length > 1) args(1).toInt else 64
    val thr = if (args.length > 2) args(2).toDouble else 0.45
    val nProbe = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.load(spark, sfDir, "embeddings")
    def norm2(a: Column) = dot_ff(a, a)
    val va = e.select(col("vec_id").as("a"), col("embedding").as("av"),
      sqrt(norm2(col("embedding"))).as("na"))
    val vb = e.select(col("vec_id").as("b"), col("embedding").as("bv"),
      sqrt(norm2(col("embedding"))).as("nb"))

    def verify(cands: DataFrame): DataFrame =
      cands.join(va, "a").join(vb, "b")
        .withColumn("cos", dot_ff(col("av"), col("bv")) / (col("na") * col("nb")))
        .filter(col("cos") >= thr)
        .select("a", "b")

    def timed(name: String, cands: Option[DataFrame], pairsOf: => DataFrame,
              exact: Option[Set[(Long, Long)]]): Set[(Long, Long)] = {
      val t0 = System.nanoTime()
      val nCands = cands.map(_.count())
      val pairs = pairsOf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = exact.map(g => f"${pairs.intersect(g).size.toDouble / math.max(1, g.size)}%.3f")
      println(f"[ivf-probe] $name%-8s ${sec}%7.2f s  cands=${nCands.map(_.toString).getOrElse("-")}%-10s " +
        f"pairs=${pairs.size}%-8d recall=${recall.getOrElse("1.000 (ground truth)")}")
      spark.catalog.clearCache()
      pairs
    }

    // exact ground truth (all-pairs — probe-only)
    val exact = timed("exact", None,
      va.join(vb, col("a") < col("b"))
        .withColumn("cos", dot_ff(col("av"), col("bv")) / (col("na") * col("nb")))
        .filter(col("cos") >= thr).select("a", "b"), None)

    // hyperplane bands (the q62 oracle shape: 8 tables × 3 bits)
    val bandTables = (0 until 8).map(k => (3 * k) until (3 * k + 3))
    def bucketCol(hs: Range): Column = hs.map { h =>
      when(dot_ff(typedLit(hyperplane(h)), col("embedding")) > 0,
        lit(1L << (h - hs.head))).otherwise(lit(0L))
    }.reduce(_ + _)
    val wb = e.select(col("vec_id") +: bandTables.zipWithIndex.map { case (hs, k) =>
      bucketCol(hs).cast("long").as(s"b$k")
    }: _*).cache()
    val bandCands = bandTables.indices.map { k =>
      wb.select(col("vec_id").as("a"), col(s"b$k"))
        .join(wb.select(col("vec_id").as("b"), col(s"b$k")), Seq(s"b$k"))
        .filter(col("a") < col("b")).select("a", "b")
    }.reduce(_ union _).distinct().cache()
    timed("bands", Some(bandCands), verify(bandCands), Some(exact))

    // IVF cells: top-nProbe of nCells centroids by dot score. Centroids
    // start as deterministic md5 hyperplanes and optionally take
    // `nTrain` spherical k-means Lloyd steps (the q75 machinery:
    // argmax-dot E-step, per-(cell, dim) mean M-step, renormalized) —
    // measuring how much TRAINED cells close the random-centroid recall
    // gap.
    val nTrain = if (args.length > 4) args(4).toInt else 0
    val seedMode = if (args.length > 5) args(5) else "rand"

    /** k-means|| seeding (the q160 operator's shape, probe-grade): two
      * oversampling passes at l = nCells/2 each, Bernoulli draw
      * u(x) < l·d²(x,C)/Σd² with md5-hash uniforms — candidates land
      * spread ∝ d², the k-means++ property the md5 seeds lack. The
      * ~nCells candidates (weight-ranked, md5-plane-padded) become the
      * starting centroids directly; optional Lloyd steps then refine. */
    def kppSeed(): Seq[Seq[Float]] = {
      val l = math.max(1, nCells / 2)
      def u(pass: Int) = expr(
        s"CAST(conv(substring(md5(concat('${pass}_', CAST(vec_id AS STRING))), 1, 8), 16, 10) AS DOUBLE) / 4294967296.0")
      // min squared L2 to the current centroid set, via |x|²−2x·c+|c|²
      def d2col(cents: Seq[Seq[Float]]): Column =
        cents.map { c =>
          val c2 = c.map(x => x.toDouble * x).sum
          norm2(col("embedding")) - lit(2.0) * dot_ff(typedLit(c), col("embedding")) + lit(c2)
        }.reduce(least(_, _))
      val x0 = e.orderBy("vec_id").limit(1).select("embedding")
        .collect()(0).getSeq[Float](0).toSeq
      var cents = Seq(x0)
      (1 to 2).foreach { pass =>
        val d2 = e.select(col("vec_id"), col("embedding"), d2col(cents).as("d2"))
        val ssum = d2.agg(sum("d2")).collect()(0).getDouble(0)
        val picked = d2.filter(u(pass) * lit(ssum) < lit(l.toDouble) * col("d2"))
          .select("embedding").collect().map(_.getSeq[Float](0).toSeq).toSeq
        cents = cents ++ picked
        System.err.println(s"[ivf-probe] kpp pass $pass: +${picked.size} candidates")
      }
      // weight-rank the candidates (members of a nearest-candidate
      // assignment), keep the heaviest nCells, pad with md5 planes
      val ranked =
        if (cents.size <= nCells) cents
        else {
          val scores = array(cents.zipWithIndex.map { case (c, i) =>
            struct(d2col(Seq(c)).as("s"), lit(i).as("i"))
          }: _*)
          val w = e.select(array_sort(scores).getItem(0).getField("i").as("cell"))
            .groupBy("cell").count().collect()
            .map(r => r.getInt(0) -> r.getLong(1)).toMap
          cents.zipWithIndex.sortBy { case (_, i) => (-w.getOrElse(i, 0L), i) }
            .take(nCells).map(_._1)
        }
      ranked ++ (ranked.size until nCells).map(i => hyperplane(300 + i))
    }

    var centroids: Seq[Seq[Float]] =
      if (seedMode == "kpp") kppSeed()
      else (0 until nCells).map(i => hyperplane(300 + i))
    def cellScores(cs: Seq[Seq[Float]]) = array(cs.zipWithIndex.map { case (c, i) =>
      struct(dot_ff(typedLit(c), col("embedding")).as("s"), lit(i).as("i"))
    }: _*)
    (1 to nTrain).foreach { it =>
      val t0 = System.nanoTime()
      val assignedTo = e.select(col("embedding"),
        reverse(array_sort(cellScores(centroids))).getItem(0).getField("i").as("cell"))
      val sums = assignedTo
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "comp")))
        .groupBy("cell", "dim")
        .agg(sum(col("comp").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      centroids = (0 until nCells).map { c =>
        byCell.get(c) match {
          case Some(rows) =>
            val mean = Array.ofDim[Double](64)
            rows.foreach(r => mean(r.getInt(1)) = r.getDouble(2) / r.getLong(3))
            val n2 = math.sqrt(mean.map(x => x * x).sum)
            if (n2 == 0) centroids(c) else mean.map(x => (x / n2).toFloat).toSeq
          case None => centroids(c) // empty cell keeps its seed
        }
      }
      System.err.println(f"[ivf-probe] lloyd step $it: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val assigned = e.select(col("vec_id"),
        slice(reverse(array_sort(cellScores(centroids))), 1, nProbe).as("topk"))
      .select(col("vec_id"), explode(col("topk")).as("c"))
      .select(col("vec_id"), col("c.i").as("cell"))
      .cache()
    val ivfCands = assigned.select(col("vec_id").as("a"), col("cell"))
      .join(assigned.select(col("vec_id").as("b"), col("cell")), Seq("cell"))
      .filter(col("a") < col("b")).select("a", "b").distinct().cache()
    timed(s"ivf$nCells/p$nProbe/t$nTrain/$seedMode", Some(ivfCands), verify(ivfCands), Some(exact))

    spark.stop()
  }
}
