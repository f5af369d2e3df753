package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column support for a training-data pipeline: image/audio/
  * video travel as opaque BINARY columns with typed metadata, and
  * decode/feature/resize/frame-sample run as per-partition batch
  * transforms.
  *
  * The Spark-side plumbing here is real and tested — schema, typed
  * Dataset, partition-batched iteration (the JVM analog of an Arrow
  * batch UDF), deterministic outputs, partitioning on asset_id. The
  * CODEC itself is stubbed (no image/audio libraries in this
  * environment): [[MediaCodec.decodeStub]] derives features from raw
  * bytes deterministically where a real build would call the decoder.
  *
  * Scale notes: media bytes never pass through a shuffle — features are
  * computed map-side and the heavy BINARY column is dropped before any
  * wide stage; metadata predicates (kind/byte-size) prune before decode.
  */
object Multimodal {

  /** One media asset: the binary payload + metadata columns a catalog
    * would carry. Metadata is nullable-by-kind (images have no
    * sample_rate; audio has no width/height). */
  final case class MediaAsset(
      asset_id: Long,
      kind: String,          // image | audio | video
      media: Array[Byte],
      format: String,
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      asset_id: Long,
      kind: String,
      n_bytes: Long,
      header: String,
      features: Array[Float]) // fixed-size feature vector (16-dim)

  /** Deterministic media synthesis from the documents table: the text
    * bytes play the role of an encoded payload, prefixed with a
    * kind-specific 4-byte magic header (what a real container format
    * would carry). Everything downstream treats `media` as opaque. */
  def synthesizeAssets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        concat(
          element_at(array(lit("IMG0"), lit("AUD0"), lit("VID0")),
            (col("doc_id") % 3 + 1).cast("int")),
          col("text")).cast("binary").as("media"),
        element_at(array(lit("png"), lit("wav"), lit("mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        when(col("doc_id") % 3 === 0, (col("n_chars") % 1024 + 1).cast("int"))
          .otherwise(lit(0)).cast("int").as("width"),
        when(col("doc_id") % 3 === 0, (col("n_chars") % 768 + 1).cast("int"))
          .otherwise(lit(0)).cast("int").as("height"),
        when(col("doc_id") % 3 === 1, lit(16000)).otherwise(lit(0)).cast("int").as("sample_rate"),
        (col("n_chars") * 10).cast("long").as("duration_ms"))
      .as[MediaAsset]
  }

  /** The decode + feature-extraction stage: per-partition batch
    * iteration so a real codec would amortize init (model load, decoder
    * context) once per partition — the same contract as an Arrow-batch
    * UDF. Output schema is fixed 16-dim float features. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // Real build: init decoder/codec context HERE, once per partition.
      batch.map { a =>
        MediaFeatures(a.asset_id, a.kind, a.media.length.toLong,
          new String(a.media.take(4), "UTF-8"),
          MediaCodec.decodeStub(a.media))
      }
    }
  }

  /** "Resize" (image) / "frame-sample" (video): byte-level surrogate
    * transforms with the real operator shape — binary in, binary out,
    * metadata updated, no shuffle. */
  def resize(assets: Dataset[MediaAsset], maxBytes: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      if (a.media.length <= maxBytes) a
      else a.copy(media = a.media.take(maxBytes),
        width = math.min(a.width, maxBytes), height = math.min(a.height, maxBytes))
    })
  }

  def frameSample(assets: Dataset[MediaAsset], everyNth: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      if (a.kind != "video") a
      else a.copy(media = a.media.zipWithIndex.collect {
        case (b, i) if i % everyNth == 0 => b
      })
    })
  }

  /** DataFrame view with media dropped — what downstream analytics joins
    * against (the binary column must not travel through shuffles). */
  def featureTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(synthesizeAssets(spark, dir))
      .toDF()
      .repartition(col("asset_id")) // co-locate by asset for downstream joins
  }
}

/** The stubbed codec boundary. A production build replaces
  * [[decodeStub]]'s body with a real decoder call (e.g. image →
  * pixels → pooled embedding); signature, determinism and batch shape
  * stay identical. */
object MediaCodec {
  /** Deterministic 16-dim "feature": normalized 16-bucket byte
    * histogram of the payload. Stands in for decode+embed. */
  def decodeStub(media: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < media.length) {
      hist((media(i) & 0xff) >> 4) += 1f
      i += 1
    }
    if (media.length > 0) {
      var j = 0
      while (j < 16) { hist(j) /= media.length.toFloat; j += 1 }
    }
    hist
  }
}
