package graft.operators

import org.apache.spark.sql.functions._
import graft.multimodal.{Containers, Multimodal}
import graft.sources.Tables

/** Query-surface entries for the multimodal plumbing (binary media
  * columns + stubbed codec — see graft.multimodal.Multimodal). */
object MultimodalOps extends QueryModule {

  /** Metadata path: binary payloads with typed metadata, predicates on
    * metadata prune before any decode. Oracle recomputes the synthesized
    * metadata directly from the source table. */
  val q49_multimodal_meta = QueryDef(
    "q49_multimodal_meta",
    (s, dir) => Multimodal.synthesizeAssets(s, dir)
      .toDF()
      .select(col("asset_id"), col("kind"), col("format"),
        octet_length(col("media")).cast("long").as("n_bytes"),
        col("media").cast("string").substr(1, 4).as("header"),
        col("duration_ms"))
      .orderBy("asset_id"),
    Some("""SELECT doc_id AS asset_id,
            CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                 ELSE 'video' END AS kind,
            CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
                 ELSE 'mp4' END AS format,
            CAST(16 + octet_length(encode(text)) AS BIGINT) AS n_bytes,
            CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'IMG0' WHEN 1 THEN 'AUD0'
                 ELSE 'VID0' END AS header,
            CAST(n_chars * 10 AS BIGINT) AS duration_ms
            FROM documents ORDER BY asset_id"""))

  /** Feature-extraction path through the real binary decode
    * (mapPartitions batch contract): every output column is parsed or
    * digested FROM THE MEDIA BYTES on the Spark side — magic header,
    * big-endian width/height/sample_rate, md5 of the payload — while
    * the oracle recomputes the expected values from the source columns
    * the synthesis used. A decode bug (wrong offset, wrong endianness,
    * off-by-one payload slice) breaks the hash match, which is exactly
    * the correctness signal a stubbed codec can't give. Only the
    * embedding step (byte-histogram standing in for a model) remains
    * engine-only; it is pinned by MultimodalSpec. */
  val q50_multimodal_features = QueryDef(
    "q50_multimodal_features",
    (s, dir) => Multimodal.featureTable(s, dir)
      .select(col("asset_id"), col("kind"), col("n_bytes"), col("header"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("payload_sig"))
      .orderBy("asset_id"),
    Some("""SELECT doc_id AS asset_id,
            CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                 ELSE 'video' END AS kind,
            CAST(16 + octet_length(encode(text)) AS BIGINT) AS n_bytes,
            CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'IMG0' WHEN 1 THEN 'AUD0'
                 ELSE 'VID0' END AS header,
            CAST(CASE WHEN doc_id % 3 = 0 THEN n_chars % 1024 + 1 ELSE 0 END AS BIGINT) AS width,
            CAST(CASE WHEN doc_id % 3 = 0 THEN n_chars % 768 + 1 ELSE 0 END AS BIGINT) AS height,
            CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS BIGINT) AS sample_rate,
            md5(text) AS payload_sig
            FROM documents ORDER BY asset_id"""))

  /** REAL container codec round-trip (round 7): per document, a genuine
    * 24-bit BMP (image docs) or PCM16 RIFF/WAVE (audio docs) is ENCODED
    * from deterministic parameters and immediately DECODED by the
    * independent parser in [[graft.multimodal.Containers]]; the emitted
    * columns are what the DECODER read out of the bytes, while the
    * oracle recomputes every value from the generating arithmetic. The
    * probe columns are chosen to make format bugs break the hash:
    * `px_first` is image-space (0,0) = the LAST stored row (bottom-up
    * storage), `px_last` sits behind every per-row padding boundary,
    * `file_bytes` is the header's size field (stride arithmetic), and
    * `s_mid`/`s_last` are signed little-endian reads at odd offsets.
    * Encode+decode run map-side per partition (the sanctioned
    * multimodal byte-codec case); bytes never shuffle. */
  val q163_media_codec = QueryDef(
    "q163_media_codec",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents").select("doc_id", "n_chars")
        .as[(Long, Long)]
        .filter(_._1 % 3 != 2)
        .mapPartitions(_.map { case (id, nc) =>
          if (id % 3 == 0) {
            val w = (nc % 64 + 1).toInt
            val h = (nc % 48 + 1).toInt
            val bytes = Containers.encodeBmp24(w, h, (x, y) =>
              (((id + x) % 256).toInt, ((id + y) % 256).toInt,
                ((id + x + y) % 256).toInt))
            val d = Containers.decodeBmp24(bytes)
            require(d.fileSize == bytes.length, "BMP size field mismatch")
            (id, "image", d.width.toLong, d.height.toLong, d.fileSize.toLong,
              d.firstPixel.toLong, d.lastPixel.toLong, -1L, -1L, -1L, -1L, -1L)
          } else {
            val n = (nc % 100 + 1).toInt
            val samples = Array.tabulate(n)(i =>
              (((id * 13 + i * 17) % 65536) - 32768).toShort)
            val bytes = Containers.encodeWavPcm16(16000, samples)
            val d = Containers.decodeWavPcm16(bytes)
            (id, "audio", -1L, -1L, -1L, -1L, -1L, d.sampleRate.toLong,
              d.nSamples.toLong, d.firstSample.toLong, d.midSample.toLong,
              d.lastSample.toLong)
          }
        })
        .toDF("asset_id", "kind", "wd", "ht", "file_bytes", "px_first", "px_last",
          "sr", "n_samp", "s_first", "s_mid", "s_last")
        .orderBy("asset_id")
    },
    Some("""SELECT CAST(doc_id AS BIGINT) AS asset_id, 'image' AS kind,
            CAST(n_chars % 64 + 1 AS BIGINT) AS wd,
            CAST(n_chars % 48 + 1 AS BIGINT) AS ht,
            CAST(54 + (((n_chars % 64 + 1) * 3 + 3) // 4) * 4 * (n_chars % 48 + 1)
                 AS BIGINT) AS file_bytes,
            CAST((doc_id % 256) * 65536 + (doc_id % 256) * 256 + doc_id % 256
                 AS BIGINT) AS px_first,
            CAST(((doc_id + n_chars % 64) % 256) * 65536
                 + ((doc_id + n_chars % 48) % 256) * 256
                 + (doc_id + n_chars % 64 + n_chars % 48) % 256
                 AS BIGINT) AS px_last,
            CAST(-1 AS BIGINT) AS sr, CAST(-1 AS BIGINT) AS n_samp,
            CAST(-1 AS BIGINT) AS s_first, CAST(-1 AS BIGINT) AS s_mid,
            CAST(-1 AS BIGINT) AS s_last
            FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT CAST(doc_id AS BIGINT), 'audio',
            -1, -1, -1, -1, -1,
            16000, CAST(n_chars % 100 + 1 AS BIGINT),
            CAST((doc_id * 13) % 65536 - 32768 AS BIGINT),
            CAST((doc_id * 13 + ((n_chars % 100 + 1) // 2) * 17) % 65536 - 32768
                 AS BIGINT),
            CAST((doc_id * 13 + (n_chars % 100) * 17) % 65536 - 32768 AS BIGINT)
            FROM documents WHERE doc_id % 3 = 1
            ORDER BY asset_id"""))

  /** COMPRESSED container round-trip (round 7): a genuine PNG — zlib
    * IDAT, per-chunk CRC32, alternating None/Up scanline filters — is
    * encoded per image doc and re-parsed by the independent decoder in
    * [[graft.multimodal.Png]]. Deflate output is encoder-dependent, so
    * unlike q163 the oracle checks DECODED values only: dimensions,
    * the exact raw (pre-compression) byte count h·(1+3w), and probe
    * pixels that are wrong under any filter/unfilter bug (the Up
    * filter on odd rows makes every later row depend on correct
    * unfiltering of the row above). */
  val q164_png_codec = QueryDef(
    "q164_png_codec",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents").select("doc_id", "n_chars")
        .as[(Long, Long)]
        .filter(_._1 % 3 == 0)
        .mapPartitions(_.map { case (id, nc) =>
          val w = (nc % 32 + 1).toInt
          val h = (nc % 24 + 1).toInt
          val bytes = graft.multimodal.Png.encode(w, h, (x, y) =>
            (((id + x) % 256).toInt, ((id + y) % 256).toInt,
              ((id + x + y) % 256).toInt))
          val d = graft.multimodal.Png.decode(bytes)
          (id, d.width.toLong, d.height.toLong, d.rawBytes.toLong,
            d.firstPixel.toLong, d.lastPixel.toLong)
        })
        .toDF("asset_id", "wd", "ht", "raw_bytes", "px_first", "px_last")
        .orderBy("asset_id")
    },
    Some("""SELECT CAST(doc_id AS BIGINT) AS asset_id,
            CAST(n_chars % 32 + 1 AS BIGINT) AS wd,
            CAST(n_chars % 24 + 1 AS BIGINT) AS ht,
            CAST((n_chars % 24 + 1) * (1 + (n_chars % 32 + 1) * 3) AS BIGINT) AS raw_bytes,
            CAST((doc_id % 256) * 65536 + (doc_id % 256) * 256 + doc_id % 256
                 AS BIGINT) AS px_first,
            CAST(((doc_id + n_chars % 32) % 256) * 65536
                 + ((doc_id + n_chars % 24) % 256) * 256
                 + (doc_id + n_chars % 32 + n_chars % 24) % 256
                 AS BIGINT) AS px_last
            FROM documents WHERE doc_id % 3 = 0
            ORDER BY asset_id"""))

  override val defs: Seq[QueryDef] =
    Seq(q49_multimodal_meta, q50_multimodal_features, q163_media_codec,
      q164_png_codec)
}
