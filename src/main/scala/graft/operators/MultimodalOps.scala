package graft.operators

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

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

  override val defs: Seq[QueryDef] = Seq(q49_multimodal_meta, q50_multimodal_features)
}
