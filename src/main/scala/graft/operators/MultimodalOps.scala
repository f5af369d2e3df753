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
            CAST(4 + octet_length(encode(text)) AS BIGINT) AS n_bytes,
            CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'IMG0' WHEN 1 THEN 'AUD0'
                 ELSE 'VID0' END AS header,
            CAST(n_chars * 10 AS BIGINT) AS duration_ms
            FROM documents ORDER BY asset_id"""))

  /** Feature-extraction path through the stubbed codec (mapPartitions
    * batch contract). Not SQL-expressible — the codec is engine code —
    * so this is a rows-only check; determinism is pinned by
    * MultimodalSpec instead.
    *
    * The 16-dim feature vector is emitted as SCALAR columns (first
    * component, max, and an md5 signature of the full vector), not as an
    * array: the driver's rows-only check sorts the result frame in
    * pandas, and a raw array column is unhashable there (round-1
    * failure). Scalars carry the same verification power. */
  val q50_multimodal_features = QueryDef(
    "q50_multimodal_features",
    (s, dir) => Multimodal.featureTable(s, dir)
      .select(col("asset_id"), col("kind"), col("n_bytes"), col("header"),
        element_at(col("features"), 1).cast("double").as("f0"),
        array_max(col("features")).cast("double").as("f_max"),
        md5(concat_ws(",", expr("transform(features, x -> CAST(x AS STRING))")))
          .as("features_sig"))
      .orderBy("asset_id"),
    None)

  override val defs: Seq[QueryDef] = Seq(q49_multimodal_meta, q50_multimodal_features)
}
