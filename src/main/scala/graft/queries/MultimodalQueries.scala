package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal operator pack over binary payload columns.
  *
  * mm01 is DuckDB-verified: pure binary-column math (byte length, md5
  * fingerprint, chunk count) on UTF-8 payloads both engines build
  * identically with `encode()`. mm02/mm03 exercise the typed
  * asset/decode/frame plumbing (rows-only; exactness covered by
  * MultimodalSpec).
  */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Binary column metadata: byte length ≠ char length for non-ASCII,
    // content fingerprint, 64 KiB chunk count — the metadata columns a
    // 100 TB blob table filters on without reading payloads.
    "mm01_binary_meta" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .select(col("doc_id"),
          length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("fingerprint"),
          ceil(length(col("payload")) / lit(65536.0)).cast("long")
            .as("n_chunks"))),

    // Typed asset table → batch decode (stubbed codec, real batching):
    // per-asset features incl. byte entropy. Rows-only.
    "mm02_decode_features" -> ((s, d) => {
      val assets = Multimodal.demoAssets(
        Tables.documents(s, d).filter(col("doc_id") < 200),
        "doc_id", "text")
      Multimodal.decodeStub(assets).toDF()
    }),

    // Frame sampling: video assets → (asset_id, frame_idx, ts_ms)
    // rows via sequence+explode, no payload decode. Rows-only.
    "mm03_frame_sample" -> ((s, d) => {
      val assets = Multimodal.demoAssets(
        Tables.documents(s, d).filter(col("doc_id") < 200),
        "doc_id", "text").toDF()
      Multimodal.frameSample(assets, everyMs = 500L)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "mm01_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
         md5(text) AS fingerprint,
         CAST(ceil(octet_length(encode(text)) / 65536.0) AS BIGINT)
           AS n_chunks
         FROM documents"""
  )
}
