package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal operator pack over binary payload columns.
  *
  * All three are DuckDB-verified. mm01: pure binary-column math (byte
  * length, md5 fingerprint, chunk count) on UTF-8 payloads both
  * engines build identically with `encode()`. mm02/mm03 exercise the
  * typed asset/decode/frame plumbing; their oracles reconstruct the
  * demo-asset layout in SQL — body-byte entropy via a char-code
  * histogram (corpus is pure ASCII, so UTF-8 bytes ≡ code points;
  * entropy rounded at 6 dp on both sides to absorb summation-order
  * ULPs), frame grids via `range()`. Exactness of the unrounded
  * operator output is additionally covered by MultimodalSpec.
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
    // per-asset features incl. body-byte entropy (rounded here, in the
    // query registration only, so the oracle hash is ULP-safe — the
    // operator itself stays exact for MultimodalSpec).
    "mm02_decode_features" -> ((s, d) => {
      val assets = Multimodal.demoAssets(
        Tables.documents(s, d).filter(col("doc_id") < 200),
        "doc_id", "text")
      Multimodal.decodeStub(assets).toDF()
        .withColumn("entropy", round(col("entropy"), 6))
    }),

    // Frame sampling: video assets → (asset_id, frame_idx, ts_ms)
    // rows via sequence+explode, no payload decode.
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
         FROM documents""",
    // Mirrors demoAssets+decodeStub: dims/kind derive from the body
    // length (w=16+len%64, h=16+(len/3)%64, bytes=13-byte header+len),
    // entropy is over BODY bytes only (decodeStub consumes the header
    // before histogramming). ASCII corpus ⇒ bytes ≡ ascii(char).
    "mm02_decode_features" ->
      """WITH src AS (
           SELECT doc_id AS asset_id, text,
                  octet_length(encode(text)) AS len
           FROM documents WHERE doc_id < 200),
         hist AS (
           SELECT asset_id, b, count(*) AS cnt
           FROM (SELECT asset_id, unnest(list_transform(
                   range(1, len(text) + 1), i -> ascii(text[i]))) AS b
                 FROM src)
           GROUP BY 1, 2),
         ent AS (
           SELECT h.asset_id,
                  -sum((cnt / n) * (ln(cnt / n) / ln(2))) AS entropy
           FROM hist h
           JOIN (SELECT asset_id, sum(cnt) AS n FROM hist GROUP BY 1) t
             USING (asset_id)
           GROUP BY 1)
         SELECT s.asset_id, CAST(16 + (len % 64) AS INTEGER) AS width,
                CAST(16 + ((len // 3) % 64) AS INTEGER) AS height,
                CAST(3 AS INTEGER) AS channels,
                CAST(13 + len AS INTEGER) AS bytes,
                round(e.entropy, 6) AS entropy
         FROM src s JOIN ent e USING (asset_id)""",
    // Mirrors frameSample on demoAssets: kind 'video' ⇔ id%3=2,
    // durationMs = body bytes x 10, frames every 500 ms inclusive
    // (range upper bound dur+1 ≡ Spark sequence's inclusive stop).
    "mm03_frame_sample" ->
      """WITH v AS (
           SELECT doc_id AS asset_id,
                  octet_length(encode(text)) * 10 AS dur
           FROM documents WHERE doc_id < 200 AND doc_id % 3 = 2)
         SELECT asset_id, CAST(ts_ms // 500 AS INTEGER) AS frame_idx,
                ts_ms
         FROM (SELECT asset_id, unnest(range(0, dur + 1, 500)) AS ts_ms
               FROM v)"""
  )
}
