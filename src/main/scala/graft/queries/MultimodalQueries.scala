package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal operator pack over binary payload columns.
  *
  * All three are DuckDB-verified. mm01: pure binary-column math (byte
  * length, md5 fingerprint, chunk count) on UTF-8 payloads both
  * engines build identically with `encode()`. mm02 decodes REAL
  * payloads — PNG / WAV / multi-frame GIF built by the demo fixture —
  * through the JVM's actual codecs (`javax.imageio`,
  * `javax.sound.sampled`); its oracle can predict the decoded
  * features in SQL because the fixture's content is deterministic
  * (document bytes cycled through the pixel/sample grid, all three
  * codecs lossless; corpus is pure ASCII, so UTF-8 bytes ≡ code
  * points; entropy rounded at 6 dp on both sides to absorb
  * summation-order ULPs). mm03 exercises frame-grid explosion via
  * `range()`. Byte-exact codec round-trips are additionally covered
  * by MultimodalSpec.
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

    // Typed asset table → batch decode through real codecs: per-asset
    // decoded-content features incl. byte entropy (rounded here, in
    // the query registration only, so the oracle hash is ULP-safe —
    // the operator itself stays exact for MultimodalSpec).
    "mm02_decode_features" -> ((s, d) => {
      val assets = Multimodal.demoAssets(
        Tables.documents(s, d).filter(col("doc_id") < 200),
        "doc_id", "text")
      Multimodal.decode(assets).toDF()
        .withColumn("entropy", round(col("entropy"), 6))
    }),

    // Frame sampling: video assets → (asset_id, frame_idx, ts_ms)
    // rows via sequence+explode, no payload decode.
    "mm03_frame_sample" -> ((s, d) => {
      val assets = Multimodal.demoAssets(
        Tables.documents(s, d).filter(col("doc_id") < 200),
        "doc_id", "text").toDF()
      Multimodal.frameSample(assets, everyMs = 500L)
    }),

    // Perceptual average-hash per image asset, through the REAL
    // javax.imageio decode: 8x8 block means over the raster, bit c
    // set iff cell mean > image mean — evaluated as the integer
    // cross-product rule cs*(w*h) > ts*cn, so the oracle (which
    // recomputes the raster from the deterministic fixture text in
    // SQL) matches every bit with zero FP-tie risk. The hash table is
    // the gate row; banded near-dup PAIRING over these hashes
    // (4x16-bit bands, exact popcount verify) is spec'd on planted
    // near-identical PNGs in MultimodalSpec — the fixture corpus has
    // no two images with equal dims, so pairs would gate vacuously.
    "mm04_image_ahash" -> ((s, d) => {
      val assets = Multimodal.demoAssets(
        Tables.documents(s, d).filter(col("doc_id") < 200),
        "doc_id", "text")
      Multimodal.aHash(assets).toDF()
    })
  )

  val oracleSql: Map[String, String] = Map(
    "mm01_binary_meta" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         md5(text) AS fingerprint,
         CAST(ceil(octet_length(encode(text)) / 65536.0) AS BIGINT)
           AS n_chunks
         FROM documents""",
    // Mirrors demoAssets+decode: kind round-robins on id%3; dims
    // derive from the body length (w=16+len%64, h=16+(len//3)%64);
    // the decoded content is the body cycled through the grid —
    // image w·h pixels, audio len samples, video (1+len%4) frames of
    // w·h — so byte i of the content is text[(i % len)+1]. All three
    // fixture codecs are lossless, which is what makes the decoded
    // histogram SQL-predictable.
    "mm02_decode_features" ->
      """WITH dims AS (
           SELECT doc_id AS asset_id, CAST(doc_id % 3 AS INTEGER) AS k,
                  text, octet_length(encode(text)) AS len,
                  16 + (octet_length(encode(text)) % 64) AS w,
                  16 + ((octet_length(encode(text)) // 3) % 64) AS h
           FROM documents WHERE doc_id < 200),
         shaped AS (
           SELECT asset_id, k, text, len,
                  CASE WHEN k = 1 THEN 0 ELSE w END AS width,
                  CASE WHEN k = 1 THEN 0 ELSE h END AS height,
                  CASE WHEN k = 0 THEN 1
                       WHEN k = 1 THEN len
                       ELSE 1 + (len % 4) END AS frames,
                  CASE WHEN k = 0 THEN w * h
                       WHEN k = 1 THEN len
                       ELSE (1 + (len % 4)) * w * h END AS content
           FROM dims),
         hist AS (
           SELECT asset_id, b, count(*) AS cnt
           FROM (SELECT asset_id, unnest(list_transform(
                   range(0, content),
                   i -> ascii(text[CAST(i % len AS INTEGER) + 1]))) AS b
                 FROM shaped)
           GROUP BY 1, 2),
         ent AS (
           SELECT h.asset_id,
                  -sum((cnt / n) * (ln(cnt / n) / ln(2))) AS entropy
           FROM hist h
           JOIN (SELECT asset_id, sum(cnt) AS n FROM hist GROUP BY 1) t
             USING (asset_id)
           GROUP BY 1)
         SELECT s.asset_id,
                CASE WHEN k = 0 THEN 'image' WHEN k = 1 THEN 'audio'
                     ELSE 'video' END AS kind,
                CAST(s.width AS INTEGER) AS width,
                CAST(s.height AS INTEGER) AS height,
                CAST(1 AS INTEGER) AS channels,
                CAST(s.frames AS INTEGER) AS frames,
                CAST(s.content AS BIGINT) AS content_bytes,
                round(e.entropy, 6) AS entropy
         FROM shaped s JOIN ent e USING (asset_id)""",
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
               FROM v)""",
    // mm04: the raster rebuilt from the deterministic fixture text
    // (pixel i of the w x h grid = byte i%len of the doc — the mm02
    // losslessness), block-binned into the same 8x8 cells by floor
    // division, bit rule as the integer cross-product, 64 bits folded
    // into two 32-bit halves (so no 2^63 sign overflow in BIGINT).
    "mm04_image_ahash" ->
      """WITH img AS (
           SELECT doc_id AS asset_id, text,
                  octet_length(encode(text)) AS len,
                  16 + (octet_length(encode(text)) % 64) AS w,
                  16 + ((octet_length(encode(text)) // 3) % 64) AS h
           FROM documents WHERE doc_id < 200 AND doc_id % 3 = 0),
         pv AS (
           SELECT asset_id, w, h,
                  unnest(list_transform(range(0, w * h),
                    i -> ascii(text[CAST(i % len AS INTEGER) + 1]))) AS v,
                  unnest(range(0, w * h)) AS i
           FROM img),
         cells AS (
           SELECT asset_id,
                  ((i // w) * 8 // h) * 8 + ((i % w) * 8 // w) AS c,
                  CAST(sum(v) AS BIGINT) AS cs,
                  CAST(count(*) AS BIGINT) AS cn,
                  max(w * h) AS n
           FROM pv GROUP BY 1, 2),
         tot AS (
           SELECT asset_id, CAST(sum(cs) AS BIGINT) AS ts,
                  max(n) AS n
           FROM cells GROUP BY 1),
         bits AS (
           SELECT c.asset_id, c.c,
                  CASE WHEN c.cs * t.n > t.ts * c.cn
                       THEN 1 ELSE 0 END AS bit
           FROM cells c JOIN tot t USING (asset_id))
         SELECT asset_id,
                CAST(sum(CASE WHEN c >= 32
                  THEN bit * (CAST(1 AS BIGINT) << CAST(c - 32 AS INTEGER))
                  ELSE 0 END) AS BIGINT) AS h_hi,
                CAST(sum(CASE WHEN c < 32
                  THEN bit * (CAST(1 AS BIGINT) << CAST(c AS INTEGER))
                  ELSE 0 END) AS BIGINT) AS h_lo
         FROM bits GROUP BY 1"""
  )
}
