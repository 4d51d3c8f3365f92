package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size token chunking — the split step that turns documents
  * into training sequences. Strided windows (stride < chunkSize gives
  * overlapping context) computed with `sequence` + `posexplode`:
  * pure per-row fan-out of ~n/stride chunks, no shuffle, no UDF, so
  * it scales with the scan like any generator. Emitting chunk *text*
  * keeps the row payload bounded by chunkSize regardless of document
  * length — a 1 GB document becomes many small rows, never one huge
  * one downstream.
  */
object Chunking {

  /** One row per (doc, chunk): chunk_idx, the re-joined chunk text,
    * and its token count (< chunkSize only for the final tail chunk).
    * Empty docs produce no rows.
    */
  def chunks(docs: DataFrame, idCol: String, tokens: Column,
             chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1,
      s"chunkSize/stride must be >= 1 (got $chunkSize/$stride)")
    docs.select(col(idCol).as("doc_id"), tokens.as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col("doc_id"), col("__toks"),
        posexplode(sequence(lit(0), size(col("__toks")) - 1, lit(stride)))
          .as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("__toks"), col("start") + 1, lit(chunkSize))
          .as("__chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        array_join(col("__chunk"), " ").as("chunk_text"),
        size(col("__chunk")).as("n_tokens"))
  }
}
