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
             chunkSize: Int, stride: Int,
             passthrough: Seq[String] = Nil): DataFrame = {
    require(chunkSize >= 1 && stride >= 1,
      s"chunkSize/stride must be >= 1 (got $chunkSize/$stride)")
    val extra = passthrough.map(col)
    docs.select(col(idCol).as("doc_id") +: tokens.as("__toks") +: extra: _*)
      .filter(size(col("__toks")) > 0)
      .select(col("doc_id") +: col("__toks") +:
        posexplode(sequence(lit(0), size(col("__toks")) - 1, lit(stride)))
          .as(Seq("chunk_idx", "start")) +: extra: _*)
      .select(col("doc_id") +: col("chunk_idx") +:
        slice(col("__toks"), col("start") + 1, lit(chunkSize))
          .as("__chunk") +: extra: _*)
      .select(col("doc_id") +: col("chunk_idx") +:
        array_join(col("__chunk"), " ").as("chunk_text") +:
        size(col("__chunk")).as("n_tokens") +: extra: _*)
  }

  /** Sequence packing: chunks concatenated per group in (doc_id,
    * chunk_idx) order and cut into `budget`-token packs — pack_id =
    * which budget-window the chunk's first token lands in, i.e.
    * `floor(tokens_before / budget)`. One window cumsum per group
    * (the group key — e.g. source shard — bounds the sort), and the
    * follow-up aggregation reuses the same hash partitioning, so the
    * whole operator costs a single shuffle. A pack can overrun the
    * budget by at most chunkSize−1 tokens (the straddling chunk stays
    * whole); trainers truncate, they never see a split chunk. True
    * greedy close-when-full packing is inherently sequential per
    * group — this windowed form is the deterministic, engine-portable
    * variant.
    */
  def pack(chunks: DataFrame, groupCol: String, budget: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 1, s"budget must be >= 1 (got $budget)")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("doc_id"), col("chunk_idx"))
    chunks
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col("n_tokens")) / budget))
      .groupBy(col(groupCol), col("pack_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("pack_tokens"))
  }
}
