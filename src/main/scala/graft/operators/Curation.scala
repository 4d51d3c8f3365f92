package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.{Analysis, TextOps}

/** End-to-end corpus curation — the composition a 100 TB training-data
  * pipeline actually runs over raw documents: language-ID → quality
  * gates → exact dedup (keep-first) → token budgeting. One operator so
  * the whole pre-training funnel is a single declarative plan.
  *
  * Scale shape: every stage up to dedup is per-row Catalyst (codegen'd
  * with the scan, filters collapse into one predicate — the corpus
  * shrinks BEFORE anything shuffles). The only shuffle is the dedup
  * window, and it moves the slim scored projection (16-byte md5 + a
  * few ints per row), never the document text. Near-dup removal at
  * scale chains [[Dedup.minhashLshPairs]] on the survivors.
  */
object Curation {

  /** Curate `docs`: keep `keepLang` documents with ≥ `minTokens`
    * whitespace tokens and type-token ratio ≥ `minTtr`, drop exact
    * duplicates keeping the lowest id, and report whitespace + BPE-ish
    * token counts (the cost-estimate columns) plus the content
    * fingerprint.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             keepLang: String = "en", minTokens: Int = 20,
             minTtr: Double = 0.35): DataFrame = {
    // bind the token array once: langId alone reads it per marker
    // list, and a raw Column expression is re-inlined (re-split) at
    // every reference — same fix as Dedup.shingles
    val toks = col("__toks")
    val scored = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"),
        TextOps.tokenize(col(textCol)).as("__toks"))
      .select(
        col("doc_id"),
        Analysis.langId(toks).as("lang_pred"),
        Analysis.tokenCount(toks).as("n_tokens"),
        Analysis.typeTokenRatio(toks).as("ttr"),
        size(regexp_extract_all(col("__text"), lit(Analysis.BpeIshRe),
          lit(0))).as("bpe_tokens"),
        Analysis.fingerprint(col("__text")).as("fp"))
      .filter(col("lang_pred") === keepLang &&
        col("n_tokens") >= minTokens && col("ttr") >= minTtr)
    // exact dedup, keep-first: one shuffle of the slim projection
    val byContent = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    scored
      .withColumn("rk", row_number().over(byContent))
      .filter(col("rk") === 1)
      .drop("rk")
  }

  /** Incremental corpus upsert — the MERGE that folds a change batch
    * into a base snapshot: the latest delta version of a key replaces
    * the base row, a tombstone (`deleteCol` = true) at the latest
    * version drops the key, untouched base rows pass through. `delta`
    * carries the base schema plus `versionCol` and `deleteCol`;
    * versions must be unique per key (the tie is otherwise
    * non-deterministic).
    *
    * Scale shape: the obvious plan — window over base ∪ delta —
    * re-shuffles the whole 100 TB snapshot to apply a GB-scale batch.
    * Here base is touched only by a LEFT ANTI against the delta's key
    * set, explicitly broadcast: base rows stream through their scan
    * unshuffled, and the latest-version window runs on the delta
    * alone. When a delta outgrows broadcast size, drop the hint and
    * the same plan degrades gracefully to a shuffled anti join of the
    * slim key projection.
    */
  def upsert(base: DataFrame, delta: DataFrame, keyCol: String,
      versionCol: String, deleteCol: String): DataFrame = {
    val latest = delta
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col(versionCol).desc)))
      .filter(col("__rk") === 1)
      .drop("__rk")
    val untouched = base.join(broadcast(latest.select(col(keyCol))),
      Seq(keyCol), "left_anti")
    untouched.unionByName(
      latest.filter(!col(deleteCol)).drop(versionCol, deleteCol))
  }
}
