package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.Analysis

/** Deduplication operators for training-data pipelines.
  *
  * Scale design:
  *  - exact dedup is a single hash-aggregate on a 128-bit content
  *    hash — shuffles the hash + tiny payload, never the documents;
  *  - MinHash-LSH shuffles (doc, band-signature) pairs, so candidate
  *    generation is O(docs × bands), never O(docs²); only candidate
  *    pairs pay the exact-Jaccard verification join;
  *  - all hash functions are content-derived (md5), so results are
  *    deterministic across partitionings, retries, and engines — no
  *    RNG in the data path.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct content, with the
    * surviving (minimum) id and the duplicate count. Group on the md5
    * so 100 TB of text shuffles 16-byte keys, not documents.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** Keep-first exact dedup: drops all but the min-id row per content. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(docs, idCol, textCol).select(col("keep_id"))
    docs.join(keep, docs(idCol) === col("keep_id"), "left_semi")
  }

  /** (doc, shingle) pairs: distinct word n-grams per document,
    * computed in-row (no explode-then-distinct shuffle of raw grams —
    * `array_distinct` collapses in-row first).
    */
  def shingles(docs: DataFrame, idCol: String, tokens: Column,
               n: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(Analysis.ngrams(tokens, n))).as("shingle"))

  /** Exact n-gram Jaccard near-dup pairs (a < b, jaccard ≥ threshold).
    * O(pairs sharing a shingle) — fine when shingles are selective;
    * the LSH variant below is the 100 TB path.
    */
  def jaccardPairs(sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("sa"), col("a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("b") === col("sb.doc_id"))
      .select(col("a"), col("b"),
        (col("i").cast("double") /
          (col("sa.n") + col("sb.n") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signatures: `numHashes` independent permutations
    * simulated by md5("<h>|<shingle>") — lexicographic min of a
    * uniform hash is a valid MinHash. Deterministic and
    * engine-portable (same values in DuckDB).
    */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    val spark = sh.sparkSession
    val hashIds = spark.range(numHashes).select(col("id").cast("int").as("h"))
    sh.crossJoin(broadcast(hashIds))
      .groupBy(col("doc_id"), col("h"))
      .agg(min(md5(concat(col("h").cast("string"), lit("|"),
        col("shingle")))).as("m"))
  }

  /** LSH banding: group `rowsPerBand` consecutive minhashes, hash each
    * band to one signature; docs sharing any (band, signature) bucket
    * become candidate pairs.
    */
  def lshBands(minh: DataFrame, rowsPerBand: Int): DataFrame =
    minh.withColumn("b", expr(s"h DIV $rowsPerBand"))
      .groupBy(col("doc_id"), col("b"))
      .agg(md5(array_join(transform(
        array_sort(collect_list(struct(col("h"), col("m")))),
        x => x.getField("m")), "")).as("sig"))

  /** Candidate pairs from shared LSH buckets (a < b, distinct). */
  def lshCandidates(bands: DataFrame): DataFrame =
    bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()

  /** Full MinHash-LSH near-dup pipeline: shingle → minhash → band →
    * bucket-join → exact-Jaccard verify on candidates only.
    */
  def minhashLshPairs(sh: DataFrame, numHashes: Int = 16,
                      rowsPerBand: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    val cands = lshCandidates(lshBands(minhashSignatures(sh, numHashes),
      rowsPerBand))
    jaccardPairs(sh, threshold)
      .join(cands, Seq("a", "b"), "left_semi")
  }

  /** Per-token 60-bit hashes (15 hex chars of md5 → fits a signed
    * long in every engine). Materialize this as its own column before
    * calling [[simhashFromHashes]] so the md5s are computed once per
    * row, not once per bit.
    */
  def tokenHashes(tokens: Column): Column =
    transform(tokens, t => conv(substring(md5(t), 1, 15), 16, 10)
      .cast("long"))

  /** 60-bit SimHash from pre-hashed tokens: per-bit ±1 votes, sign →
    * bit, packed with literal shifts. Pure in-row Catalyst HOFs —
    * no shuffle, scales with the scan.
    */
  def simhashFromHashes(hvs: Column): Column =
    (0 until 60).map { b =>
      val vote = aggregate(hvs, lit(0L), (acc, hv) =>
        acc + when(shiftright(hv, b).bitwiseAND(1L) === 1L, 1L)
          .otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  def simhash(tokens: Column): Column = simhashFromHashes(tokenHashes(tokens))

  /** Hamming distance between two simhash fingerprints. */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within a Hamming radius. Buckets by the
    * top 16 bits first so the self-join is band-local, then verifies
    * distance — the standard scale trick (rotate/re-bucket for full
    * recall at 100 TB; one band is the demo configuration).
    */
  def simhashPairs(docs: DataFrame, idCol: String, tokens: Column,
                   maxDist: Int = 3): DataFrame = {
    val fp = docs
      .select(col(idCol).as("doc_id"), tokenHashes(tokens).as("hvs"))
      .select(col("doc_id"), simhashFromHashes(col("hvs")).as("fp"))
      .withColumn("bucket", shiftright(col("fp"), 44))
    fp.as("x").join(fp.as("y"),
        col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        hammingDist(col("x.fp"), col("y.fp")).as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
