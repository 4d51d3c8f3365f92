package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic content-hash dataset splitting and sampling — how a
  * 100 TB corpus is split for training.
  *
  * `randomSplit` draws per-partition Bernoulli samples from a seeded
  * RNG: reshuffle the input, change the partition count, or add one
  * file and every row's assignment can change. A hash of the row's
  * stable id is a pure per-row expression instead — no shuffle, no
  * RNG state, the same row lands in the same split on any cluster,
  * any partitioning, any engine (the md5 basis mirrors 1:1 into the
  * DuckDB oracle). Whole-stage codegen keeps it inside the scan
  * stage.
  */
object Splits {

  /** Uniform bucket in `[0, n)` from md5(id + salt). 15 hex chars =
    * 60 bits, so the long is always positive and bias from the
    * modulus is < 2^-50.
    */
  def hashBucket(id: Column, salt: String, n: Int): Column = {
    require(n > 0)
    pmod(conv(substring(md5(concat(id.cast("string"), lit("|" + salt))),
      1, 15), 16, 10).cast("long"), lit(n.toLong))
  }

  /** Bucket → named split. `trainPct + valPct` must be <= 100; the
    * remainder is "test".
    */
  def splitName(bucket: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100)
    when(bucket < trainPct, lit("train"))
      .when(bucket < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic stratified keep-filter: retains ~`ratePct`% of rows
    * WITHIN each stratum by hashing `(stratum, id)` — the per-stratum
    * rate is independent of stratum sizes, unlike a global hash gate,
    * and unlike `sampleBy` it is reproducible across engines and
    * repartitionings.
    */
  def stratifiedKeep(id: Column, stratum: Column, salt: String,
      ratePct: Int): Column = {
    require(ratePct >= 0 && ratePct <= 100)
    hashBucket(concat(stratum.cast("string"), lit(":"), id.cast("string")),
      salt, 100) < ratePct
  }

  /** Per-group mixture sampling — the source-mixing-weights step of
    * pre-training data composition: each group keeps its own fraction
    * (e.g. wiki 80%, crawl 10%). The rate table is a driver-side
    * literal folded into one CASE expression, so there is no join and
    * no shuffle — the gate rides inside the scan stage like the other
    * split filters. Groups absent from `ratesPct` fall back to
    * `defaultPct`.
    */
  def mixtureKeep(id: Column, group: Column, salt: String,
      ratesPct: Seq[(String, Int)], defaultPct: Int): Column = {
    require((defaultPct +: ratesPct.map(_._2))
      .forall(r => r >= 0 && r <= 100))
    val rate = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (g, r)) =>
      when(group === g, lit(r)).otherwise(acc)
    }
    hashBucket(concat(group.cast("string"), lit(":"), id.cast("string")),
      salt, 100) < rate
  }
}
