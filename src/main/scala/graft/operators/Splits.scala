package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    pmod(hash60(id, salt), lit(n.toLong))
  }

  /** The 60-bit always-positive content hash under [[hashBucket]],
    * exposed directly where a total deterministic priority order is
    * needed rather than a bucket.
    */
  def hash60(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit("|" + salt))),
      1, 15), 16, 10).cast("long")

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

  /** Temperature-flattened source mix — [[mixtureKeep]] with the rate
    * table COMPUTED from corpus composition instead of hand-tuned:
    * each group's keep rate is min(1, scale/√n_g), i.e. sampling
    * probability ∝ n_g^(α-1) at temperature α = 1/2 — big sources are
    * damped toward √n, small sources pass whole, the flattening mT5's
    * α-sampling applies to language shares (Xue et al. 2021,
    * arXiv:2010.11934 §3.1, there over exponent α on language
    * probabilities; fixed α = 1/2 keeps the arithmetic to one sqrt —
    * IEEE-exact, so the rate is bit-identical in any engine).
    *
    * Two scans, no corpus shuffle: pass 1 reduces to one row per
    * group (map-side partial counts); the tiny rate table broadcasts
    * back and the keep test is the same salted-hash compare as every
    * other split gate — against the full 60-bit hash, since computed
    * rates are fractional where mixtureKeep's are integer percent.
    */
  def temperatureMix(docs: DataFrame, idCol: String, groupCol: String,
      salt: String, scale: Double): DataFrame = {
    require(scale > 0)
    val rates = docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol),
        least(lit(1.0), lit(scale) / sqrt(col("__n"))).as("__rate"))
    docs.join(broadcast(rates), Seq(groupCol))
      .filter(hash60(concat(col(groupCol).cast("string"), lit(":"),
          col(idCol).cast("string")), salt).cast("double") <
        col("__rate") * lit((1L << 60).toDouble))
      .drop("__rate")
  }

  /** Deterministic epoch upsampling — the "epochs per domain" step of
    * pre-training data mixing (e.g. wiki 2.5 epochs, crawl 0.8): each
    * row is replicated `floor(factor)` times, plus one more for the
    * hash-chosen `frac(factor)` share of rows, so every group's
    * expected multiplicity is exactly its factor and the realized
    * sample is content-deterministic (reproducible on any
    * partitioning, unlike `sample(withReplacement = true)`).
    * Returns the input columns plus `copy` (0-based replica index).
    *
    * In-row: the repeat count is a literal-folded CASE + one hash
    * compare, the replication a `posexplode` of a repeat array —
    * rides the scan stage, no join, no shuffle. Factors are given in
    * hundredths (250 = 2.5 epochs) to keep the arithmetic integral.
    */
  def epochUpsample(df: DataFrame, idCol: String, groupCol: String,
      salt: String, factorsPct: Seq[(String, Int)],
      defaultPct: Int): DataFrame = {
    require((defaultPct +: factorsPct.map(_._2)).forall(_ >= 0))
    val group = col(groupCol)
    val f = factorsPct.foldLeft(lit(defaultPct)) { case (acc, (g, r)) =>
      when(group === g, lit(r)).otherwise(acc)
    }
    val extra = (hashBucket(
      concat(group.cast("string"), lit(":"), col(idCol).cast("string")),
      salt, 100) < f % 100).cast("int")
    val copies = (f / 100).cast("int") + extra
    df.select(df.columns.map(col) :+
      posexplode(array_repeat(lit(1), copies)).as(Seq("copy", "__one")): _*)
      .drop("__one")
  }

  /** Deterministic global shuffle rank — the training-order
    * assignment step: every row gets its position in the seeded
    * hash-priority order, reproducible on any partitioning (unlike
    * `orderBy(rand(seed))`, whose sample depends on partition
    * layout).
    *
    * Scale shape: a naive `row_number() over (order by hash)` is a
    * single-reducer global sort. Here the 60-bit hash is
    * range-bucketed by its top bits (bucket order IS hash order), the
    * per-bucket counts collapse to a driver-side prefix-offset map
    * (≤ `buckets` entries, a literal in the plan), and each bucket
    * sorts independently — one narrow shuffle, `buckets`-way
    * parallel, position = bucket offset + rank within bucket.
    * (`row_number` is per-bucket, so size `buckets` to keep every
    * bucket under ~2³¹ rows — 1024 buckets covers 2⁴¹ rows.)
    */
  def shuffleRank(docs: DataFrame, idCol: String, salt: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two")
    val shift = 60 - (31 - Integer.numberOfLeadingZeros(buckets))
    val withRk = docs
      .withColumn("__rk", hash60(col(idCol), salt))
      .withColumn("__bkt", shiftright(col("__rk"), shift))
    val counts = withRk.groupBy(col("__bkt")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2)
    val offsetMap = counts.map(_._1).zip(offsets).toMap
    val inBucket = Window.partitionBy(col("__bkt"))
      .orderBy(col("__rk"), col(idCol))
    withRk
      .withColumn("shuffle_pos",
        element_at(typedLit(offsetMap), col("__bkt")) +
          row_number().over(inBucket).cast("long") - 1L)
      .drop("__rk", "__bkt")
  }

  /** Per-group token-budget cap — the "keep N tokens of this source"
    * step of mixture composition. Greedy prefix in deterministic
    * hash-priority order: a row is kept iff the `costCol` sum of all
    * strictly-higher-priority rows of its group is still under
    * `budget`. So each group overshoots by at most one document, the
    * highest-priority document of a group is always kept, and the
    * selection is reproducible on any partitioning or engine.
    *
    * Scale shape: the naive plan is one window sort over every row of
    * a group — a full sort of a 100 TB source to cut it to a 1 TB
    * budget, on ONE reducer per group. Instead the 60-bit hash is
    * range-bucketed by its top bits (`buckets` must be a power of
    * two, so bucket order IS priority order) and per-(group, bucket)
    * cost sums roll up to a `groups × buckets` prefix table — tiny,
    * broadcast — that decides whole buckets: `keep` when its prefix
    * plus its own sum stays strictly under the budget, `drop` when
    * the prefix alone is already over (a total exactly equal to the
    * budget is an `edge` case: a zero-cost bucket tail sits exactly
    * on the boundary there, and the exact window drops it). Only the
    * boundary bucket per group
    * (~1/`buckets` of the group) pays the exact per-row running sum,
    * and the full-keep rows never shuffle at all.
    *
    * Requires `costCol` ≥ 0: the whole-bucket `drop` decision assumes
    * the running sum never decreases (negative costs would diverge
    * from the exact-window semantics).
    */
  def tokenBudgetCap(docs: DataFrame, idCol: String, groupCol: String,
      costCol: String, salt: String, budget: Long,
      buckets: Int = 1024): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two")
    val shift = 60 - (31 - Integer.numberOfLeadingZeros(buckets))
    val withRk = docs
      .withColumn("__rk", hash60(col(idCol), salt))
      .withColumn("__bkt", shiftright(col("__rk"), shift))
    val byBucket = Window.partitionBy(col(groupCol)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val states = withRk.groupBy(col(groupCol), col("__bkt"))
      .agg(sum(col(costCol)).as("__bsum"))
      .withColumn("__before",
        coalesce(sum(col("__bsum")).over(byBucket), lit(0L)))
      // keep must be STRICT (<): when a bucket's cumulative total
      // lands exactly on the budget, a zero-cost row at the bucket
      // tail has strict-prefix sum == budget — the exact window drops
      // it, so the whole-bucket fast path may not keep it. The
      // equality case routes through the exact per-row edge path.
      .withColumn("__state",
        when(col("__before") + col("__bsum") < budget, lit("keep"))
          .when(col("__before") >= budget, lit("drop"))
          .otherwise(lit("edge")))
      .select(col(groupCol), col("__bkt"), col("__state"), col("__before"))
    val tagged = withRk.join(broadcast(states), Seq(groupCol, "__bkt"))
    val inBucket = Window
      .partitionBy(col(groupCol), col("__bkt"))
      .orderBy(col("__rk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val edgeKept = tagged.filter(col("__state") === "edge")
      .withColumn("__cum",
        col("__before") + coalesce(sum(col(costCol)).over(inBucket), lit(0L)))
      .filter(col("__cum") < budget)
      .drop("__cum")
    tagged.filter(col("__state") === "keep")
      .unionByName(edgeKept)
      .select(docs.columns.map(col): _*) // join put the key first; restore
  }

  /** Deterministic contrastive negative sampling (sp11): for each
    * anchor, the k pseudo-random candidates with a DIFFERENT label,
    * chosen by ranking every (anchor, candidate) pair on a 52-bit md5
    * prefix — uniform, seedless-reproducible, and exactly
    * representable in a double, so the bounded-heap top-k
    * ([[Similarity.topKPerQuery]]) and the oracle's `ORDER BY rank,
    * id` agree bit-for-bit (ties, should 52 bits ever collide, break
    * to the smaller id in both).
    *
    * Scale shape: anchors broadcast (a training batch is bounded);
    * the corpus streams once through the label-mismatch nested-loop
    * filter and folds into k-sized per-anchor heaps map-side — no
    * corpus shuffle, no per-anchor window sort. For anchor sets too
    * big to broadcast, bucket both sides by label and join each
    * anchor bucket against the complement buckets instead.
    */
  def contrastiveNegatives(corpus: DataFrame, anchors: DataFrame,
      k: Int, idCol: String = "vec_id",
      labelCol: String = "label"): DataFrame = {
    val a = broadcast(anchors.select(col(idCol).as("q_id"),
      col(labelCol).as("__a_label")))
    val pairs = corpus
      .select(col(idCol).as("n_id"), col(labelCol).as("__label"))
      .join(a, col("__label") =!= col("__a_label"))
      .select(col("q_id"), col("n_id"),
        conv(substring(md5(concat(col("q_id"), lit("_"), col("n_id"))),
          1, 13), 16, 10).cast("long").cast("double").as("rk"))
    Similarity.topKPerQuery(pairs, "rk", scoreAsc = true, k)
  }

  /** Exact-COUNT stratified sample: EXACTLY min(n, |stratum|) rows
    * per stratum, chosen by a deterministic per-row hash priority —
    * the eval/holdout-set construction step where the rate-based gate
    * ([[stratifiedKeep]], sp02) can only promise ~ratePct% in
    * expectation. Returns `(stratum, id, rank)` with rank 1..n in
    * priority order; callers semi-join the corpus on (stratum, id) to
    * materialize full rows.
    *
    * Scale shape: a k-bounded mergeable heap per stratum
    * ([[graft.expressions.TopKAgg]]) aggregates MAP-SIDE, so the
    * exchange carries ≤ |strata| × n (priority, id) pairs per scan
    * partition and the final merge is |strata| tiny heap unions —
    * where the textbook `row_number() OVER (PARTITION BY stratum
    * ORDER BY hash)` window hash-partitions the whole corpus with at
    * most |strata| active reducers. The priority is a 52-bit md5
    * slice, exact in a double (the sp11 discipline), so heap order ≡
    * the oracle's BIGINT `row_number` order; ties — impossible unless
    * 52 bits collide within a stratum — break to the smaller id in
    * both.
    */
  def stratifiedExact(docs: DataFrame, idCol: String,
      stratumCol: String, salt: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // Fail loud on a non-integral id column: the heap payload is the
    // id cast to long, and a string-id corpus would cast to null —
    // TopKAgg skips nulls, silently undersizing every stratum.
    val idType = docs.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long")
        .contains(idType.typeName),
      s"stratifiedExact requires an integral id column; '$idCol' is " +
        s"${idType.typeName} (string ids would cast to null and be " +
        "silently dropped — map them to a long surrogate first)")
    val pr = conv(substring(md5(concat(col(stratumCol).cast("string"),
        lit(":"), col(idCol).cast("string"), lit("|" + salt))),
      1, 13), 16, 10).cast("long").cast("double")
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    val agg = column(graft.expressions.TopKAgg(
      expression(pr), expression(col(idCol).cast("long")), n,
      scoreAsc = true).toAggregateExpression())
    docs.groupBy(col(stratumCol).as("stratum")).agg(agg.as("tk"))
      .select(col("stratum"), posexplode(col("tk")).as(Seq("p", "e")))
      .select(col("stratum"), col("e.id").as("id"),
        (col("p") + 1).as("rank"))
  }

  /** Priority sampling (Duffield–Lund–Thorup, JACM 2007): a
    * weight-proportional size-k sample WITHOUT replacement plus the
    * Horvitz–Thompson per-item estimate `w_hat = max(w, tau)`, whose
    * sum is an unbiased — and among all k-sample schemes, near
    * variance-optimal — estimator of the corpus' total weight.
    * Deterministic here: the uniform draw is the 52-bit md5 slice
    * (the sp11 discipline) so u ∈ (0,1] is exact in a double,
    * priority q = w/u is one correctly-rounded IEEE division, and
    * the oracle's `ORDER BY q DESC, id` agrees bit-for-bit.
    *
    * Scale shape: q rides inside the scan's codegen stage; the only
    * ordering is `orderBy(q).limit(k+1)` = TakeOrderedAndProject —
    * a (k+1)-bounded heap per partition, (k+1) rows per partition on
    * the exchange, never a corpus sort. tau (the (k+1)-th priority)
    * is then a window min over k+1 rows. At 100 TB this is the
    * weighted "pick 10k representative documents + unbiased total
    * token count" primitive; the corpus never shuffles.
    *
    * `weight` must be a non-negative integer column (exact in a
    * double); rows with weight 0 have q = 0 and are never sampled.
    */
  def prioritySample(docs: DataFrame, idCol: String, weight: Column,
      salt: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = conv(substring(md5(concat(col(idCol).cast("string"),
      lit("|" + salt))), 1, 13), 16, 10).cast("long").cast("double")
    // u in (0,1]: (h+1)/2^52 — the +1 dodges the 2^-52 zero-divide
    val u = (h + lit(1.0)) / lit(4503599627370496.0)
    val w = weight.cast("double")
    val topK1 = docs
      .select(col(idCol), w.as("w"), (w / u).as("q"))
      .orderBy(col("q").desc, col(idCol)).limit(k + 1)
    // k+1 rows: one tiny partition by design. The constant partition
    // key must be NON-foldable (ly07's pmod idiom) — a foldable
    // lit(1) is constant-folded out of the windowspec, leaving an
    // empty partitionSpec indistinguishable from a true global window
    // (PlanAuditSpec's suite invariant flags exactly those).
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("q").cast("long"), lit(1L)))
    topK1
      .withColumn("tau", min(col("q")).over(win))
      .filter(col("q") > col("tau"))
      .select(col(idCol), col("w"),
        greatest(col("w"), col("tau")).as("w_hat"))
  }

  /** Sequence packing (sp13) — the concatenate-and-chunk step every
    * LLM pretraining pipeline runs last: documents laid head-to-tail
    * on one token tape in deterministic shuffle order
    * (hash60(id|salt), id — the [[shuffleRank]] order), with training
    * sequence b covering tape positions [b·seqLen, (b+1)·seqLen).
    * Output per doc: `bin` = the sequence its FIRST token lands in,
    * `off` = its offset inside that bin, plus `n_tokens` — enough for
    * a writer to materialize packed sequences (a doc straddles into
    * following bins when off + n_tokens > seqLen: the GPT-style
    * chunking that never pads and never truncates).
    *
    * Scale shape: the tape position is a GLOBAL running token sum,
    * but never a global window (a 100 TB single-task sort). hash60's
    * top bits range-bucket the tape order exactly (bucket order IS
    * tape order — the [[tokenBudgetCap]]/[[shuffleRank]] trick);
    * per-bucket token sums collect to a ≤`buckets`-row driver prefix
    * table broadcast back, and each row's tape position = its
    * bucket's offset + the within-bucket exclusive running sum — the
    * only corpus window is PARTITIONED by bucket. Requires
    * `tokensCol` ≥ 0 and total tokens < 2⁶³.
    */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: Column,
      salt: String, seqLen: Long, buckets: Int = 1024): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two")
    val shift = 60 - (31 - Integer.numberOfLeadingZeros(buckets))
    val withRk = docs
      .select(col(idCol), tokensCol.cast("long").as("n_tokens"))
      .withColumn("__rk", hash60(col(idCol), salt))
      .withColumn("__bkt", shiftright(col("__rk"), shift))
    val sums = withRk.groupBy(col("__bkt"))
      .agg(sum(col("n_tokens")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = sums.scanLeft(0L)(_ + _._2)
    val offsetMap = sums.map(_._1).zip(offsets).toMap
    val inBucket = Window.partitionBy(col("__bkt"))
      .orderBy(col("__rk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withRk
      .withColumn("__tape",
        element_at(typedLit(offsetMap), col("__bkt")) +
          coalesce(sum(col("n_tokens")).over(inBucket), lit(0L)))
      .select(col(idCol), col("n_tokens"),
        expr(s"__tape DIV $seqLen").as("bin"),
        pmod(col("__tape"), lit(seqLen)).as("off"))
  }
}
