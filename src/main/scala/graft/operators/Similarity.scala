package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — the queries side is broadcast,
  * so the big corpus never shuffles; cost is one scan × |queries|.
  * Scale path: random-hyperplane LSH bucketing — corpus and queries
  * are bucketed by sign-pattern, the join is bucket-local, and recall
  * is tuned with the number of planes / probe multipliers.
  *
  * All arithmetic is done in float64 with sequential `aggregate` so
  * results are bit-deterministic and engine-portable.
  */
object Similarity {

  /** Sequential-order float64 dot product of two float-array columns.
    * `aggregate` evaluates left-to-right, giving the same IEEE result
    * on every engine (reassociation-free).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force exact top-k cosine neighbors for each query vector.
    *
    * @param corpus  (id, vec) big side — scanned once, never shuffled
    * @param queries (id, vec) small side — broadcast
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec")))
    val scored = corpus
      .select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .join(q, col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        cosine(col("q_vec"), col("n_vec")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rn"))
  }

  /** Sign-pattern bucket id from `planes` fixed hyperplanes.
    * Hyperplanes are generated from a seeded RNG on the driver —
    * deterministic, shipped in the plan as literals.
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val d = aggregate(
        zip_with(vec, typedLit(p.toSeq), (x, h) => x.cast("double") * h),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  def randomPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Approximate top-k: bucket corpus and queries with `numPlanes`
    * random hyperplanes, rank within the query's bucket only. The
    * join is an equi-join on bucket — shuffle-partitionable, no
    * all-pairs blowup. Recall/cost trade-off via numPlanes.
    */
  def lshKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val planes = randomPlanes(numPlanes, dim, seed)
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"),
      lshBucket(col(vecCol), planes).as("bucket")))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        cosine(col("q_vec"), col("n_vec")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rn"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold,
    * LSH-bucketed so the self-join is bucket-local.
    */
  def cosineDupPairs(corpus: DataFrame, threshold: Double,
                     numPlanes: Int = 6, dim: Int = 64, seed: Long = 42L,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val planes = randomPlanes(numPlanes, dim, seed)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      lshBucket(col(vecCol), planes).as("bucket"))
    c.as("x").join(c.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        cosine(col("x.vec"), col("y.vec")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
