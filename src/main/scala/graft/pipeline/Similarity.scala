package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`Array[Float]`).
  *
  *  - `bruteForceTopK`: exact cosine top-k of a (small, broadcast) query set
  *    against the full corpus — the correctness baseline. Dot products via
  *    the `zip_with`/`aggregate` HOFs: codegen'd, no UDF, no shuffle except
  *    the final per-query top-k.
  *  - `lshTopK`: the scale path — random-hyperplane (sign-LSH) bucketing;
  *    queries only score candidates sharing a bucket, so corpus-side work
  *    drops from O(N·Q) to O(candidates). Same output schema, approximate.
  *  - `embeddingNearDup`: corpus self near-duplicate detection above a
  *    cosine threshold, LSH-bucketed (never all-pairs).
  *
  * At 100 TB the corpus side stays partitioned; only queries/hyperplanes are
  * broadcast. An IVF variant (k-means coarse quantizer) has the same plan
  * shape: assign → co-partition by centroid → per-cell scoring.
  */
object Similarity {

  /** Cosine similarity of two float-array columns (0 when either norm is 0). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (s, x) => s + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (s, x) => s + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0d), (s, x) => s + x))
    when(na === 0 || nb === 0, 0.0d).otherwise(dot / (na * nb))
  }

  /** Exact top-k by cosine: each vector in `queries` (must be small — it is
    * broadcast) against every corpus vector. Ties broken by vec_id for
    * determinism.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val scored = corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"), col("rk"))
  }

  /** Deterministic pseudo-random hyperplanes: component j of plane p is a
    * hash-derived value in [-1, 1]. Generated as a plan-time literal-free
    * expression so corpus and queries use identical planes.
    */
  private def planeComponent(p: Column, j: Column): Column =
    (pmod(xxhash64(p, j), lit(2000001L)) - 1000000L).cast("double") / 1000000.0d

  /** Sign-LSH bucket id: `nPlanes` sign bits of hyperplane dot products. */
  def lshBucket(emb: Column, nPlanes: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(nPlanes - 1)), p =>
        when(aggregate(
          zip_with(emb, sequence(lit(0), size(emb) - 1),
            (x, j) => x * planeComponent(p, j)),
          lit(0.0d), (s, x) => s + x) > 0, lit(1L)).otherwise(lit(0L))),
      lit(0L), (acc, bit) => acc * 2 + bit)

  /** Approximate top-k: score only corpus vectors in the query's bucket
    * (multi-probe = 0 for simplicity; raise nPlanes ↓ recall ↑ speed).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 8): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), nPlanes).as("bucket"))
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"), lshBucket(col("embedding"), nPlanes).as("bucket")))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"), col("rk"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, LSH-bucketed
    * self-join (pairs must agree on the bucket — approximate but linear).
    */
  def embeddingNearDup(corpus: DataFrame, threshold: Double, nPlanes: Int = 6): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), nPlanes).as("bucket"))
    val a = c.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = c.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
