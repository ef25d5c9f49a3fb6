package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`), for near-dup detection and retrieval in training-data
 * pipelines.
 *
 * Two paths:
 *  - [[bruteForceTopK]] — exact cosine top-k. The query side is broadcast;
 *    the corpus streams through one codegen'd projection (zip_with +
 *    aggregate fold), so cost is O(|corpus| * |queries|) FLOPs with NO
 *    shuffle of the corpus. Right answer for |queries| * dim small enough
 *    to broadcast (the usual case: a batch of probe vectors).
 *  - [[lshTopK]] — random-hyperplane LSH: bucket by sign-bit signature
 *    prefix, search only within colliding buckets. Sub-linear at scale;
 *    recall measured against brute force in `SimilaritySpec`.
 */
object Similarity {

  /** Cosine similarity between two array<float/double> columns (index-order fold). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot / (sqrt(na) * sqrt(nb))
  }

  /**
   * Exact top-k: for each query vector, the k most cosine-similar corpus
   * vectors (excluding self-matches by id). Queries are broadcast — the
   * join is a BroadcastNestedLoopJoin over a codegen'd cosine projection.
   */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"), round(col("sim"), 6).as("sim"))
  }

  /**
   * Embedding-cosine near-duplicate pairs: all (a, b), a < b, with
   * cosine >= threshold. Exact all-pairs form (the LSH-bucketed path in
   * [[lshTopK]] is the sub-linear variant at scale); the self-join
   * broadcasts the smaller projection side.
   */
  def nearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val l = corpus.select(col(idCol).as("a"), col(vecCol).as("_va"))
    val r = corpus.select(col(idCol).as("b"), col(vecCol).as("_vb"))
    l.join(r, col("a") < col("b"))
      .withColumn("sim", cosine(col("_va"), col("_vb")))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), round(col("sim"), 6).as("sim"))
  }

  /** Deterministic pseudo-random hyperplane component for (seed, plane, dim). */
  private def planeComponent(plane: Int, dim: Column, seed: Long): Column = {
    // xxhash64 of (plane, dim, seed) mapped to [-1, 1)
    (xxhash64(lit(plane), dim, lit(seed)).cast("double") / lit(Long.MaxValue.toDouble))
  }

  /**
   * Random-hyperplane signature: `bits` sign bits packed into a long.
   * Pure column arithmetic (explodes dims internally via aggregate).
   */
  def hyperplaneSignature(vec: Column, bits: Int, seed: Long): Column = {
    val sigBits = (0 until bits).map { p =>
      val dotExpr = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i, seed)),
        lit(0.0), (acc, v) => acc + v)
      when(dotExpr >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    sigBits.reduce((a, b) => a.bitwiseOR(b))
  }

  /**
   * LSH ANN: bucket corpus and queries by multiple independent signature
   * bands; candidates = bucket collisions; exact cosine re-rank within
   * candidates. `tables` independent hash tables trade memory for recall.
   */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, bitsPerTable: Int = 12, tables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, as: String) = df.select(
      col(idCol).as(as), col(vecCol).as(s"_v_$as"),
      posexplode(array((0 until tables).map(t =>
        hyperplaneSignature(col(vecCol), bitsPerTable, t * 7919L + 13L)): _*))
        .as(Seq("table", "bucket")))
    val c = bucketed(corpus, "neighbor_id")
    val q = bucketed(queries, "query_id")
    val cands = q.join(c, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("_v_query_id"), col("_v_neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", cosine(col("_v_query_id"), col("_v_neighbor_id")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    cands.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"), round(col("sim"), 6).as("sim"))
  }
}
