package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Functions.cosineSim
import graft.functions.VectorExpressions.{dotF, normF}

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two shapes:
  *   - [[bruteForceKnn]]: the exact baseline — broadcast the (bounded)
  *     query batch against the corpus scan, score every vector, rank
  *     per query. One pass over the corpus; correct at any scale in
  *     corpus size, linear cost per query.
  *   - [[ivfKnn]]: the scale path — assign every vector to its nearest
  *     of k fixed centroids (broadcast join against k rows), then
  *     search only the query's own cell. The corpus-side work drops
  *     from |corpus| to |cell| per query; the assignment is one
  *     broadcast pass, amortized across queries (and in a real
  *     pipeline, materialized once).
  *
  * Scoring runs through [[graft.functions.DotProductFloat]], a native
  * Catalyst expression with `doGenCode` (the HOF formulation sits
  * outside whole-stage codegen and allocates a zipped array per pair).
  * The kernel is the same deterministic left-to-right double fold the
  * DuckDB oracle computes, so scores agree bit-for-bit; ranks order by
  * the 6-decimal-rounded score with id tie-breaks, making top-k fully
  * deterministic.
  */
object Similarity {

  /** Cosine similarity rounded to 6 decimals (hash-stable output and
    * deterministic ordering key). */
  def cosRounded(a: Column, b: Column): Column = round(cosineSim(a, b), 6)

  /** Cosine from a pair dot product and PREcomputed per-side norms.
    * Each pair comparison then traverses the arrays once (the dot)
    * instead of three times — at N×M pair scale the norms are the
    * cheap per-row part and the pair loop is the hot path. The norm is
    * the identical fold either way, so scores stay bit-for-bit equal
    * to the inline form (and to the oracle). */
  def cosRoundedPre(a: Column, b: Column, normA: Column, normB: Column): Column =
    round(dotF(a, b) / (normA * normB), 6)

  /** Exact top-k: broadcast `queries` (a bounded query batch by
    * contract) against the corpus; rank per query by rounded cosine
    * desc, id asc. Excludes self-matches. */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      normF(col(vecCol)).as("qnorm"))
    val scored = corpus
      .select(col(idCol), col(vecCol), normF(col(vecCol)).as("__norm"))
      .join(broadcast(q), col(idCol) =!= col("qid"))
      .withColumn("cos_r",
        cosRoundedPre(col("qvec"), col(vecCol), col("qnorm"), col("__norm")))
    val w = Window.partitionBy("qid").orderBy(col("cos_r").desc, col(idCol))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col(idCol), col("rnk"), col("cos_r"))
  }

  /** Assign each vector to its nearest centroid (broadcast join on k
    * fixed centroid rows; ties broken by centroid id). */
  def assignCells(corpus: DataFrame, centroids: DataFrame,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = centroids.select(col(idCol).as("cid"), col(vecCol).as("cvec"),
      normF(col(vecCol)).as("__cnorm"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__ccos").desc, col("cid"))
    corpus.select(col(idCol), col(vecCol), normF(col(vecCol)).as("__norm"))
      .crossJoin(broadcast(c))
      .withColumn("__ccos",
        cosRoundedPre(col(vecCol), col("cvec"), col("__norm"), col("__cnorm")))
      .withColumn("__crnk", row_number().over(w))
      .filter(col("__crnk") === 1)
      .select(col(idCol), col(vecCol), col("cid"))
  }

  /** IVF top-k: score only vectors sharing the query's cell. */
  def ivfKnn(corpus: DataFrame, centroids: DataFrame, queries: DataFrame, k: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cells = assignCells(corpus, centroids, idCol, vecCol)
    // Rename every query-side column: qCells derives from cells, so an
    // unqualified col("cid") on both sides of the join is ambiguous.
    val qCells = cells.join(queries.select(col(idCol)), Seq(idCol), "left_semi")
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"), col("cid").as("qcid"),
        normF(col(vecCol)).as("qnorm"))
    val scored = cells
      .withColumn("__norm", normF(col(vecCol)))
      .join(broadcast(qCells), col("cid") === col("qcid") && col(idCol) =!= col("qid"))
      .withColumn("cos_r",
        cosRoundedPre(col("qvec"), col(vecCol), col("qnorm"), col("__norm")))
    val w = Window.partitionBy("qid").orderBy(col("cos_r").desc, col(idCol))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col(idCol), col("rnk"), col("cos_r"))
  }
}
