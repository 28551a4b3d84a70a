package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (`Array[Float]` vectors).
  *
  * Baseline: brute-force cosine top-k — probes broadcast against the full
  * corpus, dot products via a whole-stage-codegen'd Catalyst expression
  * (VectorExpressions), no UDFs. At 100 TB the same plan shape holds: the probe set
  * is the broadcast side, the corpus side streams partition-local, and the
  * only shuffle is the final per-probe top-k (tiny: k rows per probe per
  * partition after partial top-k). The scale path (LSH/IVF bucketed) lives
  * in graft.ops.AnnSearch.
  *
  * All arithmetic is done in double precision with left-to-right summation
  * on both engines so the 6-decimal tie-break rounding is stable.
  */
object SimilarityQueries {

  /** Σ aᵢ·bᵢ over two array<double> columns — a codegen'd Catalyst
    * expression (the HOF `aggregate(zip_with(...))` formulation evaluates
    * its lambda interpreted and cost ~10× on these hot paths).
    */
  def dotd(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(a, b)

  def norm2(a: Column): Column = sqrt(dotd(a, a))

  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosineSim(a, b)

  /** Brute-force cosine top-k: probes × corpus, partial top-k per partition
    * via the rank window (Spark pushes a TopK through the window at k rows).
    */
  def bruteForceKnn(s: SparkSession, dir: String, nProbes: Int, k: Int): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probes = emb.where(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val joined = emb.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(
        col("probe_id"), col("vec_id").as("neighbor_id"),
        cosine(col("pv"), col("v")).as("raw_sim"))
    val w = Window.partitionBy("probe_id").orderBy(round(col("raw_sim"), 6).desc, col("neighbor_id"))
    joined.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("probe_id"), col("neighbor_id"), round(col("raw_sim"), 4).as("sim"))
      .orderBy(col("probe_id"), round(col("raw_sim"), 6).desc, col("neighbor_id"))
      .drop("raw_sim")
  }

  val all: Seq[QDef] = Seq(
    // ANN baseline: brute-force cosine top-3 for the first 10 vectors.
    QDef(
      "q_knn_cosine",
      """SELECT probe_id, neighbor_id, sim FROM (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
        |         round(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
        |                                      CAST(c.embedding AS DOUBLE[])), 4) AS sim,
        |         row_number() OVER (
        |           PARTITION BY p.vec_id
        |           ORDER BY round(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
        |                                                 CAST(c.embedding AS DOUBLE[])), 6) DESC,
        |                    c.vec_id) AS rk
        |  FROM embeddings p, embeddings c
        |  WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id) t
        |WHERE rk <= 3 ORDER BY probe_id, sim DESC, neighbor_id""".stripMargin) {
      (s, dir) => bruteForceKnn(s, dir, nProbes = 10, k = 3)
    },

    // Embedding plumbing check: per-label count + mean L2 norm.
    QDef(
      "q_embedding_stats",
      """SELECT label, count(*) AS n,
        |       round(avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                                       CAST(embedding AS DOUBLE[])))), 6) AS avg_norm
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin) {
      (s, dir) =>
        val emb = Tables.embeddings(s, dir)
          .select(col("label"), col("embedding").cast("array<double>").as("v"))
        emb.groupBy("label")
          .agg(count(lit(1)).as("n"), round(avg(norm2(col("v"))), 6).as("avg_norm"))
          .orderBy("label")
    })
}
