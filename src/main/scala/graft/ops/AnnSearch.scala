package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.SimilarityQueries.{cosine, dotd}

/** Approximate nearest neighbor over embedding columns.
  *
  * Scale path: signed-random-projection LSH — L independent tables, each
  * hashing a vector to a B-bit bucket via sign(v·rᵢ) with deterministic
  * pseudo-random hyperplanes (seeded; identical across executors with no
  * broadcast of plane matrices — they are literal arrays in the plan).
  * Query joins probe buckets to corpus buckets (equi-join on (table,
  * bucket)) and ranks candidates by exact cosine — the full corpus is never
  * cross-joined. Brute force (SimilarityQueries.bruteForceKnn) remains the
  * small-probe-set / oracle baseline.
  */
object AnnSearch {

  /** Deterministic unit-free hyperplanes: dim values per (table, bit). */
  private def planes(dim: Int, numTables: Int, bitsPerTable: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numTables, bitsPerTable)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Bucket id of a vector column for one table: B sign bits packed. */
  private def bucketExpr(v: Column, tablePlanes: Array[Array[Double]]): Column =
    tablePlanes.zipWithIndex.map { case (plane, bit) =>
      val planeCol = array(plane.map(lit): _*)
      when(dotd(v, planeCol) >= 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH top-k: for each probe (vec_id < nProbes), k nearest by cosine among
    * LSH candidates.
    */
  def lshKnn(emb: DataFrame, dim: Int, nProbes: Int, k: Int,
      numTables: Int = 8, bitsPerTable: Int = 12, seed: Long = 42L): DataFrame = {
    val ps = planes(dim, numTables, bitsPerTable, seed)

    def bucketed(df: DataFrame, idName: String, vName: String): DataFrame =
      df.select(
        col(idName), col(vName),
        posexplode(array(ps.map(tp => bucketExpr(col(vName), tp)): _*)))
        .select(col(idName), col(vName), col("pos").as("tbl"), col("col").as("bkt"))

    val corpus = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probes = corpus.where(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))

    val corpusB = bucketed(corpus, "vec_id", "v")
    val probesB = bucketed(probes, "probe_id", "pv")

    val cands = probesB.join(corpusB,
        probesB("tbl") === corpusB("tbl") && probesB("bkt") === corpusB("bkt") &&
        col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("pv"), col("vec_id").as("neighbor_id"), col("v"))
      .dropDuplicates("probe_id", "neighbor_id")

    val scored = cands.select(
      col("probe_id"), col("neighbor_id"),
      cosine(col("pv"), col("v")).as("raw_sim"))
    val w = Window.partitionBy("probe_id")
      .orderBy(round(col("raw_sim"), 6).desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("probe_id"), col("neighbor_id"), round(col("raw_sim"), 4).as("sim"),
        col("rk").cast("long").as("rk"))
      .orderBy("probe_id", "rk")
  }
}
