package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword scoring over a document corpus — the ranking half of a
  * keyword search engine, shaped for 100 TB.
  *
  * For a FIXED query-term set no inverted index is needed: per-document
  * term frequencies are computed map-side from the token array (one scan,
  * zero shuffles), and the only aggregation is the tiny global-statistics
  * pass (N, avgdl, per-term document frequency — map-side partials into
  * one scalar row). The scoring pass then runs at scan speed with the
  * stats inlined as literals. Two scans of the corpus total; nothing wider
  * than (doc_id, score) ever shuffles.
  *
  * Okapi BM25 (Robertson/Sparck Jones, TREC-3 1994):
  *   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   tfc(t)  = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
  *   score   = Σ_t idf(t)·tfc(t)
  */
object KeywordScore {

  /** Lowercased alphanumeric tokens, empties dropped — the same shape as
    * DuckDB's regexp_split_to_array + list_filter, so oracle SQL can
    * reproduce tokenization exactly.
    */
  def tokenize(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Per-term frequency inside a token array — map-side, no explode. */
  private def tf(toks: Column, term: String): Column =
    size(filter(toks, t => t === term))

  /** BM25 scores for `terms` over `docs`. Returns (idCol, score) for every
    * document matching at least one term; `score` is left unrounded for
    * caller-side presentation control.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 requires at least one query term")
    val toks = tokenize(col(textCol))
    val withTf = docs.select(
      col(idCol) +: size(toks).cast("double").as("dl") +:
        terms.zipWithIndex.map { case (t, i) => tf(toks, t).cast("double").as(s"tf$i") }: _*)

    // Global statistics: one row — N, avgdl, df per term. Map-side partial
    // aggregation makes this a single tiny-result pass at any scale.
    val statsCols = count(lit(1)).cast("double").as("n") +: avg(col("dl")).as("avgdl") +:
      terms.indices.map(i => sum((col(s"tf$i") > 0).cast("double")).as(s"df$i"))
    val statsRow = withTf.agg(statsCols.head, statsCols.tail: _*).collect()(0)
    val n = statsRow.getDouble(0)
    // empty corpus: avg/df come back NULL — nothing can match any term
    if (n == 0.0) return withTf.limit(0).select(col(idCol), lit(0.0).as("score"))
    val avgdl = math.max(statsRow.getDouble(1), 1e-9)
    val idf = terms.indices.map { i =>
      val df = statsRow.getDouble(2 + i)
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }

    val score = terms.indices.map { i =>
      val tfc = col(s"tf$i") * lit(k1 + 1) /
        (col(s"tf$i") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl)))
      lit(idf(i)) * tfc
    }.reduce(_ + _)
    withTf.where(terms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
      .select(col(idCol), score.as("score"))
  }
}
