package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the dedup/similarity operators — pure Column
  * compositions (codegen'd, no UDFs): whitespace tokenization, word
  * n-gram shingling, exact Jaccard.
  */
object TextOps {

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Distinct word n-gram shingles (1-based element_at). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - (n - 1), lit(0))),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
  }

  /** Exact Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - size(array_intersect(a, b))
    when(union > 0, inter / union).otherwise(lit(0.0))
  }
}
