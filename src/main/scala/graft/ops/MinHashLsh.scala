package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import graft.sketch.Hashing

/** MinHash + banded LSH near-duplicate detection at corpus scale.
  *
  * Pipeline (all relational — one shuffle per stage, no driver loops):
  *   1. signature: per doc, k minhash values over word-shingle hashes
  *      (one pass over shingles per doc; k seeds via the 2-universal trick
  *      h_i(x) = a_i·x + b_i from one base murmur hash),
  *   2. banding: signature split into bands of r rows; hash each band →
  *      (band, bucket) keys; docs sharing any band-bucket are candidates
  *      — a self-equi-join on the bucket key (shuffle on bucket; skew-safe
  *      because buckets are ~uniform under hashing),
  *   3. verify: exact Jaccard on shingle sets for candidate pairs only.
  *
  * At 100 TB: stage 1 is map-only; stage 2's join shuffles only
  * (docId, band, bucket) triples — 16 rows per doc, not the text; stage 3
  * re-joins text for the (rare) candidates. numBands × rowsPerBand tunes
  * the recall/candidate-volume S-curve: P(candidate) = 1-(1-j^r)^b.
  */
object MinHashLsh {

  /** minhash_signature(shingles_array) → array<long> of k minima. */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def prettyName: String = "minhash_signature"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val mins = Array.fill(k)(Long.MaxValue)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val s = arr.getUTF8String(i)
        val h = Hashing.murmur128(s.getBytes)
        // k derived hashes from one 128-bit hash (Kirsch–Mitzenmacher)
        var j = 0
        while (j < k) {
          val hj = h.h1 + (j + 1).toLong * h.h2
          if (hj < mins(j)) mins(j) = hj
          j += 1
        }
        i += 1
      }
      new GenericArrayData(mins.toArray[Any])
    }
    override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
  }

  def minhashSignature(shingles: Column, k: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(shingles), k))

  /** Candidate pairs (idA < idB) via banded LSH over `df(idCol, textCol)`,
    * prefiltered by minhash agreement: the fraction of equal signature
    * components estimates Jaccard, and P(est < 0.3 | j ≥ 0.6) ≤
    * exp(-2k·0.09) ≈ 1e-10 at k=128 — so the (expensive) exact shingle
    * verify only ever sees near-real pairs, while random band collisions
    * (est ≈ 0.05) die on cheap long comparisons.
    */
  def candidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numBands: Int = 64, rowsPerBand: Int = 2): DataFrame = {
    val k = numBands * rowsPerBand
    val sig = df.select(
      col(idCol).as("id"),
      minhashSignature(TextOps.shingles(col(textCol), shingleN), k).as("sig"))
      .persist()

    // band b covers sig[b*r .. b*r+r-1]; bucket = hash of the band slice
    val banded = sig.select(
      col("id"),
      posexplode(
        transform(
          sequence(lit(0), lit(numBands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
      .persist() // both sides of the self-join read this

    val l = banded.alias("l")
    val r = banded.alias("r")
    val rawPairs = l.join(r,
        col("l.band") === col("r.band") &&
        col("l.bucket") === col("r.bucket") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()

    val agree = size(filter(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => (x === y).cast("int")),
      e => e === 1)).cast("double") / k
    rawPairs
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .where(agree >= 0.3)
      .select(col("id_a"), col("id_b"))
  }

  /** Full near-dup pipeline: LSH candidates verified with exact Jaccard. */
  def nearDuplicates(
      df: DataFrame, idCol: String, textCol: String, threshold: Double,
      shingleN: Int = 3, numBands: Int = 64, rowsPerBand: Int = 2): DataFrame = {
    val pairs = candidatePairs(df, idCol, textCol, shingleN, numBands, rowsPerBand)
    // shingle arrays feed both sides of the verify join — compute once
    val sh = df.select(col(idCol).as("id"), TextOps.shingles(col(textCol), shingleN).as("sh"))
      .persist()
    pairs
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        TextOps.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
