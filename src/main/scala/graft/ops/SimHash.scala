package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import graft.sketch.Hashing

/** SimHash near-duplicate detection: 64-bit fingerprints whose Hamming
  * distance tracks cosine similarity of the token multiset (Charikar's
  * scheme). Near-dup search partitions the fingerprint into 4×16-bit
  * chunks — any pair within Hamming distance ≤3 must agree on at least one
  * chunk (pigeonhole), so the candidate join is an equi-join on
  * (chunk index, chunk value): shuffle on 4 small keys per doc, never a
  * cross join. Verification = popcount of xor (codegen'd bit_count).
  */
object SimHash {

  /** simhash64(tokens_array) → long fingerprint. */
  case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
    override def prettyName: String = "simhash64"
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val acc = new Array[Int](64)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val h = Hashing.hash64(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
        i += 1
      }
      var fp = 0L
      var b = 0
      while (b < 64) {
        if (acc(b) > 0) fp |= (1L << b)
        b += 1
      }
      fp
    }
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  }

  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))

  /** Pairs with Hamming distance ≤ maxDist (requires maxDist ≤ 3 for the
    * 4-chunk pigeonhole to guarantee recall 1.0).
    *
    * Skew guard (AnnSearch.cosineNearDuplicates pattern): short/empty
    * documents all hash to the same fingerprint (often 0), so a crawl with
    * millions of near-empty docs lands them in the SAME four chunk buckets
    * — an O(s²) self-join blowup. Singleton buckets are dropped via a
    * broadcast hot-set. The bucket-size cap is OPT-IN (default unbounded):
    * capping trades the documented recall-1.0 pigeonhole guarantee for
    * bounded join fan-out, so callers must choose it explicitly; an
    * excluded bucket is reported on stderr, and its members still pair
    * through their other chunks unless oversized in all four.
    */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(maxDist <= 3, "4-chunk banding guarantees recall only for distance ≤ 3")
    val fp = df.select(col(idCol).as("id"),
      simhash64(TextOps.tokens(col(textCol))).as("fp"))

    val chunked = fp.select(col("id"), col("fp"),
        posexplode(array((0 until 4).map(i =>
          shiftright(col("fp"), i * 16).bitwiseAND(lit(0xffffL))): _*)))
      .select(col("id"), col("fp"), col("pos").as("chunk"), col("col").as("cval"))
      .persist() // bucket-count pass + both sides of the pair join

    val counts = chunked.groupBy("chunk", "cval").agg(count(lit(1)).as("cnt"))
    val oversized = counts.where(col("cnt") > maxBucketSize)
      .orderBy(col("cnt").desc).limit(20).collect()
    if (oversized.nonEmpty)
      System.err.println(s"[graft] SimHash.nearDuplicates: ${oversized.length}+ " +
        s"chunk bucket(s) over maxBucketSize=$maxBucketSize excluded from " +
        s"candidate generation (largest=${oversized.head.getLong(2)}); raise " +
        "maxBucketSize to trade wall-clock for completeness")
    val hot = counts.where(col("cnt") > 1 && col("cnt") <= maxBucketSize)
      .select("chunk", "cval")
    val survivors = chunked.join(broadcast(hot), Seq("chunk", "cval"))

    val l = survivors.alias("l")
    val r = survivors.alias("r")
    val pairs = l.join(r,
        col("l.chunk") === col("r.chunk") &&
        col("l.cval") === col("r.cval") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.fp").bitwiseXOR(col("r.fp"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
    // materialize the (small) verified pair set and release the chunk
    // explosion — a df.persist() entry would otherwise live in the session
    // CacheManager forever (localCheckpoint blocks are GC-cleaned)
    val out = pairs.localCheckpoint(true)
    chunked.unpersist()
    out
  }
}
