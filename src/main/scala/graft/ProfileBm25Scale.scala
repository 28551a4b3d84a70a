package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-corpus evidence for the impact-pruned top-k (round 18 — the r17
  * verdict's stretch: "measure the pruned top-k at a scale where it must
  * win big; the 100× claim should ride measured row-group skip rates").
  * Synthesizes N docs (default 1.5M, ~30 tokens each ≈ 45M postings —
  * two orders past sf0.1's corpus) with a SKEWED vocabulary (token id =
  * floor(V·u⁴): head tokens hit most docs, the tail is rare — the df
  * shape real text has), builds the index, then measures per-query:
  * full indexed scoring vs the pruned top-k, with the rows each pruned
  * phase COLLECTED vs the matching postings full scoring reads.
  *
  *   runMain graft.ProfileBm25Scale [nDocs] [k]
  */
object ProfileBm25Scale {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1500000L)
    val k = args.lift(1).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vocab = 200000L
    // token j of doc i: u = unit-hash, id = floor(V·u⁴) — head-heavy df
    def tok(j: Int) = {
      val u = pmod(xxhash64(col("id") * lit(31L) + lit(j)), lit(1000000L))
        .cast("double") / lit(1000000.0)
      concat(lit("w"), floor(pow(u, 4.0) * vocab).cast("long").cast("string"))
    }
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 30).map(tok): _*).as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25big").toString
    val t0 = System.nanoTime()
    graft.ops.KeywordScore.buildIndex(docs, "doc_id", "text", dir)
    val buildSec = (System.nanoTime() - t0) / 1e9
    // query terms at three df strata, read off the built df table
    val byDf = spark.read.parquet(s"$dir/df")
      .orderBy(desc("df")).select("term", "df")
      .limit(5000).collect()
    val terms = Seq(byDf(20), byDf(400), byDf(4000))
      .map(r => (r.getString(0), r.getDouble(1)))
    println(f"[bm25-scale] nDocs=$nDocs%d build=$buildSec%.1f s " +
      s"terms=${terms.map { case (t, d) => s"$t(df=${d.toLong})" }.mkString(",")}")
    def med3(f: => Unit): Double = (0 until 3).map { _ =>
      val s0 = System.nanoTime(); f; (System.nanoTime() - s0) / 1e9
    }.sorted.apply(1)
    val ts = terms.map(_._1)
    graft.ops.KeywordScore.bm25Indexed(spark, dir, ts).count() // warm
    val full = med3 {
      graft.ops.KeywordScore.bm25Indexed(spark, dir, ts).count(); ()
    }
    graft.ops.KeywordScore.bm25IndexedTopK(spark, dir, ts, k).count() // warm
    val topk = med3 {
      graft.ops.KeywordScore.bm25IndexedTopK(spark, dir, ts, k).count(); ()
    }
    val (ra, rb, df) = graft.ops.KeywordScore.lastTopKScan
    println(f"[bm25-scale] RESULT full=$full%.3f s topk=$topk%.3f s " +
      f"(${full / topk}%.2fx) path=${graft.ops.KeywordScore.lastTopKPath}%s " +
      f"phaseA=$ra%d phaseB=$rb%d matching=$df%d " +
      f"scanned=${100.0 * (ra + rb) / math.max(df, 1L)}%.1f%%")
    // batch tier at corpus scale (round 19): 50 frequent-term queries,
    // per-query top-k — the bounded BottomK aggregate rank vs the r17
    // window spelling (PERF_NOTES §37's trade, now measured at 45M
    // postings where the window's one-task-per-query sort should start
    // paying)
    val fifty = (0 until 50).map(i =>
      s"q$i" -> Seq(byDf(i % 120).getString(0),
        byDf((i * 7 + 3) % 120).getString(0),
        byDf((i * 13 + 5) % 120).getString(0)).distinct).toMap
    def multiOnce(): Long =
      graft.ops.KeywordScore.bm25IndexedMultiTopK(spark, dir, fifty, 10)
        .count()
    import org.apache.spark.sql.functions.{col, row_number}
    def windowOnce(): Long = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query").orderBy(col("score").desc, col("doc_id"))
      graft.ops.KeywordScore.bm25IndexedMulti(spark, dir, fifty)
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= 10).count()
    }
    val rowsAgg = multiOnce() // warm + row count
    val aggSec = med3 { multiOnce(); () }
    val rowsWin = windowOnce()
    val winSec = med3 { windowOnce(); () }
    println(f"[bm25-scale] MULTI50 topk agg=$aggSec%.3f s " +
      f"window=$winSec%.3f s (${winSec / aggSec}%.2fx) " +
      f"rows=$rowsAgg%d/$rowsWin%d (must be equal)")
    graft.io.LocalStoreFs.deleteRecursively(dir)
    spark.stop()
  }
}
