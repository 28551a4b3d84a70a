package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: scan-tier vs indexed-tier BM25 cost at a given sf dir —
  * the measurement behind the `bm25_*` bench fields. Usage:
  *   runMain graft.ProfileBm25 [sfDir]
  */
object ProfileBm25 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.Tables.documents(spark, dir)
    val terms = Seq("spark", "query", "vector")
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    graft.ops.KeywordScore.bm25(docs, "doc_id", "text", terms).count() // warm
    val scan = (1 to 3).map(_ => t {
      graft.ops.KeywordScore.bm25(docs, "doc_id", "text", terms).count(); ()
    }).sorted.apply(1)
    val idxDir = java.nio.file.Files.createTempDirectory("bm25x").toString
    val build = t(graft.ops.KeywordScore.buildIndex(docs, "doc_id", "text", idxDir))
    graft.ops.KeywordScore.bm25Indexed(spark, idxDir, terms).count() // warm
    val idx = (1 to 3).map(_ => t {
      graft.ops.KeywordScore.bm25Indexed(spark, idxDir, terms).count(); ()
    }).sorted.apply(1)
    graft.ops.KeywordScore.bm25IndexedTopK(spark, idxDir, terms, 20).count() // warm
    val topk = (1 to 3).map(_ => t {
      graft.ops.KeywordScore.bm25IndexedTopK(spark, idxDir, terms, 20)
        .count(); ()
    }).sorted.apply(1)
    // the bench's 50-query batch shape: 3 frequent terms each, scored in
    // one pass, then per-query top-k (multi vs multiTopK isolates the
    // rank step's cost on top of the shared scoring plan)
    val topTerms = spark.read.parquet(s"$idxDir/df")
      .orderBy(org.apache.spark.sql.functions.desc("df"))
      .limit(120).select("term").collect().map(_.getString(0))
    val n = topTerms.length
    val fifty = (0 until 50).map(i =>
      s"q$i" -> Seq(topTerms(i % n), topTerms((i * 7 + 3) % n),
        topTerms((i * 13 + 5) % n)).distinct).toMap
    graft.ops.KeywordScore.bm25IndexedMulti(spark, idxDir, fifty).count() // warm
    val multi = (1 to 3).map(_ => t {
      graft.ops.KeywordScore.bm25IndexedMulti(spark, idxDir, fifty).count(); ()
    }).sorted.apply(1)
    graft.ops.KeywordScore.bm25IndexedMultiTopK(spark, idxDir, fifty, 10)
      .count() // warm
    val multiTopk = (1 to 3).map(_ => t {
      graft.ops.KeywordScore.bm25IndexedMultiTopK(spark, idxDir, fifty, 10)
        .count(); ()
    }).sorted.apply(1)
    // A/B: the r17 window spelling of the same rank step
    import org.apache.spark.sql.functions.{col, row_number}
    def windowTopK() = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query").orderBy(col("score").desc, col("doc_id"))
      graft.ops.KeywordScore.bm25IndexedMulti(spark, idxDir, fifty)
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= 10).drop("__rn")
    }
    windowTopK().count() // warm
    val multiTopkWin = (1 to 3).map(_ => t { windowTopK().count(); () })
      .sorted.apply(1)
    val (ra, rb, dfm) = graft.ops.KeywordScore.lastTopKScan
    println(f"RESULT scan=$scan%.3f build=$build%.3f indexed=$idx%.3f " +
      f"topk=$topk%.3f speedup=${scan / idx}%.2fx " +
      f"topk_vs_indexed=${idx / topk}%.2fx " +
      f"topk_scan=$ra%d+$rb%d/$dfm%d " +
      f"multi50=$multi%.3f multi50_topk=$multiTopk%.3f " +
      f"multi50_topk_window=$multiTopkWin%.3f")
    spark.stop()
  }
}
