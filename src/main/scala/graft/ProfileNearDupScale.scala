package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: near-dup pipelines on an inflated corpus — sf0.1 documents
  * replicated K× with perturbed ids/text — to observe how wall-clock and
  * candidate volume scale with corpus size (the banding design predicts
  * ~linear shuffle volume: bands·K rows per doc, never text).
  */
object ProfileNearDupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "4").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.queries.Tables.documents(spark, sfDir).select("doc_id", "text")
    val n0 = base.count()
    // K copies with distinct ids; copies >0 get a per-copy token prefix so
    // they are NOT trivial duplicates of copy 0 (keeps the pair set from
    // exploding K² per natural near-dup cluster)
    val corpus = (0 until mult).map { i =>
      if (i == 0) base
      else base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        concat(lit(s"c$i q$i "), col("text")).as("text"))
    }.reduce(_ unionByName _).persist()
    val n = corpus.count()
    println(s"[scale] corpus ${n0} -> $n docs (x$mult)")
    for (round <- 1 to 2) {
      var t0 = System.nanoTime()
      val pairs = graft.ops.MinHashLsh.nearDuplicates(corpus, "doc_id", "text", 0.6)
      val nPairs = pairs.count()
      val tMinhash = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val nClusters = graft.ops.DedupClusters.clusterSummary(pairs, "id_a", "id_b").count()
      val tCc = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val nSim = graft.ops.SimHash.nearDuplicates(corpus, "doc_id", "text", 3, blocks = 6).count()
      val tSim = (System.nanoTime() - t0) / 1e9
      println(f"[scale] round$round minhash $tMinhash%6.2f s ($nPairs pairs)  " +
        f"cc $tCc%6.2f s ($nClusters clusters)  simhash $tSim%6.2f s ($nSim pairs)")
    }
    spark.stop()
  }
}
