package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: steady-state timings of the curation queries at a given SF dir
  * (4 repeats after a warm-up pass, min + max reported).
  */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q_pack_sequences", "q_chunk_docs", "q_semantic_dedup",
      "q_domain_mix", "q_bpe_tokens", "q_curation_funnel")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, dir).count() // warm
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); fn(spark, dir).count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[curation] $n%-20s min=${ts.min}%.3f max=${ts.max}%.3f")
    }
  }
}
