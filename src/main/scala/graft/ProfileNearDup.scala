package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiler for the near-dup/ANN bench heavies (dev tool). */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Tables.documents(spark, sfDir).agg(sum(length(col("text")))).collect()

    val names = Seq("q_minhash_neardup", "q_simhash_neardup", "q_ann_lsh", "q_ann_ivf")
    (1 to 3).foreach { round =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        val cnt = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"[prof-nd] r$round $n%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$cnt")
      }
    }
    spark.stop()
  }
}
