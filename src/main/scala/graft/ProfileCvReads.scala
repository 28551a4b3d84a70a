package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: isolates the per-read cost of every q_cv_* registry query
  * under the exact bench session shape, printing each iteration separately
  * so fixed driver-side overhead (analysis, engine-lock contention) is
  * distinguishable from execution-time growth.
  */
object ProfileCvReads {
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

    val tWarm = System.nanoTime()
    graft.queries.CvQueries.warm(spark, sfDir)
    println(f"[prof] warm() ${(System.nanoTime() - tWarm) / 1e9}%6.2f s")

    val cvQueries = SparkEntry.queries.toSeq.filter(_._1.startsWith("q_cv_")).sortBy(_._1)
    cvQueries.foreach { case (name, fn) =>
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        // split plan-build (driver-side: engine lock, analysis) from execution
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val s = times.map { case (b, e) => f"build $b%5.3f exec $e%5.3f" }.mkString(" | ")
      println(f"[prof] $name%-24s $s")
    }
    spark.stop()
  }
}
