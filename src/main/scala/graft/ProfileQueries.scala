package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time named registry queries (args) repeatedly under the bench
  * session shape, on an otherwise quiet JVM — separates real plan cost from
  * bench-sweep contention (GC pressure, co-tenant load during the sweep).
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_PROF_REPEATS", "3").toInt
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
    val names = if (args.nonEmpty) args.toSeq else Seq("q_dedup_clusters", "q_minhash_neardup")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name%-24s ${times.map(t => f"$t%6.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
