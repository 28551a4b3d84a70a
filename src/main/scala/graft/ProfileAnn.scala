package graft

import org.apache.spark.sql.SparkSession

/** Cold-vs-warm cost split for the ANN bench queries (dev tool). */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Any): Unit = {
      val t = System.nanoTime(); f
      println(f"[prof] $label%-22s ${(System.nanoTime() - t) / 1e9}%6.2f s")
    }
    graft.queries.Tables.lineitem(spark, sfDir).count()
    val qs = SparkEntry.queries
    time("ann_ivf cold")(qs("q_ann_ivf")(spark, sfDir).count())
    time("ann_ivf warm")(qs("q_ann_ivf")(spark, sfDir).count())
    time("ann_lsh cold")(qs("q_ann_lsh")(spark, sfDir).count())
    time("ann_lsh warm")(qs("q_ann_lsh")(spark, sfDir).count())
    time("cosine_nd cold")(qs("q_cosine_neardup")(spark, sfDir).count())
    time("cosine_nd warm")(qs("q_cosine_neardup")(spark, sfDir).count())
    spark.stop()
  }
}
