package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileLarge {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = graft.queries.Tables.events(spark, sfDir)
    events.count()
    val root = java.nio.file.Files.createTempDirectory("graft_lg").toString
    val eng = new graft.cv.ContViewEngine(spark, root, smallStateBytes = 0L)
    eng.createStream("lg_stream", events.schema)
    eng.createContView("v_lg",
      """SELECT user_id, count(*) AS n, sum(value) AS sv, avg(value) AS av
        |FROM lg_stream GROUP BY user_id""".stripMargin, emitChanges = false)
    (0 until 4).foreach { i =>
      val chunk = events.where(pmod(col("event_id"), lit(4)) === i).persist()
      val t0 = System.nanoTime()
      try eng.insertInto("lg_stream", chunk) finally chunk.unpersist()
      println(f"[prof] chunk$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
