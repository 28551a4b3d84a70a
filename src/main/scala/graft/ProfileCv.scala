package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiler for the CV replay used by the bench (dev tool). */
object ProfileCv {
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
    graft.queries.Tables.events(spark, sfDir).count() // warm

    val t0 = System.nanoTime()
    val eng = {
      // mirror CvQueries.engineFor
      val root = java.nio.file.Files.createTempDirectory("graft_cvprof").toString
      val e = new graft.cv.ContViewEngine(spark, root)
      val events = graft.queries.Tables.events(spark, sfDir)
      e.createStream("ev_stream", events.schema)
      e.createContView("v_counts",
        "SELECT event_type, count(*) AS n, sum(value) AS sv FROM ev_stream GROUP BY event_type",
        emitChanges = false)
      e.createContView("v_by_user",
        """SELECT event_type, user_id AS uid, count(*) AS n, avg(value) AS av,
          |count(DISTINCT user_id) AS nd FROM ev_stream
          |GROUP BY event_type, user_id""".stripMargin,
        emitChanges = false)
      e.createContView("v_sw",
        "SELECT event_type, count(*) AS n FROM ev_stream GROUP BY event_type",
        graft.cv.CvPlanner.CvOptions(sw = Some("7 days"), swColumn = "ts"),
        emitChanges = false)
      e.createContView("v_os",
        "SELECT user_id, count(*) AS n FROM ev_stream GROUP BY user_id")
      e.createContView("v_os_rollup",
        s"""SELECT CAST(user_id % 10 AS BIGINT) AS ub, sum(delta.n) AS n
           |FROM ${e.osrelName("v_os")} GROUP BY CAST(user_id % 10 AS BIGINT)""".stripMargin,
        emitChanges = false)
      e.createContView("v_rollup",
        """SELECT event_type, user_id % 10 AS ub,
          |       grouping(event_type)*2 + grouping(user_id % 10) AS gid,
          |       count(*) AS n, sum(value) AS sv
          |FROM ev_stream GROUP BY ROLLUP(event_type, user_id % 10)""".stripMargin,
        emitChanges = false)
      e.createStream("ev_hot", events.schema)
      e.createContTransform("t_hot",
        "SELECT event_id, ts, user_id, event_type, value, props FROM ev_stream WHERE value > 100",
        sinkStream = Some("ev_hot"), emitChanges = false)
      e.createContView("v_hot",
        "SELECT event_type, count(*) AS n FROM ev_hot GROUP BY event_type",
        emitChanges = false)
      val tSetup = (System.nanoTime() - t0) / 1e9
      println(f"[prof] setup  $tSetup%6.2f s")
      (0 until 2).foreach { i =>
        val tc = System.nanoTime()
        val chunk = events.where(pmod(col("event_id"), lit(2)) === i)
        e.insertInto("ev_stream", chunk)
        println(f"[prof] chunk$i ${(System.nanoTime() - tc) / 1e9}%6.2f s")
      }
      e
    }
    println(f"[prof] replay total ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    eng.stats().orderBy(desc("execMs")).show(20, false)
    spark.stop()
  }
}
