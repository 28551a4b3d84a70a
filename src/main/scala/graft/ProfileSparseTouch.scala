package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-batch merge cost under TIME-ORDERED arrival into a
  * day-bucketed CV at forced-large state — the sparse-touch regime where
  * each micro-batch lands in a handful of the matrel's buckets. This is
  * the workload where the bucket-pruned read path (vs scanning the whole
  * state through a cold cache — PERF_NOTES §5b) pays: per-batch merge
  * cost should track the TOUCHED bucket count, not total state size.
  */
object ProfileSparseTouch {
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
    val root = java.nio.file.Files.createTempDirectory("graft_sparse").toString
    val eng = new graft.cv.ContViewEngine(spark, root, smallStateBytes = 0L)
    eng.createStream("sp_stream", events.schema)
    // (day, user) grain: thousands of groups per day, state spread over
    // every hash bucket, but a time-ordered batch only touches the buckets
    // its one-or-two days hash into per bucket column? — no: buckets key on
    // the GROUP hash, so a day's groups spread across all buckets. To make
    // touch-sparsity real the group key must be the day itself.
    eng.createContView("v_sp",
      """SELECT date_round(ts, '1 day') AS d, count(*) AS n, sum(value) AS sv,
        |       avg(value) AS av FROM sp_stream GROUP BY date_round(ts, '1 day')""".stripMargin,
      emitChanges = false)
    // time-ordered replay: ntile over ts → each chunk covers a contiguous
    // time slice touching only its few day-groups (and so few buckets)
    val w = org.apache.spark.sql.expressions.Window.orderBy("ts")
    val chunks = 10
    val sliced = events.withColumn("__slice", ntile(chunks).over(w)).persist()
    sliced.count()
    (1 to chunks).foreach { i =>
      val chunk = sliced.where(col("__slice") === i).drop("__slice").persist()
      chunk.count()
      val t0 = System.nanoTime()
      try eng.insertInto("sp_stream", chunk) finally chunk.unpersist()
      println(f"[sparse] chunk$i%-3d ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    sliced.unpersist()
    spark.stop()
  }
}
