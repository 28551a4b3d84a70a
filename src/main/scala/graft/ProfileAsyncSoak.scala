package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the bench's sustained-ingest soak section in isolation —
  * measures the async-path throughput (and the effect of queue coalescing)
  * without paying for the full query sweep.
  */
object ProfileAsyncSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val soakSec = sys.env.getOrElse("SPARK_GRAFT_SOAK_SEC", "45").toDouble
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_asoak").toString
    val eng = new graft.cv.ContViewEngine(spark, root, smallStateBytes = 0L)
    val events = graft.queries.Tables.events(spark, sfDir)
    eng.createStream("sk_stream", events.schema)
    eng.createContView("v_sk",
      """SELECT user_id, count(*) AS n, sum(value) AS sv, avg(value) AS av
        |FROM sk_stream GROUP BY user_id""".stripMargin,
      emitChanges = false)
    eng.createContView("v_sk_ttl",
      """SELECT date_round(ts, '1 day') AS d, count(*) AS n
        |FROM sk_stream GROUP BY date_round(ts, '1 day')""".stripMargin,
      graft.cv.CvPlanner.CvOptions(ttl = Some("365000 days"), ttlColumn = Some("d")),
      emitChanges = false)
    val chunks = 8
    val chunkDfs = (0 until chunks).map { i =>
      events.where(pmod(col("event_id"), lit(chunks)) === i).persist()
    }
    val chunkSizes = chunkDfs.map(_.count())
    var sent = 0L
    var i = 0L
    val t0 = System.nanoTime()
    val deadline = t0 + (soakSec * 1e9).toLong
    while (System.nanoTime() < deadline) {
      val c = (i % chunks).toInt
      eng.insertIntoAsync("sk_stream", chunkDfs(c))
      sent += chunkSizes(c)
      if (i % 4 == 3) eng.expireTtl("v_sk_ttl")
      i += 1
    }
    eng.flush()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[asoak] ${sent / sec}%.0f ev/s over $sec%.1f s ($i batches enqueued, ${sent} events)")
    spark.stop()
  }
}
