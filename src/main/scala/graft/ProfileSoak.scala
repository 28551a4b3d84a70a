package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: standalone sustained-ingest soak with per-window reporting, to
  * distinguish genuine per-batch cost growth (engine aging: manifest,
  * snapshots, driver maps) from co-tenant noise in the bench probe's
  * half-over-half drift number. Prints one line per window: events/s,
  * batches, mean insert ms, mean reap ms.
  */
object ProfileSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val soakSec = sys.env.getOrElse("SPARK_GRAFT_SOAK_SEC", "360").toInt
    val windowSec = sys.env.getOrElse("SPARK_GRAFT_SOAK_WINDOW_SEC", "30").toInt
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

    val root = java.nio.file.Files.createTempDirectory("graft_soakprof").toString
    val eng = new graft.cv.ContViewEngine(spark, root, smallStateBytes = 0L)
    val events = graft.queries.Tables.events(spark, sfDir)
    eng.createStream("sp_stream", events.schema)
    eng.createContView("v_sp",
      """SELECT user_id, count(*) AS n, sum(value) AS sv, avg(value) AS av
        |FROM sp_stream GROUP BY user_id""".stripMargin,
      emitChanges = false)
    eng.createContView("v_sp_ttl",
      """SELECT date_round(ts, '1 day') AS d, count(*) AS n
        |FROM sp_stream GROUP BY date_round(ts, '1 day')""".stripMargin,
      graft.cv.CvPlanner.CvOptions(ttl = Some("365000 days"), ttlColumn = Some("d")),
      emitChanges = false)
    val chunks = 8
    val chunkDfs = (0 until chunks).map { i =>
      events.where(pmod(col("event_id"), lit(chunks)) === i).persist()
    }
    val chunkSizes = chunkDfs.map(_.count())

    def loadavg: String =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .trim.split(" ").take(1).mkString
      catch { case _: Throwable => "?" }

    // synchronous inserts: per-batch latency is directly observable (the
    // async path interleaves batches, hiding which one got slow)
    val t0 = System.nanoTime()
    val deadline = t0 + soakSec * 1_000_000_000L
    var i = 0L
    var winStart = t0
    var winEvents = 0L
    var winBatches = 0
    var winInsertNs = 0L
    var winReapNs = 0L
    var winReaps = 0
    while (System.nanoTime() < deadline) {
      val c = (i % chunks).toInt
      val b0 = System.nanoTime()
      eng.insertInto("sp_stream", chunkDfs(c))
      winInsertNs += System.nanoTime() - b0
      winEvents += chunkSizes(c)
      winBatches += 1
      if (i % 4 == 3) {
        val r0 = System.nanoTime()
        eng.expireTtl("v_sp_ttl")
        winReapNs += System.nanoTime() - r0
        winReaps += 1
      }
      i += 1
      val now = System.nanoTime()
      if (now - winStart >= windowSec * 1_000_000_000L) {
        val sec = (now - winStart) / 1e9
        val reapMs = if (winReaps == 0) 0.0 else winReapNs / 1e6 / winReaps
        println(f"[soak] t=${(now - t0) / 1e9}%5.0f s  ev/s=${winEvents / sec}%8.0f  " +
          f"batches=$winBatches%3d  insert_ms=${winInsertNs / 1e6 / winBatches}%7.1f  " +
          f"reap_ms=$reapMs%6.1f  load=$loadavg")
        winStart = now; winEvents = 0L; winBatches = 0
        winInsertNs = 0L; winReapNs = 0L; winReaps = 0
      }
    }
    chunkDfs.foreach(_.unpersist())
    spark.stop()
  }
}
