package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolates the cost anatomy of a single CV ingest (dev tool). */
object ProfileOneCv {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val aqe = !sys.env.contains("SPARK_NO_AQE")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet(); ()
      }
    })
    def time[T](label: String)(f: => T): T = {
      val t = System.nanoTime(); val j0 = jobCount.get(); val r = f
      println(f"[prof] $label%-36s ${(System.nanoTime() - t) / 1e9}%6.2f s  ${jobCount.get() - j0}%3d jobs"); r
    }

    val events = graft.queries.Tables.events(spark, sfDir)
    time("warm: events.count")(events.count())
    val chunk = events.where(pmod(col("event_id"), lit(2)) === 0)

    // floor: bare groupBy-count action on the chunk
    time("bare agg #1")(chunk.groupBy("event_type").count().collect())
    time("bare agg #2")(chunk.groupBy("event_type").count().collect())

    // partial agg via the CV planner (v_counts shape)
    val root = java.nio.file.Files.createTempDirectory("graft_1cv").toString
    val eng = new graft.cv.ContViewEngine(spark, root)
    eng.createStream("ev_one", events.schema)
    val h = eng.createContView("v_one",
      "SELECT event_type, count(*) AS n, sum(value) AS sv FROM ev_one GROUP BY event_type",
      emitChanges = false)
    val withArrival = chunk.withColumn("arrival_timestamp", current_timestamp())
    val partials = h.plan.workerPartials(spark, withArrival)
    time("workerPartials collect #1")(partials.collect())
    time("workerPartials collect #2")(
      h.plan.workerPartials(spark, withArrival).collect())

    // full ingest (fresh store), then incremental ingest
    time("ingest #1 (empty store)")(eng.insertInto("ev_one", chunk))
    time("ingest #2 (merge)")(
      eng.insertInto("ev_one", events.where(pmod(col("event_id"), lit(2)) === 1)))

    // HLL-state CV shape (v_by_user) on its own stream
    eng.createStream("ev_two", events.schema)
    eng.createContView("v_two",
      """SELECT event_type, user_id AS uid, count(*) AS n, avg(value) AS av,
        |count(DISTINCT user_id) AS nd FROM ev_two GROUP BY event_type, user_id""".stripMargin,
      emitChanges = false)
    time("hll-cv ingest #1")(eng.insertInto("ev_two", chunk))
    time("hll-cv ingest #2")(
      eng.insertInto("ev_two", events.where(pmod(col("event_id"), lit(2)) === 1)))

    // decompose the merge-write of a third hll ingest
    val h2 = eng.createContView("v_two",
      """SELECT event_type, user_id AS uid, count(*) AS n, avg(value) AS av,
        |count(DISTINCT user_id) AS nd FROM ev_two GROUP BY event_type, user_id""".stripMargin,
      emitChanges = false) // idempotent re-create returns the handle
    val batch3 = chunk.withColumn("arrival_timestamp", current_timestamp())
    val parts = time("3: partials persist+count") {
      val p = h2.plan.workerPartials(spark, batch3).persist(); p.count(); p
    }
    val existing = time("3: state read count") {
      val ex = h2.store.read().get; ex.count(); ex
    }
    time("3: union+merge agg count") {
      val stateCols = h2.plan.reAggs.map { case (n, a) => a(col(n)).as(n) }
      existing.select(parts.columns.map(col): _*).unionByName(parts)
        .groupBy(h2.plan.stateKeys.map(col): _*)
        .agg(stateCols.head, stateCols.tail: _*)
        .count()
    }
    time("3: merged write (1 task)") {
      val stateCols = h2.plan.reAggs.map { case (n, a) => a(col(n)).as(n) }
      existing.select(parts.columns.map(col): _*).unionByName(parts)
        .groupBy(h2.plan.stateKeys.map(col): _*)
        .agg(stateCols.head, stateCols.tail: _*)
        .repartition(1)
        .write.mode("overwrite").parquet(root + "/_probe")
    }
    spark.stop()
  }
}
