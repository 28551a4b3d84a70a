package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cv.{ContViewEngine, CvPlanner}

/** End-to-end continuous-view queries for the driver gate: the events table
  * is replayed through the ingest path in multiple batches (FIXTURES.md §2),
  * then the overlay/combine/output-stream read path produces the result.
  * The DuckDB oracle recomputes the same answer single-shot — asserting the
  * engine's core invariant, incremental-equals-batch.
  */
object CvQueries {

  private val NumChunks = 4

  /** Build a fresh engine over a temp dir, register the events stream, and
    * replay the events table through it in NumChunks deterministic batches.
    */
  private def withReplayedEvents[A](s: SparkSession, dir: String)(
      create: ContViewEngine => A): (ContViewEngine, A) = {
    val root = java.nio.file.Files.createTempDirectory("graft_cvq").toString
    val eng = new ContViewEngine(s, root)
    val events = Tables.events(s, dir)
    eng.createStream("ev_stream", events.schema)
    val created = create(eng)
    (0 until NumChunks).foreach { i =>
      eng.insertInto("ev_stream", events.where(pmod(col("event_id"), lit(NumChunks)) === i))
    }
    (eng, created)
  }

  val all: Seq[QDef] = Seq(
    // cont_count/cont_sum: incremental counts and sums equal a single shot.
    QDef(
      "q_cv_count",
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sv
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        val (eng, _) = withReplayedEvents(s, dir) { e =>
          e.createContView("v_counts",
            "SELECT event_type, count(*) AS n, sum(value) AS sv FROM ev_stream GROUP BY event_type",
            emitChanges = false)
        }
        eng.overlay("v_counts")
          .select(col("event_type"), col("n"), round(col("sv"), 2).as("sv"))
          .orderBy("event_type")
    },

    // user_combine: stored states re-grouped to a coarser key at read time.
    QDef(
      "q_cv_combine",
      """SELECT event_type, count(*) AS n, round(avg(value), 6) AS av,
        |       count(DISTINCT user_id) AS nd
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        val (eng, _) = withReplayedEvents(s, dir) { e =>
          e.createContView("v_by_user",
            """SELECT event_type, user_id AS uid, count(*) AS n, avg(value) AS av,
              |count(DISTINCT user_id) AS nd FROM ev_stream
              |GROUP BY event_type, user_id""".stripMargin,
            emitChanges = false)
        }
        // nd per (type,user) is 0/1-ish; combining to event_type must give
        // the true distinct count because HLL states union losslessly here
        eng.combine("v_by_user", Seq("event_type"))
          .select(col("event_type"), col("n"), round(col("av"), 6).as("av"), col("nd"))
          .orderBy("event_type")
    },

    // cont_sw_count: sliding-window overlay with read-time expiry at the
    // step-bucket granularity; "now" pinned to max(ts) for determinism.
    QDef(
      "q_cv_sliding",
      """SELECT event_type, count(*) AS n FROM events
        |WHERE floor(epoch(ts)/30240)*30240 >
        |      (SELECT epoch(max(ts)) FROM events) - 604800
        |GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        val maxTs = Tables.events(s, dir).agg(max("ts")).collect()(0).getTimestamp(0)
        val (eng, _) = withReplayedEvents(s, dir) { e =>
          e.createContView("v_sw",
            "SELECT event_type, count(*) AS n FROM ev_stream GROUP BY event_type",
            CvPlanner.CvOptions(sw = Some("7 days"), swColumn = "ts"),
            emitChanges = false)
        }
        eng.overlay("v_sw", Some(maxTs)).orderBy("event_type")
    },

    // delta_streams: the output stream's delta states sum back to the input.
    QDef(
      "q_cv_delta_rollup",
      "SELECT count(*) AS total FROM events") {
      (s, dir) =>
        val (eng, _) = withReplayedEvents(s, dir) { e =>
          e.createContView("v_os",
            "SELECT user_id, count(*) AS n FROM ev_stream GROUP BY user_id")
        }
        eng.outputOf("v_os").get.agg(sum(col("delta.n")).as("total"))
    })
}
