package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` of registry queries to files —
  * the optimization rounds' before/after plan evidence
  * (`plans/r<NN>/<query>_<tag>.txt`).
  *
  * Usage: `runMain graft.PlanDump <outDir> <tag> [q_a,q_b,...]`
  * (no query list = every registry query). Uses the bench's session shape
  * (shuffle partitions = SPARK_GRAFT_CPUS, AQE on) so the dumped plans are
  * the ones the bench executes, modulo AQE re-optimization.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/plans")
    val tag = args.lift(1).getOrElse("before")
    val only: Option[Set[String]] =
      args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
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
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    graft.queries.CvQueries.warm(spark, dir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, dir)
          // execute the plan first (RDD-level action — no result decode) so
          // the dump shows the FINAL adaptive plan with codegen ids, not the
          // pre-AQE skeleton. A failure here is LOGGED (and stamped into
          // the dump): a silent fall-through would pass a pre-AQE skeleton
          // off as an executed-plan dump.
          val executed =
            try { df.queryExecution.executedPlan.execute().count(); true }
            catch { case scala.util.control.NonFatal(e) =>
              println(s"[plandump] $name materialize failed " +
                s"(${e.getClass.getSimpleName}) — dumping INITIAL plan")
              false
            }
          val txt = (if (executed) ""
            else "-- NOTE: materializing action failed; this is the " +
              "INITIAL (pre-AQE) plan, not an executed-plan dump\n") +
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
            txt.getBytes("UTF-8"))
          println(s"[plandump] $name ok (${txt.length} chars)")
        } catch {
          // NonFatal only: an OOM/LinkageError must kill the tool, not
          // continue the loop in a corrupted JVM
          case scala.util.control.NonFatal(e) =>
            println(s"[plandump] $name ERROR ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").take(120)}")
        }
      }
    spark.stop()
  }
}
