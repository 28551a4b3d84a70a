package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print every registry query's actual non-reused Exchange count
  * (PlanShapeSpec's metric) so the pinned ceilings can be kept tight —
  * slack in a ceiling hides plan regressions up to the slack.
  */
object ProfilePlanCeilings {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p = try fn(spark, dir).queryExecution.executedPlan.toString
        catch { case t: Throwable => s"ERR ${t.getMessage.take(60)}" }
      val count = p.linesIterator.count(l => l.contains("Exchange") && !l.contains("Reused"))
      println(f"[ceil] $name%-26s $count")
    }
    spark.stop()
  }
}
