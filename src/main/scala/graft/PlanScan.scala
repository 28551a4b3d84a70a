package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump join/exchange/scan characteristics of every registry
  * query's physical plan (pre-AQE) — feeds the PlanShapeSpec whitelist.
  */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val tags = Seq(
          "CartesianProduct" -> "CARTESIAN",
          "BroadcastNestedLoopJoin" -> "BNLJ",
          "SortMergeJoin" -> "SMJ",
          "BroadcastHashJoin" -> "BHJ",
          "ShuffledHashJoin" -> "SHJ"
        ).collect { case (pat, tag) if plan.contains(pat) =>
          s"$tag=${plan.sliding(pat.length).count(_ == pat)}"
        }
        val exchanges = plan.linesIterator.count(l => l.contains("Exchange") && !l.contains("Reused"))
        println(f"$name%-26s exch=$exchanges ${tags.mkString(" ")}")
      } catch {
        case e: Throwable => println(f"$name%-26s ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
