package graft
import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q_revenue_nation", "q_sliding_window", "q_doc_stats", "q_topk", "q_limit")) {
      println(s"########## $q")
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      // surface only the scan/join/codegen-relevant lines
      plan.split("\n").filter(l =>
        l.contains("Scan parquet") || l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin") ||
        l.contains("WholeStageCodegen") || l.contains("TakeOrdered")
      ).take(20).foreach(println)
    }
    spark.stop()
  }
}
