package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{MinHashLsh, TextOps}

/** Dev tool: stage-by-stage timing of the minhash near-dup pipeline at the
  * bench corpus, to locate where q_minhash_neardup's wall time goes.
  */
object ProfileMinhash {
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

    def corpus() = {
      val d = graft.queries.Tables.documents(spark, sfDir).select("doc_id", "text")
      d.unionByName(
        d.where(pmod(col("doc_id"), lit(2)) === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), lit(" zz yy")).as("text")))
    }
    def t(label: String)(f: => Any): Unit = {
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        f
        println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      }
    }
    t("corpus.count")(corpus().count())
    t("shingles.count") {
      corpus().select(TextOps.shingles(col("text"), 3).as("sh"))
        .where(size(col("sh")) > 0).count()
    }
    t("signature.agg") {
      corpus().select(MinHashLsh.minhashSignature(
          TextOps.shingles(col("text"), 3), 128).as("sig"))
        .agg(avg(element_at(col("sig"), 1))).collect()
    }
    t("candidatePairs.count") {
      MinHashLsh.candidatePairs(corpus(), "doc_id", "text").count()
    }
    t("nearDuplicates.count") {
      MinHashLsh.nearDuplicates(corpus(), "doc_id", "text", 0.6).count()
    }
    spark.stop()
  }
}
