package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: dump the EXECUTED physical plan (with WholeStageCodegen spans)
  * of the near-dup/ANN pipelines' INTERNAL stages — the parts that sit
  * behind each operator's `localCheckpoint` and are invisible in the
  * registry-query dumps. The round-18 codegen work's before/after evidence:
  * a CodegenFallback expression excludes its operator from whole-stage
  * codegen, so the "before" dumps show the corpus projection OUTSIDE any
  * `*(n)` span.
  *
  * Usage: `runMain graft.PlanStages <outDir> <tag>`
  */
object PlanStages {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/plan_stages")
    val tag = args.lift(1).getOrElse("before")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val docs = graft.queries.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val emb = graft.queries.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val planes = Array.fill(8, 12)(Array.fill(64)(0.01))
    val centroids = Array.fill(16)(Array.fill(64)(0.02))
    val codebooks = Array.fill(16, 16)(Array.fill(4)(0.03))
    def stages: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "minhash_signature" -> docs.select(col("doc_id"),
        graft.ops.MinHashLsh.minhashSignature(
          graft.ops.TextOps.shingles(col("text"), 3), 128).as("sig")),
      "minhash_banding" -> docs.select(col("doc_id"),
        explode(org.apache.spark.sql.GraftBridge.column(graft.ops.MinHashLsh.MinHashBuckets(
          org.apache.spark.sql.GraftBridge.expression(
            graft.ops.MinHashLsh.minhashSignature(
              graft.ops.TextOps.shingles(col("text"), 3), 128)), 64, 2))).as("bucket")),
      "simhash_fingerprint" -> docs.select(col("doc_id"),
        graft.ops.SimHash.simhash64(graft.ops.TextOps.tokens(col("text"))).as("fp")),
      "simhash_block_keys" -> docs.select(col("doc_id"),
        explode(graft.ops.SimHash.blockKeys(
          graft.ops.SimHash.simhash64(graft.ops.TextOps.tokens(col("text"))), 6, 3)).as("k")),
      "lsh_buckets" -> emb.select(col("vec_id"),
        explode(org.apache.spark.sql.GraftBridge.column(graft.ops.AnnSearch.LshBuckets(
          org.apache.spark.sql.GraftBridge.expression(col("v")), planes))).as("bkt")),
      "ivf_assign" -> emb.select(col("vec_id"),
        explode(org.apache.spark.sql.GraftBridge.column(graft.ops.AnnSearch.IvfAssign(
          org.apache.spark.sql.GraftBridge.expression(col("v")), centroids, 2))).as("cl")),
      "pq_encode" -> emb.select(col("vec_id"),
        org.apache.spark.sql.GraftBridge.column(graft.ops.PqSearch.PqEncode(
          org.apache.spark.sql.GraftBridge.expression(col("v")), codebooks)).as("codes")))
    stages.foreach { case (name, df) =>
      try {
        df.write.format("noop").mode("overwrite").save() // guide §1.4
        val txt = df.queryExecution.executedPlan.toString
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"stage_${name}_$tag.txt"),
          txt.getBytes("UTF-8"))
        // executedPlan.toString marks whole-stage spans with "*(n) " prefixes
        println(s"[planstages] $name wscg=${txt.linesIterator.next().startsWith("*(")}")
      } catch {
        // NonFatal only: a fatal JVM error must not keep the loop running
        case scala.util.control.NonFatal(e) =>
          println(s"[planstages] $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
