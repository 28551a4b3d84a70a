package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the minhash near-dup pipeline (dev tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{MinHashLsh, TextOps}
    import graft.queries.Tables

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }

    val d = Tables.documents(spark, sfDir).select("doc_id", "text")
    val corpus = d.unionByName(
      d.where(pmod(col("doc_id"), lit(2)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" zz yy")).as("text"))).persist()
    time("corpus")(corpus.count())

    val sh = corpus.select(col("doc_id").as("id"), TextOps.shingles(col("text"), 3).as("sh")).persist()
    time("shingles")(sh.count())

    val sig = sh.select(col("id"), MinHashLsh.minhashSignature(col("sh"), 128).as("sig")).persist()
    time("signatures")(sig.count())

    val banded = sig.select(
      col("id"),
      explode(org.apache.spark.sql.GraftBridge.column(MinHashLsh.MinHashBuckets(
        org.apache.spark.sql.GraftBridge.expression(col("sig")), 64, 2))).as("bucket"))
    time("banding")(banded.count())

    val hot = banded.groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 1).select("bucket")
    val survivors = banded.join(broadcast(hot), "bucket")
    val rawPairs = survivors.select(col("bucket"), col("id").as("id_a"))
      .join(survivors.select(col("bucket"), col("id").as("id_b")), "bucket")
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct().persist()
    time("bucket-group pairs")(rawPairs.count())

    val agree = MinHashLsh.sigAgree(col("sig_a"), col("sig_b"))
    val pairs = rawPairs
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .where(agree >= 0.3)
      .select(col("id_a"), col("id_b")).persist()
    time("agree prefilter")(pairs.count())

    val out = pairs
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"), TextOps.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= 0.6)
    time("exact verify")(out.count())

    time("end-to-end fresh")(
      MinHashLsh.nearDuplicates(corpus, "doc_id", "text", threshold = 0.6).count())
    spark.stop()
  }
}
