package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev experiment: candidate-pair generation strategies for banded LSH.
  * A = hot-bucket broadcast prefilter + bucket self-join + distinct (current)
  * B = groupBy(bucket) + collect_set + pair expansion + distinct
  *
  * Measured at sf0.1 (warm, min of 3): A 0.94 s, B 0.83 s, identical pair
  * sets. B stays an experiment: collect_set materializes each bucket's full
  * id array (and the s² struct expansion) inside ONE aggregation buffer /
  * row, so a single dense near-dup cluster concentrates the quadratic blowup
  * in one task's memory. A's join streams the same pairs through the join
  * iterator (spillable), which is the behavior we want at 100 TB — worth
  * ~0.1 s locally to keep.
  */
object ProfilePairGen {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{MinHashLsh, TextOps}
    import graft.queries.Tables
    import org.apache.spark.sql.GraftBridge

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }

    val d = Tables.documents(spark, sfDir).select("doc_id", "text")
    val corpus = d.unionByName(
      d.where(pmod(col("doc_id"), lit(2)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" zz yy")).as("text"))).persist()
    corpus.count()
    val sh = corpus.select(col("doc_id").as("id"), TextOps.shingles(col("text"), 3).as("sh"))
    val sig = sh.select(col("id"), MinHashLsh.minhashSignature(col("sh"), 128).as("sig")).persist()
    sig.count()
    val banded = sig.select(
      col("id"),
      explode(GraftBridge.column(MinHashLsh.MinHashBuckets(
        GraftBridge.expression(col("sig")), 64, 2))).as("bucket")).persist()
    banded.count()

    (1 to 3).foreach { round =>
      val a = time(s"A self-join+distinct #$round") {
        val hot = banded.groupBy("bucket").agg(count(lit(1)).as("cnt"))
          .where(col("cnt") > 1).select("bucket")
        val survivors = banded.join(broadcast(hot), "bucket")
        survivors.select(col("bucket"), col("id").as("id_a"))
          .join(survivors.select(col("bucket"), col("id").as("id_b")), "bucket")
          .where(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"))
          .distinct().count()
      }
      val b = time(s"B groupBy+expand   #$round") {
        banded.groupBy("bucket").agg(collect_set("id").as("ids"))
          .where(size(col("ids")) > 1)
          .select(explode(expr(
            "flatten(transform(ids, (a, i) -> transform(slice(ids, i + 2, size(ids)), b -> struct(least(a, b) AS id_a, greatest(a, b) AS id_b))))")).as("p"))
          .select(col("p.id_a"), col("p.id_b"))
          .distinct().count()
      }
      println(s"[prof] counts A=$a B=$b")
    }
    spark.stop()
  }
}
