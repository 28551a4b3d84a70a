package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: SimHashNearDupGate per-batch latency as the fingerprint store
  * grows. Synthetic docs with distinct token tails (near-zero natural
  * collision), dupFrac of each batch repeating earlier content verbatim —
  * every repeat bloom-hits, forcing the store-candidate path each batch,
  * so this measures the worst-case growth path. Since round 9 the store
  * is pre-exploded and range-pruned (GateStore), so the expectation is
  * FLAT per-batch latency; [[ProfileGateScale]] is the seeded 10x/100x
  * variant of the same question.
  */
object ProfileNearDupGate {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(12)
    val batchRows = args.lift(1).map(_.toInt).getOrElse(5000)
    val dupFrac = args.lift(2).map(_.toDouble).getOrElse(0.2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_ndprof").toString
    val eng = new graft.cv.ContViewEngine(spark, root)
    val schema = Seq((0L, "x")).toDF("id", "body").schema
    eng.createStream("np_in", schema)
    eng.createStream("np_out", org.apache.spark.sql.types.StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField("fp",
        org.apache.spark.sql.types.LongType)))
    val gate = graft.streaming.SimHashNearDupGate.create(eng, "np_gate",
      "SELECT id, body FROM np_in", textSql = "body", orderCol = "id",
      sink = "np_out", storeRoot = root,
      bloomN = batches * batchRows * 25)
    // fully id-derived tokens: distinct docs land far apart in Hamming
    // space (sparse buckets — the honest-corpus path); repeats are exact.
    // A boilerplate-heavy corpus (most tokens shared) floods the banded
    // buckets instead — that regime is the hot-bucket cap's territory.
    def body(idCol: org.apache.spark.sql.Column) = concat_ws(" ",
      (0 until 40).map(i => concat(lit(s"t$i"),
        pmod(xxhash64(idCol * (i + 1)), lit(99991L)).cast("string"))): _*)
    val nNew = (batchRows * (1 - dupFrac)).toInt
    var prevAdmitted = 0L
    (0 until batches).foreach { b =>
      val base = b.toLong * batchRows
      val fresh = spark.range(nNew).select(
        (col("id") + base).as("id"), body(col("id") + b.toLong * nNew).as("body"))
      val dups =
        if (b == 0 || dupFrac <= 0) fresh.limit(0)
        else spark.range(batchRows - nNew).select(
          (col("id") + base + nNew).as("id"),
          body(pmod(xxhash64(col("id") + base), lit(b.toLong * nNew))).as("body"))
      val batch = fresh.unionByName(dups).persist()
      batch.count()
      val t0 = System.nanoTime()
      eng.insertInto("np_in", batch)
      val sec = (System.nanoTime() - t0) / 1e9
      batch.unpersist()
      val (_, admitted, suppressed) = gate.stats
      println(f"[ndgateprof] batch=$b%3d sec=$sec%6.3f evps=${batchRows / sec}%8.0f " +
        f"admitted=${admitted - prevAdmitted}%6d totalSeen=${(b + 1).toLong * batchRows}%8d " +
        f"sup=$suppressed%7d")
      prevAdmitted = admitted
    }
  }
}
