package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: StreamDedupGate per-batch latency as the seen-key store grows.
  *
  * Feeds `batches` batches of `batchRows` synthetic docs each (dupFrac of
  * every batch repeats content from earlier batches), printing per-batch
  * wall time, the admitted/suppressed split, and the store size — the
  * question being whether per-batch cost tracks the BATCH (bloom gate +
  * O(new keys) append) or the CORPUS (full store scans).
  */
object ProfileGate {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(20)
    val batchRows = args.lift(1).map(_.toInt).getOrElse(20000)
    val dupFrac = args.lift(2).map(_.toDouble).getOrElse(0.25)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_gateprof").toString
    val eng = new graft.cv.ContViewEngine(spark, root)
    val schema = Seq((0L, "x")).toDF("id", "body").schema
    eng.createStream("p_in", schema)
    eng.createStream("p_out", org.apache.spark.sql.types.StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField("h",
        org.apache.spark.sql.types.StringType)))
    val gate = graft.streaming.StreamDedupGate.create(eng, "p_gate",
      "SELECT id, body FROM p_in", keySql = "md5(body)", orderCol = "id",
      sink = "p_out", storeRoot = root,
      bloomP = 0.01, bloomN = batches * batchRows)
    // swallow the sink: a CV on p_out would bill its ingest to the gate
    // numbers; the gate's own pipeline is what this probe isolates
    val nNew = (batchRows * (1 - dupFrac)).toInt
    var prevAdmitted = 0L
    (0 until batches).foreach { b =>
      // fresh rows get globally-new content; dup rows repeat content drawn
      // uniformly from ALL previously-admitted keys (worst case for the
      // bloom: every dup is a guaranteed filter hit → store join every batch)
      val base = b.toLong * batchRows
      val fresh = spark.range(nNew).select(
        (col("id") + base).as("id"),
        concat(lit(s"doc-"), (col("id") + b.toLong * nNew).cast("string")).as("body"))
      val dups =
        if (b == 0 || dupFrac <= 0) fresh.limit(0)
        else spark.range(batchRows - nNew).select(
          (col("id") + base + nNew).as("id"),
          concat(lit("doc-"),
            pmod(xxhash64(col("id") + base), lit(b.toLong * nNew)).cast("string"))
            .as("body"))
      val batch = fresh.unionByName(dups).persist()
      batch.count()
      val t0 = System.nanoTime()
      eng.insertInto("p_in", batch)
      val sec = (System.nanoTime() - t0) / 1e9
      batch.unpersist()
      val (_, admitted, suppressed) = gate.stats
      println(f"[gateprof] batch=$b%3d sec=$sec%6.3f evps=${batchRows / sec}%9.0f " +
        f"admitted=${admitted - prevAdmitted}%6d totalSeen=$admitted%8d sup=$suppressed%8d")
      prevAdmitted = admitted
    }
  }
}
