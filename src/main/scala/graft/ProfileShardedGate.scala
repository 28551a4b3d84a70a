package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: phase breakdown of the key-space-sharded cosine gate at G=1
  * vs G=4 (the bench's gate_sharded_cosine pair). Runs GateProbes.shardProbe
  * under the gate's own trace (set GRAFT_GATE_TRACE=1 when invoking) so the
  * serial terms of the sharded wrapper — sh-collect, sh-verify, sh-sink,
  * the pre-decide pipeline drain — can be read against the parallel decide
  * wave. `runMain graft.ProfileShardedGate [gsCsv] [batchRows] [storeMult]
  * [nBatches]`.
  */
object ProfileShardedGate {
  def main(args: Array[String]): Unit = {
    val gs = args.headOption.getOrElse("1,4").split(",").map(_.trim.toInt).toSeq
    val batchRows = args.lift(1).map(_.toInt).getOrElse(10000)
    val storeMult = args.lift(2).map(_.toLong).getOrElse(50L)
    val nBatches = args.lift(3).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    gs.foreach { g =>
      val t0 = System.nanoTime()
      val ev = GateProbes.shardProbe(spark, "cosine", batchRows, storeMult,
        Seq(g), nBatches).head._2
      println(f"[sharded-profile] g=$g%d ev/s=$ev%d wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
