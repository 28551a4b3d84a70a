package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the distributed connected-components regime's checkpoint
  * cadence (round 19). Synthesizes a near-dup-shaped pair set — many tiny
  * cliques plus a few long chains — big enough to force the distributed
  * loop, then times `connectedComponents` per cadence.
  *
  *   runMain graft.ProfileCc [nEdges] [cadences,csv]
  */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cadences = args.lift(1).map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(1, 2, 3))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 90% of edges form 4-node cliques (diameter 1 after min-label),
    // 10% form 64-node chains (the pointer-jumping stressor)
    val cliq = spark.range(nEdges * 9 / 10).select(
      (col("id") / 3).cast("long").as("grp"), col("id"))
      .select((col("grp") * 4 + pmod(col("id"), lit(3L)) + 1).as("id_a"),
        (col("grp") * 4).as("id_b"))
    val base = nEdges * 4L
    val chain = spark.range(nEdges / 10).select(
      (lit(base) + col("id") + (col("id") / 63L)).as("id_a"),
      (lit(base) + col("id") + (col("id") / 63L) + 1).as("id_b"))
    val pairs = cliq.unionByName(chain).persist()
    val n = pairs.count()
    println(s"[cc] $n edges")
    cadences.foreach { cad =>
      (0 until 2).foreach { rep =>
        val t0 = System.nanoTime()
        val out = graft.ops.DedupClusters.connectedComponents(
          pairs, "id_a", "id_b", maxDriverEdges = 0L,
          checkpointCadence = cad)
        val comps = out.select(countDistinct("comp")).collect()(0).getLong(0)
        out.unpersist()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[cc] cadence=$cad%d rep=$rep%d wall=$sec%6.2f s " +
          f"rounds=${graft.ops.DedupClusters.lastClosure._2}%d comps=$comps%d")
      }
    }
    spark.stop()
  }
}
