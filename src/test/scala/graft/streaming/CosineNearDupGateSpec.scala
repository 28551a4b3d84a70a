package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cv.ContViewEngine
import graft.functions.VectorExpressions

/** Brute-force semantics of the streaming cosine gate: admitted(v) iff no
  * earlier vector (feed order) at cosine ≥ threshold, invariant across
  * batch splits, resumable from the persisted embedding store.
  */
class CosineNearDupGateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  import spark.implicits._

  private val dim = 16

  /** 80 random unit-ish vectors + a perturbed copy (cos ≈ 0.999) of every
    * 4th — natural pairs sit near cos 0 at dim 16, far from 0.97. */
  private def corpus: DataFrame = {
    val rng = new scala.util.Random(31)
    val base = (0 until 80).map { i =>
      (i.toLong, Array.fill(dim)(rng.nextGaussian().toFloat))
    }
    val dups = base.filter(_._1 % 4 == 0).map { case (id, v) =>
      (id + 5000L, v.map(x => x * 1.001f + 1e-4f))
    }
    (base ++ dups).toDF("id", "embedding")
  }

  private def expectedAdmitted(threshold: Double): Set[Long] = {
    val vecs = corpus.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    vecs.filter { case (id, v) =>
      !vecs.exists { case (id2, v2) => id2 < id && cos(v, v2) >= threshold }
    }.map(_._1).toSet
  }

  private def runGate(root: String, engSuffix: String,
      bounds: Seq[(Long, Long)]): (ContViewEngine, CosineNearDupGate) = {
    val eng = new ContViewEngine(spark, root + "/eng" + engSuffix)
    val schema = corpus.schema
    eng.createStream("c_in", schema)
    eng.createStream("c_out", schema)
    val g = CosineNearDupGate.create(eng, "c_gate",
      "SELECT id, embedding FROM c_in", embSql = "embedding", orderCol = "id",
      sink = "c_out", storeRoot = root + "/gate",
      threshold = 0.97, dim = dim, numTables = 6, bitsPerTable = 8)
    eng.createContView("v_c", "SELECT id FROM c_out", emitChanges = false)
    val c = corpus
    bounds.foreach { case (lo, hi) =>
      eng.insertInto("c_in", c.where(col("id") >= lo && col("id") < hi))
    }
    (eng, g)
  }

  private def admitted(eng: ContViewEngine): Set[Long] =
    eng.overlay("v_c").collect().map(_.getLong(0)).toSet

  test("admitted set equals feed-order brute force, across batch splits") {
    val expected = expectedAdmitted(0.97)
    assert(expected.size === 80, "every perturbed copy suppressed, every base kept")
    val r1 = java.nio.file.Files.createTempDirectory("graft_cg1").toString
    assert(admitted(runGate(r1, "a", Seq((Long.MinValue, Long.MaxValue)))._1)
      === expected, "single batch")
    val r2 = java.nio.file.Files.createTempDirectory("graft_cg2").toString
    assert(admitted(runGate(r2, "a",
      Seq((Long.MinValue, 40L), (40L, 5000L), (5000L, Long.MaxValue)))._1)
      === expected, "three-batch feed must admit the same set")
  }

  test("restart: re-created gate resumes from the embedding store") {
    val root = java.nio.file.Files.createTempDirectory("graft_cg3").toString
    runGate(root, "1", Seq((Long.MinValue, 5000L))) // bases only, then "crash"
    val (eng2, g2) = runGate(root, "2", Seq((5000L, Long.MaxValue))) // copies
    assert(admitted(eng2) === Set.empty,
      "every post-restart copy suppressed by the rebuilt store")
    assert(g2.stats._3 === 20L)
  }
}
