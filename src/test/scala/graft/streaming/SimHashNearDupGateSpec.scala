package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cv.ContViewEngine
import graft.ops.{SimHash, TextOps}

/** Brute-force semantics of the streaming near-dup gate: admitted(d) iff no
  * earlier doc (feed order) within Hamming distance maxDist — including
  * suppressed docs as suppressors ("seen"-closed prefix), across any batch
  * split of the same feed. The oracle row (q_neardup_stream) covers the
  * engine path end-to-end on the distance-0 slice; this spec pins the full
  * distance-≤3 behavior the oracle can't express.
  */
class SimHashNearDupGateSpec extends AnyFunSuite {

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

  private val vocab = Seq("spark", "query", "row", "data", "join", "filter",
    "scan", "merge", "sort", "key", "hash", "table", "stream", "batch",
    "group", "window", "order", "value", "fast", "slow")

  /** 90 base docs + a near-dup (2 appended tokens) of every 3rd — the
    * OpsSpec corpus shape, which is known to contain natural near-pairs. */
  private def corpus: DataFrame = {
    val rng = new scala.util.Random(11)
    val base = (0 until 90).map { i =>
      (i.toLong, (0 until 40).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val dups = base.filter(_._1 % 3 == 0).map { case (id, t) => (id + 1000L, t + " zz yy") }
    (base ++ dups).toDF("id", "body")
  }

  /** Feed-order brute force: admitted iff no lower-id doc within maxDist. */
  private def expectedAdmitted(maxDist: Int): Set[Long] = {
    val fps = corpus
      .select(col("id"), SimHash.simhash64(TextOps.tokens(col("body"))).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    fps.filter { case (id, fp) =>
      !fps.exists { case (id2, fp2) =>
        id2 < id && java.lang.Long.bitCount(fp ^ fp2) <= maxDist
      }
    }.map(_._1).toSet
  }

  private def runGate(batchBounds: Seq[(Long, Long)]): Set[Long] = {
    val root = java.nio.file.Files.createTempDirectory("graft_ndgate").toString
    val eng = new ContViewEngine(spark, root)
    val schema = Seq((0L, "x")).toDF("id", "body").schema
    eng.createStream("n_in", schema)
    eng.createStream("n_out", org.apache.spark.sql.types.StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField("fp",
        org.apache.spark.sql.types.LongType)))
    // deliberately undersized bloom: heavy false positives must only cost
    // extra store joins, never change the admitted set
    SimHashNearDupGate.create(eng, "n_gate", "SELECT id, body FROM n_in",
      textSql = "body", orderCol = "id", sink = "n_out", storeRoot = root,
      maxDist = 3, blocks = 6, bloomP = 0.2, bloomN = 128)
    eng.createContView("v_n", "SELECT id FROM n_out", emitChanges = false)
    val c = corpus
    batchBounds.foreach { case (lo, hi) =>
      eng.insertInto("n_in", c.where(col("id") >= lo && col("id") < hi))
    }
    eng.overlay("v_n").collect().map(_.getLong(0)).toSet
  }

  test("admitted set equals feed-order brute force, across batch splits") {
    val expected = expectedAdmitted(3)
    // sanity: the corpus actually exercises suppression (seeded + natural)
    assert(expected.size < 120)
    assert(runGate(Seq((Long.MinValue, Long.MaxValue))) === expected,
      "single-batch feed")
    assert(runGate(Seq((Long.MinValue, 45L), (45L, 1000L), (1000L, Long.MaxValue)))
      === expected, "three-batch feed must admit the same set")
  }

  test("suppressed docs still suppress later arrivals (seen-semantics)") {
    val root = java.nio.file.Files.createTempDirectory("graft_ndgate2").toString
    val eng = new ContViewEngine(spark, root)
    val schema = Seq((0L, "x")).toDF("id", "body").schema
    eng.createStream("s_in", schema)
    eng.createStream("s_out", org.apache.spark.sql.types.StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField("fp",
        org.apache.spark.sql.types.LongType)))
    val gate = SimHashNearDupGate.create(eng, "s_gate",
      "SELECT id, body FROM s_in", textSql = "body", orderCol = "id",
      sink = "s_out", storeRoot = root)
    eng.createContView("v_s", "SELECT id FROM s_out", emitChanges = false)
    val t = (0 until 40).map(i => vocab(i % vocab.size)).mkString(" ")
    // 1 admitted; 2 (copy of 1) suppressed; 3 (copy of 2) must STILL be
    // suppressed — by 1 transitively and by the seen entry for 2
    eng.insertInto("s_in", Seq((1L, t)).toDF("id", "body"))
    eng.insertInto("s_in", Seq((2L, t)).toDF("id", "body"))
    eng.insertInto("s_in", Seq((3L, t)).toDF("id", "body"))
    assert(eng.overlay("v_s").collect().map(_.getLong(0)).toSet === Set(1L))
    assert(gate.stats === ((3L, 1L, 2L)))
  }
}
