package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The BM25 index's generational commit protocol: torn (crashed) writes
  * invisible, retried appends idempotent, delete-by-id exact, compaction
  * score-preserving. Complements OpsSpec's scoring/pruning tests. */
class KeywordIndexSpec extends AnyFunSuite {

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

  private def part1: DataFrame = Seq(
    (0L, "spark spark query fast"),
    (1L, "query join slow table table table"),
    (2L, "spark")).toDF("doc_id", "text")

  private def part2: DataFrame = Seq(
    (3L, "row scan merge sort"),
    (4L, "Spark, QUERY! spark-join"),
    (5L, "vector vector index")).toDF("doc_id", "text")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_bm25gen").toString

  private def scores(dir: String, terms: Seq[String]): Map[Long, Double] =
    KeywordScore.bm25Indexed(spark, dir, terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def assertSame(a: Map[Long, Double], b: Map[Long, Double],
      what: String): Unit = {
    assert(a.keySet === b.keySet, s"$what: matched-doc set")
    a.foreach { case (id, v) =>
      assert(math.abs(b(id) - v) < 1e-12, s"$what: doc $id $v vs ${b(id)}")
    }
  }

  test("a crash between generation writes leaves the torn generation " +
      "invisible; the retry commits cleanly") {
    for (point <- Seq("postings", "df", "stats")) {
      val dir = tmp()
      KeywordScore.buildIndex(part1, "doc_id", "text", dir)
      val before = scores(dir, Seq("spark", "query"))
      KeywordScore.failAt = point
      intercept[IllegalStateException] {
        KeywordScore.appendIndex(part2, "doc_id", "text", dir,
          deltaId = Some("d1"))
      }
      // the torn generation must not skew ANY statistic: scores over the
      // surviving index equal the pre-crash index exactly
      assertSame(scores(dir, Seq("spark", "query")), before,
        s"crash at $point")
      assert(scores(dir, Seq("vector")).isEmpty,
        s"crash at $point: torn delta's postings must be invisible")
      // retry (same delta id — the crashed attempt never committed it)
      KeywordScore.appendIndex(part2, "doc_id", "text", dir,
        deltaId = Some("d1"))
      val full = tmp()
      KeywordScore.buildIndex(part1.unionByName(part2), "doc_id", "text", full)
      assertSame(scores(dir, Seq("spark", "query", "vector")),
        scores(full, Seq("spark", "query", "vector")),
        s"recovered-after-$point index vs fresh build")
    }
  }

  test("appendIndex with an already-committed delta id is a no-op " +
      "(upstream retry cannot double-count)") {
    val dir = tmp()
    KeywordScore.buildIndex(part1, "doc_id", "text", dir)
    KeywordScore.appendIndex(part2, "doc_id", "text", dir,
      deltaId = Some("batch-7"))
    val once = scores(dir, Seq("spark", "query", "vector"))
    KeywordScore.appendIndex(part2, "doc_id", "text", dir,
      deltaId = Some("batch-7")) // the retry
    assertSame(scores(dir, Seq("spark", "query", "vector")), once,
      "retried append")
    assert(KeywordScore.readCommits(dir).size == 2,
      "retry must not commit a third generation")
  }

  test("deleteDocs: scores equal a fresh build without the deleted docs") {
    val dir = tmp()
    KeywordScore.buildIndex(part1.unionByName(part2), "doc_id", "text", dir)
    KeywordScore.deleteDocs(spark, dir, Seq(1L, 4L).toDF("doc_id"),
      deltaId = Some("del-1"))
    val fresh = tmp()
    KeywordScore.buildIndex(
      part1.unionByName(part2).where(!org.apache.spark.sql.functions
        .col("doc_id").isin(1L, 4L)),
      "doc_id", "text", fresh)
    for (terms <- Seq(Seq("spark", "query"), Seq("table"), Seq("vector"),
        Seq("join"))) {
      assertSame(scores(dir, terms), scores(fresh, terms), s"terms=$terms")
    }
    // idempotent by delta id AND by effect: same ids again subtract nothing
    KeywordScore.deleteDocs(spark, dir, Seq(1L, 4L).toDF("doc_id"),
      deltaId = Some("del-1"))
    KeywordScore.deleteDocs(spark, dir, Seq(1L, 999L).toDF("doc_id"))
    assertSame(scores(dir, Seq("spark", "query")),
      scores(fresh, Seq("spark", "query")), "after re-delete")
    // batch API applies tombstones too
    val multi = KeywordScore.bm25IndexedMulti(spark, dir,
      Map("a" -> Seq("spark", "query")))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assertSame(multi, scores(fresh, Seq("spark", "query")), "multi tier")
  }

  test("a deleted doc_id re-appended later scores again (tombstones are " +
      "scoped to earlier generations)") {
    val dir = tmp()
    KeywordScore.buildIndex(part1, "doc_id", "text", dir)
    KeywordScore.deleteDocs(spark, dir, Seq(0L).toDF("doc_id"))
    assert(!scores(dir, Seq("spark")).contains(0L), "deleted")
    KeywordScore.appendIndex(
      Seq((0L, "spark spark query fast")).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    val fresh = tmp()
    KeywordScore.buildIndex(part1, "doc_id", "text", fresh)
    assertSame(scores(dir, Seq("spark", "query")),
      scores(fresh, Seq("spark", "query")), "re-appended doc")
  }

  test("randomized mutation sequence equals a fresh build of the " +
      "surviving doc set (seeded, deterministic)") {
    val rng = new scala.util.Random(42)
    val vocab = Seq("spark", "query", "vector", "table", "join", "scan",
      "merge", "index", "row", "fast")
    def doc(id: Long): (Long, String) =
      (id, (0 until 3 + rng.nextInt(6)).map(_ => vocab(rng.nextInt(vocab.size)))
        .mkString(" "))
    val dir = tmp()
    var live = Map.empty[Long, String] // the oracle: current corpus
    var nextId = 0L
    def appendN(n: Int): Unit = {
      val docs = (0 until n).map { _ => nextId += 1; doc(nextId) }
      live ++= docs
      KeywordScore.appendIndex(docs.toDF("doc_id", "text"), "doc_id", "text", dir)
    }
    KeywordScore.buildIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text", dir)
    (0 until 12).foreach { step =>
      rng.nextInt(4) match {
        case 0 | 1 => appendN(1 + rng.nextInt(4))
        case 2 if live.nonEmpty =>
          val victims = live.keys.toSeq.sorted
            .filter(_ => rng.nextBoolean()).take(3)
          live --= victims
          KeywordScore.deleteDocs(spark, dir, victims.toDF("doc_id"))
        case _ => KeywordScore.compactIndex(spark, dir)
      }
      // invariant after EVERY step: indexed scores == fresh build of the
      // oracle corpus, for a multi-term query
      val fresh = tmp()
      val corpus =
        if (live.isEmpty) Seq.empty[(Long, String)].toDF("doc_id", "text")
        else live.toSeq.toDF("doc_id", "text")
      KeywordScore.buildIndex(corpus, "doc_id", "text", fresh)
      val terms = Seq("spark", "vector", "join")
      assertSame(scores(dir, terms), scores(fresh, terms), s"step $step")
    }
  }

  test("compactIndex folds generations into one, preserves scores " +
      "exactly, and sweeps retired + orphaned dirs") {
    val dir = tmp()
    KeywordScore.buildIndex(part1, "doc_id", "text", dir)
    KeywordScore.appendIndex(part2, "doc_id", "text", dir)
    KeywordScore.deleteDocs(spark, dir, Seq(1L).toDF("doc_id"))
    // plus one ORPHAN generation from a crashed append
    KeywordScore.failAt = "df"
    intercept[IllegalStateException] {
      KeywordScore.appendIndex(
        Seq((9L, "orphan text")).toDF("doc_id", "text"), "doc_id", "text", dir)
    }
    val before = scores(dir, Seq("spark", "query", "vector"))
    KeywordScore.compactIndex(spark, dir)
    assertSame(scores(dir, Seq("spark", "query", "vector")), before,
      "post-compaction scores")
    def genDirs(table: String): Seq[String] =
      Option(java.nio.file.Paths.get(dir, table).toFile.listFiles())
        .getOrElse(Array.empty).toSeq.map(_.getName)
        .filter(_.startsWith("gen="))
    for (t <- Seq("postings", "df", "stats"))
      assert(genDirs(t).size == 1, s"$t dirs after compaction: ${genDirs(t)}")
    assert(genDirs("deleted").isEmpty,
      "tombstone data retired by compaction")
    // folded index keeps behaving: append after compaction, incl. the
    // previously-deleted id (its tombstone is gone)
    KeywordScore.appendIndex(
      Seq((1L, "query join slow table table table")).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    val fresh = tmp()
    KeywordScore.buildIndex(part1.unionByName(part2), "doc_id", "text", fresh)
    assertSame(scores(dir, Seq("spark", "query", "table")),
      scores(fresh, Seq("spark", "query", "table")), "append after compaction")
    // an already-compact index: no-op (no new generation)
    val n = KeywordScore.readCommits(dir).size
    KeywordScore.compactIndex(spark, dir)
    KeywordScore.compactIndex(spark, dir)
    assert(KeywordScore.readCommits(dir).size <= n + 1,
      "repeated compaction must not keep committing generations")
  }
}
