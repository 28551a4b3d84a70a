package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword scoring over a document corpus — the ranking half of a
  * keyword search engine, shaped for 100 TB.
  *
  * For a FIXED query-term set no inverted index is needed: per-document
  * term frequencies are computed map-side from the token array (one scan,
  * zero shuffles), and the only aggregation is the tiny global-statistics
  * pass (N, avgdl, per-term document frequency — map-side partials into
  * one scalar row). The scoring pass then runs at scan speed with the
  * stats inlined as literals. Two scans of the corpus total; nothing wider
  * than (doc_id, score) ever shuffles.
  *
  * Okapi BM25 (Robertson/Sparck Jones, TREC-3 1994):
  *   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   tfc(t)  = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
  *   score   = Σ_t idf(t)·tfc(t)
  */
object KeywordScore {

  /** Lowercased alphanumeric tokens, empties dropped — the same shape as
    * DuckDB's regexp_split_to_array + list_filter, so oracle SQL can
    * reproduce tokenization exactly.
    */
  def tokenize(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Per-term frequency inside a token array — map-side, no explode. */
  private def tf(toks: Column, term: String): Column =
    size(filter(toks, t => t === term))

  /** BM25 scores for `terms` over `docs`. Returns (idCol, score) for every
    * document matching at least one term; `score` is left unrounded for
    * caller-side presentation control.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 requires at least one query term")
    val toks = tokenize(col(textCol))
    val withTf = docs.select(
      col(idCol) +: size(toks).cast("double").as("dl") +:
        terms.zipWithIndex.map { case (t, i) => tf(toks, t).cast("double").as(s"tf$i") }: _*)

    // Global statistics: one row — N, avgdl, df per term. Map-side partial
    // aggregation makes this a single tiny-result pass at any scale.
    val statsCols = count(lit(1)).cast("double").as("n") +: avg(col("dl")).as("avgdl") +:
      terms.indices.map(i => sum((col(s"tf$i") > 0).cast("double")).as(s"df$i"))
    val statsRow = withTf.agg(statsCols.head, statsCols.tail: _*).collect()(0)
    val n = statsRow.getDouble(0)
    // empty corpus: avg/df come back NULL — nothing can match any term
    if (n == 0.0) return withTf.limit(0).select(col(idCol), lit(0.0).as("score"))
    val avgdl = math.max(statsRow.getDouble(1), 1e-9)
    val idf = terms.indices.map { i =>
      val df = statsRow.getDouble(2 + i)
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }

    val score = terms.indices.map { i =>
      val tfc = col(s"tf$i") * lit(k1 + 1) /
        (col(s"tf$i") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl)))
      lit(idf(i)) * tfc
    }.reduce(_ + _)
    withTf.where(terms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
      .select(col(idCol), score.as("score"))
  }

  // ---- persisted inverted-index tier (round 15) -------------------------
  //
  // The scan tier above is O(corpus) PER QUERY SET — right for one-off
  // scoring, wrong for repeated retrieval. This tier builds the posting/
  // df/stats summary ONCE (two corpus scans; two shuffles of partially-
  // aggregated postings — the (term, doc) aggregation and the bucket
  // repartition), after which every query reads only the slices its
  // terms touch: the postings table is partitioned by
  // `bucket = pmod(xxhash64(term), 64)` and term-sorted within partitions,
  // so a k-term query prunes to ≤ k partition dirs and, inside them, to
  // the row groups whose term-range stats contain the terms — O(matching
  // postings), not O(corpus). The only shuffle per query is the per-doc
  // score aggregation over MATCHING postings.

  /** Term-hash partition count of a persisted index. 64 keeps partition
    * dirs ≥ tens of MB at TB-scale corpora while still pruning a
    * few-term query to ~1/64 of the postings bytes before row-group
    * stats narrow further. */
  val IndexBuckets = 64

  /** Build the persisted index under `dir`: `postings/` (term, doc_id,
    * tf, dl — dl denormalized so scoring never re-touches the corpus),
    * `df/` (term, df), `stats/` (N over ALL docs incl. token-less ones +
    * the corpus token sum) — the exact statistics the scan tier computes
    * per query, persisted. All three tables are APPEND-ONLY generations
    * (readers aggregate; see [[appendIndex]]), so a growing corpus pays
    * O(delta) per ingest instead of a rebuild. At production scale `dir`
    * lives on shared storage. */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = {
    statsCache.remove(dir)
    writeGeneration(docs, idCol, textCol, dir, overwrite = true)
  }

  /** Append NEW documents (caller contract: doc_ids not already indexed)
    * as one more generation of postings/df/stats files — O(delta) work:
    * two scans of the DELTA and one shuffle of its aggregated postings,
    * the index never rewritten. Readers sum df and stats across
    * generations, and a term's postings simply span more files (the
    * bucket partitioning and per-file term sort still prune). */
  def appendIndex(docs: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = {
    statsCache.remove(dir) // this JVM's cached (n, dl_sum) is now stale
    writeGeneration(docs, idCol, textCol, dir, overwrite = false)
  }

  private def writeGeneration(docs: DataFrame, idCol: String,
      textCol: String, dir: String, overwrite: Boolean): Unit = {
    val spark = docs.sparkSession
    val mode = if (overwrite) "overwrite" else "append"
    val toks = tokenize(col(textCol))
    docs.select(col(idCol).cast("long").as("doc_id"),
        size(toks).cast("double").as("dl"), explode(toks).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("bucket",
        pmod(xxhash64(col("term")), lit(IndexBuckets.toLong)))
      .repartition(col("bucket"))
      .sortWithinPartitions("term")
      .write.mode(mode).partitionBy("bucket")
      .parquet(s"$dir/postings")
    // this generation's per-term doc counts, straight from the delta (a
    // doc contributes once per distinct term) — readers SUM generations
    docs.select(explode(array_distinct(tokenize(col(textCol)))).as("term"))
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      .withColumn("bucket",
        pmod(xxhash64(col("term")), lit(IndexBuckets.toLong)))
      .repartition(col("bucket"))
      .write.mode(mode).partitionBy("bucket").parquet(s"$dir/df")
    docs.select(size(tokenize(col(textCol))).cast("double").as("dl"))
      .agg(count(lit(1)).cast("double").as("n"),
        coalesce(sum("dl"), lit(0.0)).as("dl_sum"))
      .coalesce(1).write.mode(mode).parquet(s"$dir/stats")
  }

  /** Corpus stats summed across generations: (N, avgdl). Cached per dir
    * and per JVM — [[buildIndex]]/[[appendIndex]] invalidate locally; a
    * DIFFERENT process appending to a shared index is not seen until
    * this process re-opens it (document-store freshness, not a
    * correctness hazard: stats drift only dampens score calibration). */
  private def readStats(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Double, Double) =
    statsCache.computeIfAbsent(dir, _ => {
      val st = spark.read.parquet(s"$dir/stats")
        .agg(coalesce(sum("n"), lit(0.0)), coalesce(sum("dl_sum"), lit(0.0)))
        .collect()(0)
      val n = st.getDouble(0)
      (n, if (n > 0) st.getDouble(1) / n else 0.0)
    })

  /** df of each queried term summed across generations — partition-
    * pruned + term predicate pushed to row groups; ≤ |terms| rows back. */
  private def readDf(spark: org.apache.spark.sql.SparkSession, dir: String,
      terms: Seq[String], buckets: Seq[Long]): Map[String, Double] =
    spark.read.parquet(s"$dir/df")
      .where(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
      .groupBy("term").agg(sum("df").as("df"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** BM25 over a persisted index — same contract and (to rounding) same
    * scores as [[bm25]], at O(matching postings) per query. The per-doc
    * term pivot restores the scan tier's FIXED term-order arithmetic, so
    * the two tiers agree bit-for-bit given identical stats. */
  def bm25Indexed(spark: org.apache.spark.sql.SparkSession, dir: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 requires at least one query term")
    // corpus stats are STATIC per index generation — cached per dir, so
    // repeated queries pay zero jobs for them, like any search service
    // holding N/avgdl in memory
    val (n, avgdl0) = readStats(spark, dir)
    if (n == 0.0)
      return spark.range(0)
        .select(col("id").as("doc_id"), lit(0.0).as("score"))
    val avgdl = math.max(avgdl0, 1e-9)
    // term → partition bucket, evaluated driver-side — no job
    val buckets = terms.map(termBucket).distinct
    val dfMap = readDf(spark, dir, terms, buckets)
    val idf = terms.map { t =>
      val df = dfMap.getOrElse(t, 0.0)
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }
    val posts = spark.read.parquet(s"$dir/postings")
      .where(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
    val pivoted = posts.groupBy(col("doc_id")).agg(
      max(col("dl")).as("dl"),
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === t, col("tf")).otherwise(lit(0.0)))
          .as(s"tf$i")
      }: _*)
    val score = terms.indices.map { i =>
      val tfc = col(s"tf$i") * lit(k1 + 1) /
        (col(s"tf$i") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl)))
      lit(idf(i)) * tfc
    }.reduce(_ + _)
    pivoted.select(col("doc_id"), score.as("score"))
  }

  /** BM25 for a whole BATCH of queries against one index, in one pass:
    * returns (query, doc_id, score) for every document matching at least
    * one of its query's terms. The workload shape a pipeline actually
    * runs — thousands of eval/benchmark queries against the corpus —
    * where per-query jobs would be dominated by fixed latency: here the
    * UNION of all terms drives one pruned postings read, the per-(query,
    * term) idf weights ship as ONE broadcast frame, and the only shuffle
    * is the (query, doc_id) score aggregation over matching postings —
    * O(Σ matching postings) for the entire batch, independent of query
    * count. Scores match [[bm25]] per query (summation order inside the
    * aggregate is engine-chosen; agreement is to FP round-off). */
  def bm25IndexedMulti(spark: org.apache.spark.sql.SparkSession,
      dir: String, queries: Map[String, Seq[String]],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && queries.values.forall(_.nonEmpty),
      "every query needs at least one term")
    val (n, avgdl0) = readStats(spark, dir)
    import spark.implicits._
    if (n == 0.0)
      return Seq.empty[(String, Long, Double)].toDF("query", "doc_id", "score")
    val avgdl = math.max(avgdl0, 1e-9)
    val terms = queries.values.flatten.toSeq.distinct
    val buckets = terms.map(termBucket).distinct
    val dfMap = readDf(spark, dir, terms, buckets)
    def idfOf(t: String): Double = {
      val df = dfMap.getOrElse(t, 0.0)
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }
    // (query, term, idf): one small broadcast side for the whole batch
    val qt = queries.toSeq.flatMap { case (q, ts) =>
      ts.distinct.map(t => (q, t, idfOf(t)))
    }.toDF("query", "term", "idf")
    val posts = spark.read.parquet(s"$dir/postings")
      .where(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
    val tfc = col("tf") * lit(k1 + 1) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl)))
    posts.join(broadcast(qt), "term")
      .select(col("query"), col("doc_id"), (col("idf") * tfc).as("contrib"))
      .groupBy("query", "doc_id").agg(sum("contrib").as("score"))
  }

  /** Partition bucket of a term — the driver-side twin of the build's
    * `pmod(xxhash64(term), IndexBuckets)` column (seed 42). */
  private def termBucket(t: String): Long = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(t,
        org.apache.spark.sql.types.StringType)), 42L).eval(null)
    java.lang.Math.floorMod(h.asInstanceOf[Long], IndexBuckets.toLong)
  }

  private val statsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Double, Double)]()

  // one built index per corpus key (Verify/Bench convenience — repeated
  // queries against the same sf dir reuse the build, which is the entire
  // point of the tier)
  private val builtIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Path of a (possibly cached) index for `docs`, keyed by `cacheKey`. */
  def indexFor(docs: DataFrame, idCol: String, textCol: String,
      cacheKey: String): String =
    builtIndexes.computeIfAbsent(cacheKey, _ => {
      val dir =
        java.nio.file.Files.createTempDirectory("graft_bm25idx").toString
      buildIndex(docs, idCol, textCol, dir)
      dir
    })
}
