package graft.ops

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
      // a zero-tf slot contributes 0 — guarded explicitly because at
      // k1 = 0 the raw expression is 0/0 (ANSI divide-by-zero)
      lit(idf(i)) * when(col(s"tf$i") > 0, tfc).otherwise(lit(0.0))
    }.reduce(_ + _)
    withTf.where(terms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
      .select(col(idCol), score.as("score"))
  }

  // ---- persisted inverted-index tier (round 15; generational commit
  //      protocol round 16) -------------------------------------------------
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
  //
  // DURABILITY (round 16). Each mutation (build / append / delete /
  // compact) stages its postings, df, and stats tables under NEW
  // `gen=<k>/` partition directories, then publishes ONE tiny marker file
  // (`_commits/gen_<k>.json`) through [[graft.io.CommitFs]] — the same
  // single-commit-point pattern as the matrel manifest swap
  // (StateStore.scala writeManifest). Readers enumerate COMMITTED
  // generations from the markers and partition-prune everything else, so
  // a crash between the three table writes leaves a torn generation that
  // is simply invisible (readers pass an explicit schema, so its files
  // are never even opened for inference). Markers also carry:
  //  - `delta_id`: appends/deletes stamped with a caller id are IDEMPOTENT
  //    — re-publishing a committed delta id is a no-op, so an upstream
  //    retry cannot double-count postings/df/stats;
  //  - `replaces`: a compaction marker atomically retires the generations
  //    it folded — readers see the old set or the new one, never both.
  // Single-writer per index dir (like any LSM maintenance path); readers
  // are always safe. Reference anchor: the reference's combiner folds
  // matrel increments inside ONE transaction (combiner.c:1402-1638) —
  // partial state is never reader-visible; this protocol keeps that
  // property on a filesystem.

  /** Term-hash partition count of a persisted index. 64 keeps partition
    * dirs ≥ tens of MB at TB-scale corpora while still pruning a
    * few-term query to ~1/64 of the postings bytes before row-group
    * stats narrow further. */
  val IndexBuckets = 64

  // Explicit reader schemas: no footer-based inference, so files of an
  // UNCOMMITTED (possibly torn) generation are listed but never opened —
  // the gen partition filter prunes them before any byte is read.
  // `impact`/`max_impact` (round 17, postings format 2): the normalized
  // tf-saturation term tfc/(k1+1) at the BUILD's reference avgdl and the
  // DEFAULT (k1=1.2, b=0.75) — what impact-ordered row groups and the
  // top-k pruning bound ([[bm25IndexedTopK]]) run on. NULL on format-1
  // generations; readers fall back to full scoring there.
  private val postingsSchema = StructType(Seq(
    StructField("term", StringType), StructField("doc_id", LongType),
    StructField("dl", DoubleType), StructField("tf", DoubleType),
    StructField("impact", DoubleType),
    StructField("gen", IntegerType), StructField("bucket", IntegerType)))
  private val dfSchema = StructType(Seq(
    StructField("term", StringType), StructField("df", DoubleType),
    StructField("max_impact", DoubleType),
    StructField("gen", IntegerType), StructField("bucket", IntegerType)))
  private val statsSchema = StructType(Seq(
    StructField("n", DoubleType), StructField("dl_sum", DoubleType),
    StructField("gen", IntegerType)))
  private val deletedSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("gen", IntegerType)))

  /** The (k1, b) the stored impact column was computed with. A top-k
    * query at other parameters falls back to full scoring — the bound
    * below is only valid at the build's parameters. */
  val ImpactK1 = 1.2
  val ImpactB = 0.75

  /** One committed generation, parsed from its `_commits/gen_<k>.json`
    * marker. `kind`: base | delta | tombstone | compact | noop.
    * `pfmt`: postings format — 2 carries the impact column (absent on
    * pre-r17 markers → 1). */
  private[graft] case class Gen(gen: Int, kind: String,
      deltaId: Option[String], replaces: Seq[Int], pfmt: Int = 1)

  // Index metadata (markers, listings, sweeps) runs through the StoreFs
  // seam, so an index dir may be a plain path OR a URI root ("file:/…",
  // "hdfs://…") — the same portability the CV store tier has. Bulk
  // postings/df/stats IO was always URI-capable (spark.read/write).
  private def commitsDir(dir: String): String = s"$dir/_commits"
  private val markerRe = """gen_(\d+)\.json""".r

  /** All commit markers ever published, ascending by generation. Marker
    * files are never deleted (compaction retires DATA dirs only), so
    * delta-id idempotence survives compaction. A marker that cannot be
    * READ or PARSED throws — defaulting it would silently misclassify a
    * compact marker as a plain delta, resurrecting every generation its
    * `replaces` list retired (double-counted scores, no error). Markers
    * are published atomically, so an unreadable one is a transient IO
    * fault: fail the query, let the caller retry. A dir with postings
    * DATA but no markers at all is a pre-generational (unmigrated) index
    * — scoring it as an empty corpus would be silently wrong, so it
    * throws too. */
  private[graft] def readCommits(dir: String): Seq[Gen] = {
    val fs = graft.io.StoreFs.forRoot(dir)
    val cd = commitsDir(dir)
    val gens = fs.list(cd).flatMap {
      case name @ markerRe(k) =>
        val txt = fs.readString(s"$cd/$name") // IO failure: propagate
        val kind = """"kind"\s*:\s*"(\w+)"""".r.findFirstMatchIn(txt)
          .map(_.group(1)).getOrElse(throw new IllegalStateException(
            s"bm25 index marker $name under $dir is unparseable: $txt"))
        val deltaId = """"delta_id"\s*:\s*"([^"]*)"""".r
          .findFirstMatchIn(txt).map(_.group(1))
        val replaces = """"replaces"\s*:\s*\[([^\]]*)\]""".r
          .findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
          .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
        val pfmt = """"pfmt"\s*:\s*(\d+)""".r.findFirstMatchIn(txt)
          .map(_.group(1).toInt).getOrElse(1)
        Some(Gen(k.toInt, kind, deltaId, replaces, pfmt))
      case _ => None
    }.sortBy(_.gen)
    if (gens.isEmpty && fs.list(s"$dir/postings").nonEmpty)
      throw new IllegalStateException(
        s"bm25 index at $dir has postings data but no commit markers — " +
          "either an unmigrated pre-generational index or a first build " +
          "that crashed before its marker; rebuild with buildIndex " +
          "(scoring it would silently return an empty corpus)")
    gens
  }

  /** Committed-and-not-replaced generations — what readers may see.
    * `noop` markers (an idempotence stamp with no data — see
    * [[deleteDocs]]'s no-active-index path) carry no reader-visible
    * state and are excluded. */
  private def activeOf(commits: Seq[Gen]): Seq[Int] = {
    val replaced = commits.flatMap(_.replaces).toSet
    commits.filter(_.kind != "noop").map(_.gen).filterNot(replaced)
  }

  /** THE commit point: the staged generation's marker lands atomically
    * (temp write + StoreFs.publish, fsynced where the fs can — a torn
    * index silently skews every future score, so this commit pays the
    * durable class). */
  private def publishMarker(dir: String, g: Gen): Unit = {
    // delta ids are interpolated into the marker JSON verbatim — keep
    // them out of JSON-syntax territory (they are caller-chosen batch
    // stamps, not free text)
    g.deltaId.foreach(id => require(!id.exists(c => c == '"' || c == '\\' ||
      c < ' '), s"delta id must not contain quotes/backslashes/control chars: $id"))
    val fs = graft.io.StoreFs.forRoot(dir)
    fs.mkdirs(commitsDir(dir))
    val delta = g.deltaId.map(d => s""","delta_id": "$d"""").getOrElse("")
    val repl = if (g.replaces.isEmpty) ""
      else s""","replaces": [${g.replaces.mkString(",")}]"""
    val txt =
      s"""{"gen": ${g.gen}, "kind": "${g.kind}", "pfmt": ${g.pfmt}$delta$repl}"""
    val tmp = s"${commitsDir(dir)}/.gen_${g.gen}.tmp"
    fs.writeString(tmp, txt)
    fs.publish(tmp, s"${commitsDir(dir)}/gen_${g.gen}.json", durable = true)
  }

  /** Next unused generation number: above every committed marker AND
    * every data dir present (an orphan dir from a crashed writer must
    * never be reused — its torn files would alias the new generation). */
  private def nextGen(dir: String, commits: Seq[Gen]): Int = {
    val fs = graft.io.StoreFs.forRoot(dir)
    val genDirRe = """gen=(\d+)""".r
    val onDisk = Seq("postings", "df", "stats", "deleted").flatMap { t =>
      fs.list(s"$dir/$t").flatMap {
        case genDirRe(k) => Some(k.toInt)
        case _ => None
      }
    }
    ((commits.map(_.gen) ++ onDisk) :+ -1).max + 1
  }

  // test failpoint: throws once when a staged write reaches the named
  // point ("postings" | "df" | "stats" — all BEFORE the marker publish),
  // simulating a crash that leaves a torn, uncommitted generation
  private[graft] var failAt: String = null
  @inline private def failpoint(p: String): Unit =
    if (p == failAt) {
      failAt = null
      throw new IllegalStateException(s"failpoint:$p")
    }

  /** Build the persisted index under `dir`: `postings/` (term, doc_id,
    * tf, dl — dl denormalized so scoring never re-touches the corpus),
    * `df/` (term, df), `stats/` (N over ALL docs incl. token-less ones +
    * the corpus token sum) — the exact statistics the scan tier computes
    * per query, persisted as generation 0 + its commit marker. At
    * production scale `dir` lives on shared storage. */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = {
    // a rebuild owns the dir: clear any previous index (data + markers)
    graft.io.StoreFs.forRoot(dir).deleteRecursively(dir)
    statsCache.remove(dir)
    writeGeneration(docs, idCol, textCol, dir, gen = 0)
    publishMarker(dir, Gen(0, "base", None, Nil, pfmt = 2))
  }

  /** Append NEW documents (caller contract: doc_ids not already indexed —
    * see [[deleteDocs]] + [[compactIndex]] for removal) as one more
    * committed generation — O(delta) work: two scans of the DELTA and one
    * shuffle of its aggregated postings, the index never rewritten.
    * Readers sum df and stats across generations, and a term's postings
    * simply span more files (the bucket partitioning and per-file term
    * sort still prune). `deltaId`: optional idempotence stamp — an append
    * whose id a committed marker already carries is a NO-OP, so upstream
    * retries cannot double-count postings, df, or stats. */
  def appendIndex(docs: DataFrame, idCol: String, textCol: String,
      dir: String, deltaId: Option[String] = None): Unit = {
    val commits = readCommits(dir)
    if (deltaId.exists(id => commits.exists(_.deltaId.contains(id)))) {
      System.err.println(s"[graft] bm25 appendIndex: delta id " +
        s"'${deltaId.get}' already committed under $dir — no-op (retry)")
      return
    }
    statsCache.remove(dir) // this JVM's cached (n, dl_sum) is now stale
    val g = nextGen(dir, commits)
    writeGeneration(docs, idCol, textCol, dir, gen = g)
    publishMarker(dir, Gen(g, "delta", deltaId, Nil, pfmt = 2))
  }

  /** The stored impact of a posting: tfc/(k1+1) at the build defaults
    * and reference avgdl `a` — a (0,1] saturation value whose row-group
    * min/max let a top-k scan skip groups that cannot contribute. */
  private def impactCol(tf: Column, dl: Column, a: Double): Column =
    tf / (tf + lit(ImpactK1 * (1 - ImpactB)) +
      lit(ImpactK1 * ImpactB) * dl / lit(math.max(a, 1e-9)))

  /** Stage one generation's three tables under `gen=<gen>/` partition
    * dirs. NOT a commit — nothing is reader-visible until
    * [[publishMarker]] lands; a crash at any point here leaves an orphan
    * dir that [[nextGen]] skips and [[compactIndex]] sweeps. The corpus
    * stats run FIRST (one tiny-result job) because the generation's OWN
    * avgdl is the impact column's reference (reader bound:
    * tfc_now/(k1+1) ≤ impact × max(1, avgdl_now/avgdl_gen) — see
    * [[bm25IndexedTopK]]); the df table then derives from the
    * just-written postings (one doc-term pair per row), which replaces
    * the old second corpus scan with a re-read of the generation's own
    * (page-cached, pruned) output. */
  private def writeGeneration(docs: DataFrame, idCol: String,
      textCol: String, dir: String, gen: Int): Unit = {
    val toks = tokenize(col(textCol))
    val st = docs.select(size(toks).cast("double").as("dl"))
      .agg(count(lit(1)).cast("double").as("n"),
        coalesce(sum("dl"), lit(0.0)).as("dl_sum"))
      .collect()(0)
    val (n, dlSum) = (st.getDouble(0), st.getDouble(1))
    val aRef = if (n > 0) dlSum / n else 0.0
    docs.select(col(idCol).cast("long").as("doc_id"),
        size(toks).cast("double").as("dl"), explode(toks).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("impact", impactCol(col("tf"), col("dl"), aRef))
      .withColumn("bucket",
        pmod(xxhash64(col("term")), lit(IndexBuckets.toLong)))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("term"), col("impact").desc)
      .write.partitionBy("bucket")
      .parquet(s"$dir/postings/gen=$gen")
    failpoint("postings")
    // this generation's per-term doc counts + max impact, derived from
    // the staged postings (one row per doc-term pair) — readers SUM df
    // and MAX max_impact across generations
    spark(docs).read.schema(postingsSchema)
      .option("basePath", s"$dir/postings") // keep gen/bucket partition cols
      .parquet(s"$dir/postings/gen=$gen")
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"),
        max("impact").as("max_impact"))
      .withColumn("bucket",
        pmod(xxhash64(col("term")), lit(IndexBuckets.toLong)))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").parquet(s"$dir/df/gen=$gen")
    failpoint("df")
    docs.sparkSession.range(1)
      .select(lit(n).as("n"), lit(dlSum).as("dl_sum"))
      .coalesce(1).write.parquet(s"$dir/stats/gen=$gen")
    failpoint("stats")
  }

  private def spark(df: DataFrame) = df.sparkSession

  /** Remove documents BY ID as one committed tombstone generation — the
    * dedup→re-index loop's maintenance op, costing one pruned-to-active
    * postings scan instead of a corpus rebuild. Document UPDATE composes
    * from the two primitives: `deleteDocs(ids)` then `appendIndex(new
    * versions)` — the tombstone is scoped to earlier generations, so the
    * re-appended rows score immediately. The generation carries
    * (a) the deleted doc_id list (scoring reads anti-join it, scoped to
    * EARLIER generations — so a doc_id re-appended later scores again),
    * (b) NEGATIVE df rows for the deleted docs' terms, (c) a NEGATIVE
    * stats row — df/N/avgdl sums then equal a fresh build without those
    * docs exactly (all values are integer-valued doubles, so the
    * subtraction is lossless). Docs with ZERO tokens have no postings to
    * recover dl/N from; their (0-length) stats contribution survives a
    * delete-by-id — an avgdl calibration nit, removed by the next
    * [[compactIndex]]-after-rebuild cycle. `deltaId` is idempotent like
    * [[appendIndex]]'s. */
  def deleteDocs(spark: SparkSession, dir: String, docIds: DataFrame,
      deltaId: Option[String] = None): Unit = {
    val commits = readCommits(dir)
    if (deltaId.exists(id => commits.exists(_.deltaId.contains(id)))) {
      System.err.println(s"[graft] bm25 deleteDocs: delta id " +
        s"'${deltaId.get}' already committed under $dir — no-op (retry)")
      return
    }
    val active = activeOf(commits)
    if (active.isEmpty) {
      // no index to subtract from — but the delta id must still be
      // RECORDED, or a retry of this same id after the index is later
      // (re)built would apply the delete against data the original call
      // never saw. A `noop` marker carries the id with no data dirs;
      // readers skip it (activeOf), idempotence checks see it.
      deltaId.foreach { id =>
        publishMarker(dir,
          Gen(nextGen(dir, commits), "noop", Some(id), Nil, pfmt = 2))
      }
      return
    }
    statsCache.remove(dir)
    val g = nextGen(dir, commits)
    val ids = docIds.select(
      col(docIds.columns.head).cast("long").as("doc_id")).distinct()
    // postings of the doomed docs, AFTER earlier tombstones — so deleting
    // an already-deleted or absent id subtracts nothing (idempotent in
    // effect, not just by delta id)
    val mine = activePostings(spark, dir, active, commits, lit(true))
      .join(ids, Seq("doc_id"), "left_semi")
      .select("term", "doc_id", "dl", "tf").persist()
    try {
      mine.groupBy("term")
        .agg((-count(lit(1))).cast("double").as("df"))
        .withColumn("bucket",
          pmod(xxhash64(col("term")), lit(IndexBuckets.toLong)))
        .repartition(col("bucket"))
        .write.partitionBy("bucket").parquet(s"$dir/df/gen=$g")
      failpoint("df")
      val perDoc = mine.groupBy("doc_id").agg(max("dl").as("dl"))
      perDoc.agg((-count(lit(1))).cast("double").as("n"),
          (-coalesce(sum("dl"), lit(0.0))).as("dl_sum"))
        .coalesce(1).write.parquet(s"$dir/stats/gen=$g")
      failpoint("stats")
      perDoc.select("doc_id").coalesce(1)
        .write.parquet(s"$dir/deleted/gen=$g")
      failpoint("deleted")
    } finally { mine.unpersist(); () }
    publishMarker(dir, Gen(g, "tombstone", deltaId, Nil, pfmt = 2))
  }

  /** Fold every active generation (applying tombstones) into ONE fresh
    * generation and atomically retire the olds via the marker's
    * `replaces` list — so pruned reads go back to opening one file set
    * per bucket instead of one per append (the gate stores' tiered
    * compaction, GateStore.compact, is the same move). Scores are
    * byte-identical across the fold: tf/dl rows are copied, df/stats are
    * lossless integer-double sums. Retired and orphaned (uncommitted)
    * generation data dirs are deleted afterwards, best-effort — readers
    * never look at them again either way. No-op on an already-compact
    * index. Single-writer, like every mutation here. */
  def compactIndex(spark: SparkSession, dir: String): Unit = {
    val commits = readCommits(dir)
    val active = activeOf(commits)
    val activeSet = active.toSet
    val tombs = commits.exists(c => activeSet(c.gen) && c.kind == "tombstone")
    if (active.size <= 1 && !tombs) {
      // nothing to fold — but a PREVIOUS compaction's deferred retirees
      // (see sweepDead's deferral contract) may still be on disk
      sweepDead(dir, keep = activeSet)
      return
    }
    statsCache.remove(dir)
    val g = nextGen(dir, commits)
    // folded stats first: the fold's OWN avgdl is the new generation's
    // impact reference, so the impact column is recomputed here — which
    // also UPGRADES a pre-impact (format-1) index to format 2
    val st = spark.read.schema(statsSchema).parquet(s"$dir/stats")
      .where(col("gen").isin(active: _*))
      .agg(coalesce(sum("n"), lit(0.0)), coalesce(sum("dl_sum"), lit(0.0)))
      .collect()(0)
    val (n, dlSum) = (st.getDouble(0), st.getDouble(1))
    val aRef = if (n > 0) dlSum / n else 0.0
    activePostings(spark, dir, active, commits, lit(true))
      .select(col("term"), col("doc_id"), col("dl"), col("tf"),
        impactCol(col("tf"), col("dl"), aRef).as("impact"), col("bucket"))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("term"), col("impact").desc)
      .write.partitionBy("bucket").parquet(s"$dir/postings/gen=$g")
    // folded df + max_impact derive from the folded postings (tombstones
    // already applied there), like writeGeneration's — token-less docs
    // have no postings, so a df(term) can never go missing this way
    spark.read.schema(postingsSchema)
      .option("basePath", s"$dir/postings")
      .parquet(s"$dir/postings/gen=$g")
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"),
        max("impact").as("max_impact"))
      .where(col("df") > 0)
      .withColumn("bucket",
        pmod(xxhash64(col("term")), lit(IndexBuckets.toLong)))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").parquet(s"$dir/df/gen=$g")
    spark.range(1).select(lit(n).as("n"), lit(dlSum).as("dl_sum"))
      .coalesce(1).write.parquet(s"$dir/stats/gen=$g")
    publishMarker(dir, Gen(g, "compact", None, active, pfmt = 2))
    // data-dir sweep, DEFERRED by one compaction cycle: the generations
    // THIS fold just retired stay on disk until the NEXT compaction, so a
    // concurrent reader in another process that resolved the old active
    // set just before the marker landed can still finish its scan (the
    // same hazard the indexFor LRU eviction defers deletion for). What
    // sweeps NOW: dirs retired by the PREVIOUS compaction, crashed
    // writers' orphans, and leftovers of an earlier failed sweep — none
    // of which any reader could have resolved against the pre-fold
    // marker set.
    sweepDead(dir, keep = active.toSet + g)
  }

  /** Delete every on-disk `gen=<k>` data dir whose generation is not in
    * `keep` — best-effort (readers never resolve swept gens from the
    * current markers either way). Callers choose `keep` to implement the
    * one-cycle sweep deferral documented at [[compactIndex]]. */
  private def sweepDead(dir: String, keep: Set[Int]): Unit = {
    val fs = graft.io.StoreFs.forRoot(dir)
    val genDirRe = """gen=(\d+)""".r
    Seq("postings", "df", "stats", "deleted").foreach { t =>
      fs.list(s"$dir/$t").foreach {
        case name @ genDirRe(k) if !keep(k.toInt) =>
          fs.deleteRecursively(s"$dir/$t/$name")
        case _ =>
      }
    }
  }

  /** Matching postings across the active generations, with tombstones
    * applied: a tombstone suppresses a (doc_id, posting) pair only in
    * generations EARLIER than itself, so re-appending a deleted doc_id
    * works without waiting for compaction. With no active tombstone the
    * plan is the bare pruned scan — no join added. */
  private def activePostings(spark: SparkSession, dir: String,
      active: Seq[Int], commits: Seq[Gen], cond: Column): DataFrame = {
    val posts = spark.read.schema(postingsSchema)
      .parquet(s"$dir/postings")
      .where(col("gen").isin(active: _*) && cond)
    val activeSet = active.toSet
    val tombGens = commits
      .filter(c => activeSet(c.gen) && c.kind == "tombstone").map(_.gen)
    if (tombGens.isEmpty) posts
    else {
      val del = spark.read.schema(deletedSchema)
        .parquet(s"$dir/deleted")
        .where(col("gen").isin(tombGens: _*))
        .select(col("doc_id").as("__del_id"), col("gen").as("__del_gen"))
      posts.join(del,
        posts("doc_id") === col("__del_id") &&
          posts("gen") < col("__del_gen"), "left_anti")
    }
  }

  /** Corpus stats summed across active generations: (N, avgdl, and the
    * SMALLEST per-generation avgdl — [[bm25IndexedTopK]]'s impact
    * conversion reference; 0 when no generation has positive n). ONE
    * tiny-result job, cached per dir WITH the active-generation
    * signature — a marker published by this or ANY OTHER process changes
    * the signature, so the cache self-refreshes on the next read instead
    * of serving stale stats. */
  private def readStats(spark: SparkSession, dir: String,
      active: Seq[Int]): (Double, Double, Double) = {
    val sig = active.mkString(",")
    val cached = statsCache.get(dir)
    if (cached != null && cached._1 == sig)
      return (cached._2, cached._3, cached._4)
    if (active.isEmpty) return (0.0, 0.0, 0.0)
    val st = spark.read.schema(statsSchema).parquet(s"$dir/stats")
      .where(col("gen").isin(active: _*))
      .agg(coalesce(sum("n"), lit(0.0)), coalesce(sum("dl_sum"), lit(0.0)),
        min(when(col("n") > 0, col("dl_sum") / col("n"))))
      .collect()(0)
    val n = st.getDouble(0)
    val avgdl = if (n > 0) st.getDouble(1) / n else 0.0
    val aMin = if (st.isNullAt(2)) 0.0 else st.getDouble(2)
    statsCache.put(dir, (sig, n, avgdl, aMin))
    (n, avgdl, aMin)
  }

  /** df of each queried term summed across active generations (tombstone
    * generations contribute their negative rows) — partition-pruned +
    * term predicate pushed to row groups; ≤ |terms| rows back. */
  private def readDf(spark: SparkSession, dir: String, terms: Seq[String],
      buckets: Seq[Int], active: Seq[Int]): Map[String, Double] =
    spark.read.schema(dfSchema).parquet(s"$dir/df")
      .where(col("gen").isin(active: _*) &&
        col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
      .groupBy("term").agg(sum("df").as("df"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** BM25 over a persisted index — same contract and (to rounding) same
    * scores as [[bm25]], at O(matching postings) per query. The per-doc
    * term pivot restores the scan tier's FIXED term-order arithmetic, so
    * the two tiers agree bit-for-bit given identical stats. */
  def bm25Indexed(spark: SparkSession, dir: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 requires at least one query term")
    val commits = readCommits(dir)
    val active = activeOf(commits)
    // corpus stats are STATIC per committed generation set — cached per
    // dir+signature, so repeated queries pay zero jobs for them, like any
    // search service holding N/avgdl in memory
    val (n, avgdl0, _) = readStats(spark, dir, active)
    if (n == 0.0)
      return spark.range(0)
        .select(col("id").as("doc_id"), lit(0.0).as("score"))
    val avgdl = math.max(avgdl0, 1e-9)
    // term → partition bucket, evaluated driver-side — no job
    val buckets = terms.map(termBucket).distinct
    val dfMap = readDf(spark, dir, terms, buckets, active)
    val idf = terms.map { t =>
      val df = math.max(dfMap.getOrElse(t, 0.0), 0.0)
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }
    val posts = activePostings(spark, dir, active, commits,
      col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
    val pivoted = posts.groupBy(col("doc_id")).agg(
      max(col("dl")).as("dl"),
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === t, col("tf")).otherwise(lit(0.0)))
          .as(s"tf$i")
      }: _*)
    val score = terms.indices.map { i =>
      val tfc = col(s"tf$i") * lit(k1 + 1) /
        (col(s"tf$i") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl)))
      // zero-tf slots guarded like the scan tier's (0/0 at k1 = 0)
      lit(idf(i)) * when(col(s"tf$i") > 0, tfc).otherwise(lit(0.0))
    }.reduce(_ + _)
    pivoted.select(col("doc_id"), score.as("score"))
  }

  /** Top-k BM25 over a persisted index with MAX-IMPACT PRUNING — exact
    * scores, sub-full-scoring cost (round 17; the r15/r16 verdicts'
    * carried stretch item). Doc-at-a-time WAND is inexpressible at Spark
    * scan granularity (PERF_NOTES §30), but its bound carries over to
    * scan-at-a-time: postings are IMPACT-ORDERED within each term (build
    * sorts by (term, impact desc)), so a pushed `impact >= θ` filter
    * skips whole row groups of low-impact postings via their min/max
    * stats, and the per-term `max_impact` in the df table bounds what
    * the skipped rows could have contributed.
    *
    * The stored impact was computed at the GENERATION's own avgdl A and
    * the build defaults (K1, B) = ([[ImpactK1]], [[ImpactB]]); a query at
    * ANY (k1', b') with the current avgdl is bounded through one
    * conversion constant (round 18 — generalizing the r17 default-only
    * bound). Write the saturation denominators as affine functions of dl:
    *   stored:  I = tf/(tf + D),  D  = K1(1−B)      + (K1·B/A)·dl
    *   query:       tfc'/(k1'+1) = tf/(tf + D'), D' = k1'(1−b') + (k1'·b'/avgdl_now)·dl
    * For c = min( k1'(1−b') / (K1(1−B)),  k1'·b'·A / (K1·B·avgdl_now) )
    * both affine coefficients of D' dominate c× those of D, so
    * D' ≥ c·D for every dl ≥ 0, hence (substituting D = tf(1−I)/I)
    *   tfc'/(k1'+1) ≤ tf/(tf + c·D) = I / (c + (1−c)·I)  (and ≤ 1).
    * Across generations the conservative A is the smallest per-gen avgdl
    * (aMin). At the defaults this reduces to the r17 bound exactly
    * (c = aMin/avgdl_now, I/(c+(1−c)I) ≤ I·avgdl_now/aMin). The bound is
    * vacuous — c = 0 — when k1' = 0, b' = 0, or b' = 1 (the dl term or
    * the constant term vanishes and the stored impact can no longer cap
    * the query's saturation); those parameters take the full-scoring
    * fallback, loudly. Algorithm, exact by construction:
    *  1. phase A reads only postings with impact ≥ θ (row-group skipped):
    *     every (doc, term) pair is atomic — seen pairs contribute their
    *     EXACT score term; unseen pairs are bounded by
    *     idf·(k1+1)·min(1, θ·bf, max_impact_t·bf);
    *  2. docs NOT seen at all are bounded by U0 = Σ_t that bound; the
    *     kth-largest LOWER bound L_k among seen docs must beat U0, else
    *     θ lowers and phase A re-runs (≤3 tries, then full fallback);
    *  3. the candidate set C = {seen docs with upper ≥ L_k − tieMargin}
    *     is re-scored EXACTLY (phase B: same pruned term slices, doc_id
    *     IN-set filter, no aggregation shuffle — C is collected);
    *  4. the final top-k (plus `tieMargin` ties for deterministic
    *     rounded-boundary callers) selects by exact score.
    * At corpus scale the win is twofold: phase A's IO is the high-impact
    * row groups only, and nothing corpus-sized ever shuffles — full
    * scoring's per-doc aggregation moves every matching doc.
    *
    * Falls back to full scoring (identical results) when: degenerate
    * (k1, b) — k1 = 0, b = 0, or b = 1, see above; any active generation
    * predates the impact format (pfmt<2 markers — compaction upgrades
    * them); bounds fail to converge; or candidates exceed
    * [[MaxTopKCandidates]]. Every fallback logs its reason to stderr and
    * stamps [[lastTopKPath]] (spec/telemetry hook). */
  def bm25IndexedTopK(spark: SparkSession, dir: String, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      tieMargin: Double = 0.0): DataFrame = {
    require(terms.nonEmpty, "bm25 requires at least one query term")
    require(k >= 1, s"k must be >= 1, got $k")
    // telemetry belongs to THIS call: a fallback or early return must
    // not leave a previous pruned call's numbers for Bench/profiles
    lastTopKScan = (0L, 0L, 0L)
    lastTopKPath = ""
    import spark.implicits._
    def fromPairs(rows: Seq[(Long, Double)]): DataFrame =
      rows.toDF("doc_id", "score")
    def fallback(reason: String): DataFrame = {
      lastTopKPath = s"fallback:$reason"
      System.err.println(s"[graft] bm25IndexedTopK: impact pruning " +
        s"unavailable ($reason) under $dir — full scoring (same answer)")
      fullFallback()
    }
    def fullFallback(): DataFrame = {
      val scored = bm25Indexed(spark, dir, terms, k1, b)
      val top = scored.orderBy(col("score").desc, col("doc_id"))
        .limit(k).collect()
      if (top.isEmpty) return fromPairs(Nil)
      val kth = top.last.getDouble(1)
      scored.where(col("score") >= kth - tieMargin)
    }
    val commits = readCommits(dir)
    val active = activeOf(commits)
    val activeSet = active.toSet
    // per-generation impact reference A = that gen's own dl_sum/n; the
    // conservative global conversion factor uses the SMALLEST A —
    // tombstones (negative n) have no postings and are excluded. Rides
    // the SAME cached stats read as N/avgdl — zero extra jobs.
    val (n, avgdl0, aMin) = readStats(spark, dir, active)
    if (n == 0.0) return fromPairs(Nil)
    // a DUPLICATED query term double-counts in the pivot tier (one
    // contribution per term position) but would fill one tf slot here —
    // the full path is the semantics, so duplicates take the fallback
    if (terms.distinct.length != terms.length)
      return fallback("duplicate query term")
    if (commits.exists(c => activeSet(c.gen) && c.pfmt < 2))
      return fallback("format-1 generation (pre-impact; compact to upgrade)")
    val avgdl = math.max(avgdl0, 1e-9)
    if (aMin <= 0.0) return fallback("no positive per-generation avgdl")
    // the (k1', b') conversion constant of the scaladoc's bound proof;
    // c = 1 when nothing drifted and the query runs at the build defaults
    val convC = math.min(
      k1 * (1 - b) / (ImpactK1 * (1 - ImpactB)),
      k1 * b * aMin / (ImpactK1 * ImpactB * avgdl))
    if (!(convC > 1e-9))
      return fallback(s"degenerate (k1=$k1, b=$b) — the stored impact " +
        "cannot bound this query's saturation")
    // stored impact v caps the query-parameter saturation at g(v) ≤ 1
    def gBound(v: Double): Double =
      if (v <= 0.0) 0.0
      else math.min(1.0, v / (convC + (1.0 - convC) * v))
    val buckets = terms.map(termBucket).distinct
    // df + per-term max impact, pruned — launched CONCURRENTLY with phase
    // A's first scan (neither depends on the other; both are tiny-result
    // jobs, and at small corpora the per-job fixed latency is the whole
    // cost of this path)
    val dfTask = new java.util.concurrent.FutureTask(() =>
      spark.read.schema(dfSchema).parquet(s"$dir/df")
        .where(col("gen").isin(active: _*) &&
          col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
        .groupBy("term").agg(sum("df").as("df"),
          max("max_impact").as("mi"))
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), if (r.isNullAt(2)) 1.0 else r.getDouble(2))).toMap)
    val dfThread = new Thread(dfTask, "graft-bm25-topk-df")
    dfThread.setDaemon(true)
    dfThread.start()
    // both phases collect RAW (doc_id, term, tf, dl) rows — CollectLimit
    // scans with NO aggregation shuffle; scoring runs on the driver in
    // the SAME fixed term order as the pivot tier's expression, so the
    // floating-point arithmetic agrees bit-for-bit with bm25Indexed
    def rawScan(cond: Column, max: Int): Array[org.apache.spark.sql.Row] = {
      // take(max) alone runs CollectLimit's INCREMENTAL rounds (1, then 4,
      // 16… partitions — a job per round); forcing the initial round to
      // cover every partition keeps the row cap at ONE job. The set +
      // restore is serialized across THIS module's queries (limitConfLock)
      // so two concurrent top-k calls cannot torn-restore the session
      // conf; other concurrent session users see the brief override, the
      // same trade GateStore.withInPushdown already makes.
      val key = "spark.sql.limit.initialNumPartitions"
      limitConfLock.synchronized {
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, "100000")
        try activePostings(spark, dir, active, commits,
          col("bucket").isin(buckets: _*) && col("term").isin(terms: _*) && cond)
          .select(col("doc_id"), col("term"), col("tf"), col("dl"))
          .take(max)
        finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }
    }
    val termIdx = terms.zipWithIndex.toMap
    def tfVectors(rows: Array[org.apache.spark.sql.Row])
        : java.util.LinkedHashMap[Long, (Double, Array[Double])] = {
      val m = new java.util.LinkedHashMap[Long, (Double, Array[Double])]()
      rows.foreach { r =>
        val e = m.computeIfAbsent(r.getLong(0),
          _ => (r.getDouble(3), new Array[Double](terms.length)))
        // += not =: the pivot tier SUMS tf over rows, so a duplicated
        // (term, doc) pair (an append-contract violation) degrades both
        // tiers identically instead of diverging
        e._2(termIdx(r.getString(1))) += r.getDouble(2)
      }
      m
    }
    def tfcOf(tf: Double, dl: Double): Double =
      tf * (k1 + 1) / (tf + k1 * ((1 - b) + b * dl / avgdl))
    // fixed term-order left fold — the pivot expression's exact shape
    def scoreOf(dl: Double, tfs: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < terms.length) {
        s += idfArr(i) * tfcOf(tfs(i), dl)
        i += 1
      }
      s
    }
    lazy val dfRows = dfTask.get()
    lazy val idfArr: Array[Double] = terms.map { t =>
      val df = math.max(dfRows.get(t).map(_._1).getOrElse(0.0), 0.0)
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }.toArray
    lazy val mi: Array[Double] =
      // a term with NO df rows has no postings anywhere — its cap is 0
      terms.map(t => dfRows.get(t).map(_._2).getOrElse(0.0)).toArray
    // θ is PER TERM (round 18 — a single global θ cannot prune a
    // frequent low-idf term's tf=1 tail whenever the true kth score sits
    // below the all-terms cap, the no-co-occurrence shape ProfileBm25Scale
    // exposed): round 1 scans everything at θ_t = 0.5 — an ABSOLUTE
    // start (impact ∈ (0,1]; 0.5 ≈ the tf=1 saturation point at average
    // dl), not derived from max_impact, so the first scan launches
    // immediately and overlaps the df job. Failed rounds re-allocate by
    // EQUAL BUDGET: each term gets cap_t = 0.9·lk/|T|, i.e.
    // θ_t = g⁻¹(0.9·lk/(|T|·idf_t·(k1+1))) — low-idf (high-df) terms
    // receive the HIGHEST thresholds, which is exactly where the rows
    // are. θ_t only ever decreases (a rise can shrink the scan but never
    // helps convergence, and monotone-down keeps progress guaranteed);
    // the u0 < lk check re-gates soundness every round regardless.
    def gInv(y: Double): Double = convC * y / (1.0 - (1.0 - convC) * y)
    var thetas = Array.fill(terms.length)(0.5)
    var tries = 0
    while (tries < 3) {
      tries += 1
      val th = thetas.clone()
      val cond = terms.indices.map(i =>
        col("term") === terms(i) && col("impact") >= th(i)).reduce(_ || _)
      val rawA = rawScan(cond, MaxTopKScanRows + 1)
      if (rawA.length > MaxTopKScanRows)
        return fallback(s"theta-scan exceeded $MaxTopKScanRows rows")
      val perDoc = tfVectors(rawA)
      // degraded-case fast path (round 18): when the θ-scan collected
      // EVERY matching posting (Σ df rows — a corpus shape where the
      // query terms rarely co-occur, so no θ can prune: the unseen-doc
      // cap Σ idf·(k1+1)·g(θ) stays above the kth REAL score), the
      // per-doc vectors in hand are already complete — score them
      // exactly and return, skipping phase B and the convergence
      // machinery. Bounds soundness is moot: nothing was skipped.
      val matching = dfRows.values.map(v => math.max(v._1, 0.0)).sum.toLong
      if (rawA.length >= matching) {
        val exact = new scala.collection.mutable.ArrayBuffer[(Long, Double)]
        perDoc.forEach { (id, e) =>
          exact += ((id, scoreOf(e._1, e._2)))
          ()
        }
        lastTopKPath = "pruned"
        lastTopKScan = (rawA.length.toLong, 0L, matching)
        if (exact.isEmpty) return fromPairs(Nil)
        val kth = exact.map(_._2).sorted(Ordering[Double].reverse)
          .take(k).last
        return fromPairs(exact.filter(_._2 >= kth - tieMargin).toSeq)
      }
      def capOf(i: Int): Double =
        idfArr(i) * (k1 + 1) * gBound(math.min(th(i), mi(i)))
      val caps = terms.indices.map(capOf).toArray
      val u0 = caps.sum
      var lkSeen = -1.0
      if (perDoc.size >= k) {
        // lower = exact score over SEEN pairs (unseen tf slots are 0 and
        // contribute 0 — identical arithmetic to the full pivot); upper
        // adds each unseen term's cap
        val docs = new Array[(Long, Double, Double)](perDoc.size)
        var j = 0
        perDoc.forEach { (id, e) =>
          val lower = scoreOf(e._1, e._2)
          var up = lower
          var i = 0
          while (i < terms.length) {
            if (e._2(i) == 0.0) up += caps(i)
            i += 1
          }
          docs(j) = (id, lower, up)
          j += 1
        }
        val lowers = docs.map(_._2).sorted(Ordering[Double].reverse)
        val lk = lowers(k - 1)
        lkSeen = lk
        if (u0 < lk - tieMargin) {
          val cids = docs.filter(_._3 >= lk - tieMargin).map(_._1)
          if (cids.length > MaxTopKCandidates)
            return fallback(s"${cids.length} candidates > $MaxTopKCandidates")
          // phase B: the candidates' FULL tf vectors — same pruned term
          // slices, IN-set doc filter, still no shuffle
          val rawB = rawScan(col("doc_id").isInCollection(cids.toSeq),
            MaxTopKScanRows + 1)
          if (rawB.length > MaxTopKScanRows)
            return fallback(s"candidate re-scan exceeded $MaxTopKScanRows rows")
          val exact = new scala.collection.mutable.ArrayBuffer[(Long, Double)]
          tfVectors(rawB).forEach { (id, e) =>
            exact += ((id, scoreOf(e._1, e._2)))
            ()
          }
          val kth = exact.map(_._2).sorted(Ordering[Double].reverse)
            .take(k).last
          lastTopKPath = "pruned"
          // scan-volume telemetry: rows the two pruned phases actually
          // collected vs the matching postings full scoring reads (Σ df
          // of the queried terms — already on the driver, zero jobs)
          lastTopKScan = (rawA.length.toLong, rawB.length.toLong, matching)
          return fromPairs(exact.filter(_._2 >= kth - tieMargin).toSeq)
        }
      }
      // equal-budget re-allocation from the lk estimate (header comment);
      // /4 when no estimate exists (fewer than k docs seen)
      thetas = terms.indices.map { i =>
        val byBudget =
          if (lkSeen > 0) {
            val y = 0.9 * lkSeen / (terms.length * idfArr(i) * (k1 + 1))
            if (y > 0 && y < 1) gInv(y) else th(i) / 4.0
          } else th(i) / 4.0
        math.max(1e-4, math.min(byBudget, th(i)))
      }.toArray
    }
    fallback("theta bounds failed to converge in 3 tries")
  }

  /** Which path the LAST [[bm25IndexedTopK]] call on this JVM took —
    * "pruned" or "fallback:<reason>" (spec/telemetry hook; the fallback
    * is also logged to stderr when it fires). */
  @volatile private[graft] var lastTopKPath: String = ""

  /** (phase-A rows, phase-B rows, Σ matching df) of the last PRUNED
    * [[bm25IndexedTopK]] — what the bench's row-skip evidence reads. */
  @volatile private[graft] var lastTopKScan: (Long, Long, Long) = (0L, 0L, 0L)

  /** Phase-B candidate ceiling for [[bm25IndexedTopK]] — past it, the
    * bound isn't selective enough to beat full scoring; fall back. */
  val MaxTopKCandidates: Int = 65536

  /** Raw-row collect ceiling for the top-k phases (~40 B/row driver
    * heap); a θ-scan past it isn't selective enough to win. */
  val MaxTopKScanRows: Int = 400000

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
  def bm25IndexedMulti(spark: SparkSession,
      dir: String, queries: Map[String, Seq[String]],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && queries.values.forall(_.nonEmpty),
      "every query needs at least one term")
    val commits = readCommits(dir)
    val active = activeOf(commits)
    val (n, avgdl0, _) = readStats(spark, dir, active)
    import spark.implicits._
    if (n == 0.0)
      return Seq.empty[(String, Long, Double)].toDF("query", "doc_id", "score")
    val avgdl = math.max(avgdl0, 1e-9)
    val terms = queries.values.flatten.toSeq.distinct
    val buckets = terms.map(termBucket).distinct
    // per-term idf computed IN-PLAN from the pruned df slices (round 18):
    // the r17 spelling collected df to the driver first — a serial job
    // ahead of the scoring job every batch pays. As a broadcast-side
    // subplan the tiny df aggregation overlaps the postings scan instead
    // (broadcast exchanges build concurrently); N stays a driver literal
    // (readStats — cached per generation signature, zero jobs here).
    val dfAgg = spark.read.schema(dfSchema).parquet(s"$dir/df")
      .where(col("gen").isin(active: _*) &&
        col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
      .groupBy("term").agg(sum("df").as("df"))
    val qtPairs = queries.toSeq.flatMap { case (q, ts) =>
      ts.distinct.map(t => (q, t))
    }.toDF("query", "term")
    // tombstone generations can drive a term's summed df negative-to-zero
    // and an unmatched term has no df row at all — both clamp to 0, the
    // same arithmetic the driver-side idfOf used
    val dfc = greatest(coalesce(col("df"), lit(0.0)), lit(0.0))
    // (query, term, idf): one small broadcast side for the whole batch
    val qt = qtPairs.join(broadcast(dfAgg), Seq("term"), "left")
      .select(col("query"), col("term"),
        log(lit(1.0) + (lit(n) - dfc + lit(0.5)) / (dfc + lit(0.5)))
          .as("idf"))
    val posts = activePostings(spark, dir, active, commits,
      col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
    val tfc = col("tf") * lit(k1 + 1) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl)))
    posts.join(broadcast(qt), "term")
      .select(col("query"), col("doc_id"), (col("idf") * tfc).as("contrib"))
      .groupBy("query", "doc_id").agg(sum("contrib").as("score"))
  }

  /** Per-query TOP-K over the batch tier — the eval-harness shape
    * (thousands of queries × top-k) as ONE plan: [[bm25IndexedMulti]]'s
    * single pruned read + one (query, doc_id) aggregation, then a
    * per-query BOUNDED top-k AGGREGATE ([[graft.functions.BottomKAgg]]
    * over struct(−score, doc_id) — round 18; the r17 window rank moved
    * every matching doc to its query's partition before ranking, where
    * the O(k) aggregate ships at most k rows per map partition per query
    * into the final exchange: at corpus scale the last shuffle carries
    * O(queries × k × partitions) instead of O(matching docs)). Ranking
    * is (score DESC, doc_id) with ties beyond k dropped — the struct
    * ordering is lexicographic, so the kept set and its boundary
    * tie-break are IDENTICAL to the window spelling's row_number.
    * `scoreRounding` ≥ 0 ranks AND returns round(score, n) — the
    * deterministic boundary an oracle or a reproducible eval wants (FP
    * summation order makes raw scores engine-ambiguous in the last
    * ulps).
    *
    * A per-(query, term) impact PRUNE of the scoring pass (drop postings
    * whose contribution bound cannot reach the query's phase-A k-boundary
    * — the single-query tier's math vectorized over queries) was built,
    * proven result-identical, measured, and REVERTED in round 19: any
    * phase-A boundary estimate must RE-SCAN the matching postings (same
    * columns; term-major row groups give an impact predicate nothing to
    * skip), which costs about as much as the main scan, while the prune
    * only saves aggregation input — measured 1.4× SLOWER at sf0.1 and
    * 1.6× slower at a 1.5M-doc synthetic corpus at equal answers. The
    * single-query tier wins with the same math only because its phases
    * avoid all shuffles and collect ~k rows; a 50-query batch has no such
    * asymmetry. An impact-major physical postings layout would change the
    * trade, but that is a storage-format change, not an optimization. */
  def bm25IndexedMultiTopK(spark: SparkSession, dir: String,
      queries: Map[String, Seq[String]], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      scoreRounding: Int = -1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val scored0 = bm25IndexedMulti(spark, dir, queries, k1, b)
    val scored =
      if (scoreRounding < 0) scored0
      else scored0.withColumn("score", round(col("score"), scoreRounding))
    // smallest-k of (−score, doc_id) == top-k of (score DESC, doc_id);
    // double negation is exact in IEEE, so the returned score is the
    // aggregate's own value bit-for-bit
    val pair = struct(negate(col("score")).as("ns"), col("doc_id"))
    val topK = org.apache.spark.sql.GraftBridge.column(
      graft.functions.BottomKAgg(
        org.apache.spark.sql.GraftBridge.expression(pair), k)
        .toAggregateExpression()).as("__top")
    scored.groupBy("query").agg(topK)
      .select(col("query"), explode(col("__top")).as("__e"))
      .select(col("query"), col("__e.doc_id").as("doc_id"),
        negate(col("__e.ns")).as("score"))
  }

  /** Partition bucket of a term — the driver-side twin of the build's
    * `pmod(xxhash64(term), IndexBuckets)` column (seed 42). */
  private def termBucket(t: String): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(t,
        StringType)), 42L).eval(null)
    java.lang.Math.floorMod(h.asInstanceOf[Long], IndexBuckets.toLong).toInt
  }

  private val limitConfLock = new Object

  // (active-gen signature, N, avgdl, min per-generation avgdl) per index
  // dir — the last slot is the top-k impact conversion's reference aMin
  // (see bm25IndexedTopK)
  private val statsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Double, Double, Double)]()

  private def deleteRecursively(p: Path): Unit =
    graft.io.LocalStoreFs.deleteRecursively(p.toString)

  // One built index per (cacheKey, corpus fingerprint) — Verify/Bench
  // convenience: repeated queries against the same sf dir reuse the
  // build, which is the entire point of the tier. The FINGERPRINT keys
  // out a regenerated corpus at the same path (stale-index hazard).
  // Eviction only drops the CACHE ENTRY — the dir may still be reachable
  // through a path indexFor returned earlier (whose lazy DataFrames
  // execute later), so deleting it then would turn in-flight queries
  // into errors or, worse, a fresh read of the deleted dir into a
  // silent zero-row answer. Evicted dirs join the shutdown-hook sweep
  // instead: the temp-dir leak is bounded by the session's DISTINCT
  // corpora and reclaimed at exit.
  private val evictedIndexDirs =
    java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
  private val builtIndexes =
    new java.util.LinkedHashMap[String, String](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, String]): Boolean = {
        val evict = size() > 8
        if (evict) { evictedIndexDirs.add(e.getValue); () }
        evict
      }
    }
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      val dirs = builtIndexes.synchronized {
        builtIndexes.values().asScala.toSeq
      } ++ evictedIndexDirs.asScala
      dirs.foreach(d => try deleteRecursively(Paths.get(d))
        catch { case _: Throwable => () })
    }, "graft-bm25idx-clean"))
  }

  /** Identity of the corpus behind `docs`, from its input files' paths +
    * sizes + mtimes (plan hash for file-less in-memory frames) — cheap,
    * driver-side, and different whenever the data could be. */
  private def corpusFingerprint(docs: DataFrame): String = {
    val files = docs.inputFiles.sorted
    if (files.isEmpty)
      return "p" + docs.queryExecution.logical.semanticHash().toString
    val parts = files.map { f =>
      val p =
        try Paths.get(new java.net.URI(f))
        catch { case _: Throwable => Paths.get(f) }
      val (sz, mt) =
        try (Files.size(p), Files.getLastModifiedTime(p).toMillis)
        catch { case _: Throwable => (0L, 0L) }
      s"$f:$sz:$mt"
    }
    "f" + scala.util.hashing.MurmurHash3.orderedHash(parts).toHexString
  }

  /** Path of a (possibly cached) index for `docs`, keyed by `cacheKey` +
    * the corpus fingerprint — a regenerated corpus at the same path gets
    * a fresh build, never stale scores. */
  def indexFor(docs: DataFrame, idCol: String, textCol: String,
      cacheKey: String): String = {
    val key = cacheKey + "#" + corpusFingerprint(docs)
    builtIndexes.synchronized {
      val hit = builtIndexes.get(key)
      if (hit != null) return hit
    }
    val dir = Files.createTempDirectory("graft_bm25idx").toString
    buildIndex(docs, idCol, textCol, dir)
    builtIndexes.synchronized {
      val raced = builtIndexes.get(key)
      if (raced != null) { deleteRecursively(Paths.get(dir)); raced }
      else { builtIndexes.put(key, dir); dir }
    }
  }
}
