package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cv.ContViewEngine
import graft.functions.{GraftFunctions, VectorExpressions}
import graft.ops.AnnSearch
import graft.sketch.BloomFilter

/** Streaming embedding near-duplicate gate — the third member of the dedup
  * triad (exact: [[StreamDedupGate]], text: [[SimHashNearDupGate]]): a
  * document is forwarded iff no earlier document's embedding scores cosine
  * ≥ `threshold` against it. Suppression is "seen"-based (every arrival
  * suppresses later ones whether or not it was admitted), so the admitted
  * set is single-shot recomputable: admitted(d) ⇔ no earlier d' with
  * cos(d, d') ≥ threshold — which is exactly what the DuckDB oracle brute-
  * forces. `orderCol` must be unique per stream (same contract as the
  * sibling gates): in-batch pairing orders rows by it, and survivors are
  * anti-joined on it, so two rows sharing a value would neither suppress
  * each other nor survive independently.
  *
  * RECALL CONTRACT — probabilistic, unlike [[SimHashNearDupGate]]'s
  * banding guarantee: candidates come from seeded signed-random-projection
  * LSH (bucket keys deterministic in (dim, numTables, bitsPerTable, seed),
  * so restarts re-derive them from config alone), and a true near-pair at
  * cosine exactly `threshold` collides in at least one of the `numTables`
  * tables with probability 1-(1-(1-acos(threshold)/π)^bitsPerTable)^numTables.
  * At the designed operating point (threshold ≥ 0.97 on the defaults) that
  * is ≥ 0.95 — and ≥ 0.999 at 0.99 — but at looser thresholds recall
  * decays and near-pairs can be falsely ADMITTED. [[CosineNearDupGate.create]]
  * (and therefore the `cosine_gate(...)` DDL) computes the estimate and
  * warns loudly when it falls below 0.95; raise `numTables` or lower
  * `bitsPerTable` to buy recall with wall-clock. Exact cosine verifies
  * every candidate, so false bucket collisions cost wall-clock, never
  * correctness.
  *
  * State is split so per-batch cost tracks the batch, not the corpus:
  *  - `seen_keys`: the (bucket, id) LSH index, appended sorted by bucket
  *    and compacted into bucket-range shards — the per-batch candidate
  *    join reads only the shards/rows matching the batch's bloom-positive
  *    keys ([[GateStore.pruned]] + in-set filter);
  *  - `seen_embs`: the compact (id, embedding) store (4·dim bytes a row,
  *    never duplicated per table) — read ONLY for the candidate ids the
  *    index join surfaced, pushed down as an id in-set (+ file-range prune
  *    when ids are numeric).
  * A driver bloom over all bucket keys ever seen lets fresh-content
  * batches skip both stores; compaction regrows it when the corpus
  * outgrows its design size. The hot-bucket occupancy cap
  * (`maxBucketSize`, CMS-tracked exactly like [[SimHashNearDupGate]])
  * guards the degenerate-flood hazard — millions of boilerplate
  * embeddings sharing buckets — at the same documented recall trade:
  * pairs colliding ONLY in flooded buckets are missed.
  */
final class CosineNearDupGate private (
    eng: ContViewEngine,
    val name: String,
    embSql: String,
    orderCol: String,
    sink: String,
    embDir: Path,
    idxDir: Path,
    threshold: Double,
    dim: Int,
    numTables: Int,
    bitsPerTable: Int,
    seed: Long,
    bloomP: Double,
    bloomN0: Int,
    maxBucketSize: Int,
    compactEvery: Int) {

  private var bloom = BloomFilter.empty(bloomP, bloomN0)
  private var bloomN = bloomN0
  // see SimHashNearDupGate: occupancy as of batch START, overestimate-only
  private val bucketCounts: graft.sketch.CountMinSketch =
    if (maxBucketSize == Int.MaxValue) null
    else graft.sketch.CountMinSketch.empty()
  private var batches = 0L
  private var admitted = 0L
  private var suppressed = 0L

  /** (batches, admitted survivors, suppressed near-duplicates) so far. */
  def stats: (Long, Long, Long) = synchronized((batches, admitted, suppressed))

  private def keysOf(v: org.apache.spark.sql.Column) =
    AnnSearch.srpBucketKeys(v, dim, numTables, bitsPerTable, seed)

  private[streaming] def bootstrap(): Unit = synchronized {
    val files = GateStore.files(idxDir)
    if (files.nonEmpty) {
      val keys = eng.spark.read.parquet(files: _*).select(col("bucket"))
      val row =
        if (bucketCounts == null)
          keys.agg(GraftFunctions.bloom_agg(col("bucket"), bloomP, bloomN).as("b"))
            .collect()(0)
        else
          keys.agg(GraftFunctions.bloom_agg(col("bucket"), bloomP, bloomN).as("b"),
            GraftFunctions.freq_agg(col("bucket")).as("c")).collect()(0)
      bloom.union(BloomFilter.deserialize(row.getAs[Array[Byte]]("b")))
      if (bucketCounts != null)
        bucketCounts.merge(
          graft.sketch.CountMinSketch.deserialize(row.getAs[Array[Byte]]("c")))
      batches = GateStore.maxBatch(embDir, "embs")
    }
  }

  /** Append pre-embedded rows straight into the seen-stores (bloom/CMS
    * updated, nothing forwarded) — the scale-probe's seeding hook. */
  private[graft] def seedStore(rows: DataFrame): Unit = synchronized {
    batches += 1
    val keyed = rows.withColumn("__v", expr(embSql).cast("array<double>"))
      .where(col("__v").isNotNull)
      .persist()
    try {
      appendStores(keyed)
      updateFilters(collectBuckets(keyed))
    } finally { keyed.unpersist(); () }
  }

  private def appendStores(keyed: DataFrame): Unit = {
    // embeddings first, index second: a crash in between leaves vectors
    // with no index entry, which the batch's retry re-appends (duplicates
    // are tolerated by the DISTINCTs downstream of every store read)
    GateStore.append(
      keyed.select(col(orderCol).as("id"), col("__v").as("v")),
      embDir, "embs", batches, sortCol = Some("id"))
    GateStore.append(
      keyed.select(explode(keysOf(col("__v"))).as("bucket"),
        col(orderCol).as("id")),
      idxDir, "keys", batches, sortCol = Some("bucket"))
  }

  /** Driver-side filter update from the batch's collected bucket keys
    * (with multiplicity, for the CMS) — the filters never ship to
    * executors; see SimHashNearDupGate.updateFilters. */
  private def updateFilters(buckets: Array[Long]): Unit = {
    var i = 0
    val seen = new java.util.HashSet[java.lang.Long]()
    while (i < buckets.length) {
      val b = buckets(i)
      if (seen.add(b)) bloom.add(b)
      if (bucketCounts != null) bucketCounts.add(b)
      i += 1
    }
  }

  private def collectBuckets(keyed: DataFrame): Array[Long] =
    keyed.where(col("__v").isNotNull)
      .select(explode(keysOf(col("__v"))).as("bucket"))
      .collect().map(_.getLong(0))

  private[streaming] def onBatch(batch: DataFrame): Unit = synchronized {
    batches += 1
    val s = batch.sparkSession
    val obs = new org.apache.spark.sql.Observation(s"cosgate_${name}_$batches")
    val keyed = batch.drop("arrival_timestamp")
      .observe(obs, count(lit(1)).as("rows"))
      .withColumn("__v", expr(embSql).cast("array<double>"))
      .persist()
    try {
      // one bounded collect of the batch's bucket keys feeds the cap, the
      // bloom probe and the filter update — all driver-side (see
      // SimHashNearDupGate for the rationale)
      val buckets = collectBuckets(keyed)
      val distinctBuckets = buckets.distinct
      val overCap: Array[Long] =
        if (bucketCounts == null) Array.emptyLongArray
        else distinctBuckets.filter(b => bucketCounts.estimate(b) > maxBucketSize)
      val overCapSet = overCap.toSet
      val allKeys = keyed.select(col(orderCol).as("__id"), col("__v"),
        explode(keysOf(col("__v"))).as("bucket"))
      val bkeys =
        if (overCap.isEmpty) allKeys
        else allKeys.where(!GateStore.inSetCol(col("bucket"), overCap.toSeq))
      // an in-batch pair needs a bucket occurring at least TWICE in this
      // batch; the driver holds the multiset, so the self-join runs only
      // over those buckets (an all-fresh batch skips the shuffle entirely)
      val counts = new java.util.HashMap[java.lang.Long, Integer]()
      buckets.foreach(b => counts.merge(b, 1, (a, x) => a + x))
      val multiBuckets = distinctBuckets
        .filter(b => counts.get(b) >= 2 && !overCapSet.contains(b))
      val inBatch =
        if (multiBuckets.isEmpty) allKeys.select(col("__id")).limit(0)
        else {
          val mkeys = bkeys.where(GateStore.inSetCol(col("bucket"), multiBuckets.toSeq))
          val l = mkeys.select(col("bucket"), col("__id").as("id_l"), col("__v").as("v_l"))
          val r = mkeys.select(col("bucket"), col("__id").as("id_r"), col("__v").as("v_r"))
          l.join(r, Seq("bucket"))
            .where(col("id_l") < col("id_r") &&
              VectorExpressions.cosineSim(col("v_l"), col("v_r")) >= threshold)
            .select(col("id_r").as("__id"))
        }
      val idxF = GateStore.storeFiles(idxDir)
      val embF = GateStore.storeFiles(embDir)
      val hitKeys: Array[Long] =
        if (idxF.isEmpty) Array.emptyLongArray
        else distinctBuckets.filter(b => !overCapSet.contains(b) && bloom.contains(b))
      val keyPush = hitKeys.length <= GateStore.MaxPushdownKeys
      val idxPaths =
        if (hitKeys.isEmpty || embF.isEmpty) Array.empty[String]
        else if (keyPush) GateStore.pruned(idxF, hitKeys)
        else idxF.map(_.path)
      val fromStore =
        if (idxPaths.isEmpty) inBatch.limit(0)
        else {
          val hit =
            if (keyPush) bkeys.where(GateStore.inSetCol(col("bucket"), hitKeys.toSeq))
            else bkeys
          // phase 1: candidate ids from the pruned (bucket, id) index —
          // the embedding bytes stay unread
          val idx0 =
            if (keyPush)
              s.read.parquet(idxPaths: _*)
                .where(GateStore.inSetCol(col("bucket"), hitKeys.toSeq))
            else {
              val all = s.read.parquet(idxPaths: _*)
              if (overCap.isEmpty) all
              else all.where(!GateStore.inSetCol(col("bucket"), overCap.toSeq))
            }
          val idx = idx0.select(col("bucket"), col("id").as("id_s"))
          val candPairs = hit.select(col("bucket"), col("__id"))
            .join(idx, Seq("bucket"))
            .select(col("__id"), col("id_s")).distinct()
          // phase 2: fetch ONLY the candidate vectors, id set pushed into
          // the embedding scan when bounded
          val idArr = candPairs.select("id_s").distinct().collect().map(_.get(0))
          val idPush = idArr.length <= GateStore.MaxPushdownKeys
          val embPaths =
            if (idArr.isEmpty) Array.empty[String]
            else if (idPush && idArr.forall(_.isInstanceOf[Long]))
              GateStore.pruned(embF, idArr.map(_.asInstanceOf[Long]).sorted)
            else embF.map(_.path)
          if (embPaths.isEmpty) inBatch.limit(0)
          else {
            val vs0 = s.read.parquet(embPaths: _*)
            val vs = if (idPush) vs0.where(GateStore.inSetCol(col("id"), idArr.toSeq)) else vs0
            val batchVs = keyed.select(col(orderCol).as("__id"), col("__v"))
            candPairs
              .join(vs.select(col("id").as("id_s"), col("v").as("v_s")), Seq("id_s"))
              .join(batchVs, Seq("__id"))
              .where(VectorExpressions.cosineSim(col("__v"), col("v_s")) >= threshold)
              .select(col("__id"))
          }
        }
      val suppressedIds = inBatch.unionByName(fromStore).distinct()
        .withColumnRenamed("__id", orderCol)
      val survivors = keyed.join(suppressedIds, Seq(orderCol), "left_anti")
        .drop("__v").persist()
      try {
        val n = survivors.count()
        admitted += n
        suppressed += obs.get("rows").asInstanceOf[Long] - n
        // sink BEFORE store append (at-least-once under failure-retry —
        // see StreamDedupGate's delivery contract); null embeddings can't
        // pair and are not stored
        if (n > 0) eng.insertInto(sink, survivors)
        appendStores(keyed.where(col("__v").isNotNull))
        updateFilters(buckets)
      } finally survivors.unpersist()
    } finally keyed.unpersist()
    if (compactEvery > 0 && batches % compactEvery == 0) compact()
  }

  /** Fold the per-batch files of both stores — the index into bucket-range
    * shards, the embeddings into id-range shards — and regrow the driver
    * bloom when the index outgrew its design size. Crash-safe without a
    * manifest (duplicated rows change nothing: suppressor hits deduplicate
    * through the DISTINCTs). */
  def compact(): Unit = synchronized {
    GateStore.compact(eng.spark, embDir, "embs", Seq("id", "v"), batches,
      sortCol = Some("id"))
    val n = GateStore.compact(eng.spark, idxDir, "keys", Seq("bucket", "id"),
      batches, sortCol = Some("bucket"))
    if (n > bloomN) {
      bloomN = math.min(Int.MaxValue.toLong,
        math.max(bloomN.toLong * 4, n * 2)).toInt
      System.err.println(s"[graft] CosineNearDupGate($name): index at $n keys " +
        s"outgrew the bloom design size; regrowing filter to n=$bloomN")
      bloom = BloomFilter.empty(bloomP, bloomN)
      bloom.union(BloomFilter.deserialize(
        eng.spark.read.parquet(GateStore.files(idxDir): _*)
          .agg(GraftFunctions.bloom_agg(col("bucket"), bloomP, bloomN).as("b"))
          .collect()(0).getAs[Array[Byte]]("b")))
    }
  }
}

object CosineNearDupGate {

  /** Structural-recall estimate for a true pair at cosine exactly
    * `threshold`: 1-(1-p_bit^bits)^tables with p_bit = 1-acos(t)/π
    * (Charikar SRP collision probability). Pairs ABOVE the threshold
    * collide more often, so this is the floor. */
  def recallEstimate(threshold: Double, numTables: Int, bitsPerTable: Int): Double = {
    val pBit = 1.0 - math.acos(math.max(-1.0, math.min(1.0, threshold))) / math.Pi
    1.0 - math.pow(1.0 - math.pow(pBit, bitsPerTable), numTables)
  }

  /** Register a cosine near-dup gate on `eng`: a continuous transform
    * reading `selectSql` (must project `orderCol`, which must be UNIQUE
    * per stream; `embSql` names the embedding column) whose
    * not-similar-to-anything-earlier survivors are forwarded to stream
    * `sink` (embedding column dropped from the payload the gate adds —
    * the original columns pass through unchanged).
    *
    * Recall is PROBABILISTIC in (threshold, numTables, bitsPerTable) —
    * see the class scaladoc. A configuration whose structural-recall
    * floor at `threshold` falls below 0.95 is accepted (the caller may
    * knowingly trade recall for wall-clock) but warned about loudly on
    * stderr, with the computed estimate, so a DDL user can't silently get
    * under-suppression.
    */
  def create(eng: ContViewEngine, name: String, selectSql: String,
      embSql: String, orderCol: String, sink: String, storeRoot: String,
      threshold: Double, dim: Int,
      numTables: Int = 8, bitsPerTable: Int = 12, seed: Long = 42L,
      bloomP: Double = 0.01, bloomN: Int = 1 << 20,
      maxBucketSize: Int = Int.MaxValue,
      compactEvery: Int = 256): CosineNearDupGate = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"cosine gate threshold must be in (0, 1], got $threshold")
    val recall = recallEstimate(threshold, numTables, bitsPerTable)
    if (recall < 0.95)
      System.err.println(f"[graft] CosineNearDupGate($name%s): structural " +
        f"recall at threshold=$threshold%.3f with numTables=$numTables%d, " +
        f"bitsPerTable=$bitsPerTable%d is ~$recall%.3f — near-pairs at the " +
        "threshold may be falsely admitted; raise numTables or lower " +
        "bitsPerTable to restore recall")
    val embDir = Paths.get(storeRoot, name, "seen_embs")
    val idxDir = Paths.get(storeRoot, name, "seen_keys")
    Files.createDirectories(embDir)
    Files.createDirectories(idxDir)
    val gate = new CosineNearDupGate(eng, name, embSql, orderCol, sink,
      embDir, idxDir, threshold, dim, numTables, bitsPerTable, seed,
      bloomP, bloomN, maxBucketSize, compactEvery)
    gate.bootstrap()
    eng.createContTransform(name, selectSql,
      outputFunc = Some(gate.onBatch _), emitChanges = false)
    // a catalog-replayed transform is bare (no callback) — re-attach
    eng.rebindTransformOutput(name, gate.onBatch _)
    gate
  }
}
