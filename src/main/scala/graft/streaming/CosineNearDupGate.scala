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
    // are tolerated by the DISTINCTs downstream of every store read).
    // Stored at FLOAT precision — 4·dim bytes a row, the class contract —
    // and cast back to double for the exact-cosine verification; the
    // suppression threshold has float-scale slack by construction (a pair
    // at cosine within 1e-6 of the threshold is not a semantics the LSH
    // candidate stage resolves either way).
    GateStore.append(
      keyed.select(col(orderCol).as("id"),
        col("__v").cast("array<float>").as("v")),
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

  // driver-side exact-cosine, matching VectorExpressions.CosineSim:
  // length mismatch -> no pair (the expression returns null), zero norm
  // -> NaN -> comparison false
  private def cosOf(a: Array[Double], b: Array[Double]): Double = {
    if (a.length != b.length) return Double.NaN
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private[streaming] def onBatch(batch: DataFrame): Unit = synchronized {
    batches += 1
    val s = batch.sparkSession
    val obs = new org.apache.spark.sql.Observation(s"cosgate_${name}_$batches")
    val keyed = batch.drop("arrival_timestamp")
      .observe(obs, count(lit(1)).as("rows"))
      .withColumn("__v", expr(embSql).cast("array<double>"))
      .persist()
    try {
      // ONE bounded collect — (orderCol, vector) — and the suppression
      // decision runs on the driver: SRP keys derived with the same plane
      // draws as the stored index (AnnSearch.srpBucketKeysOf), the
      // occupancy cap reads the CMS as of batch START, the bloom is probed
      // in place, within-batch pairing is a hash-group + exact cosine over
      // the batch. Only the store-candidate work touches executors — a
      // file-range-pruned index read and a candidate-id-pruned vector
      // fetch, both collected and verified on the driver when their slices
      // are small, or joined distributed when not.
      val rows: Array[(Any, Array[Double])] =
        keyed.where(col("__v").isNotNull).select(col(orderCol), col("__v"))
          .collect().map(r => (r.get(0), r.getSeq[Double](1).toArray))
      val rowKeys: Array[Array[Long]] = rows.map(r =>
        graft.ops.AnnSearch.srpBucketKeysOf(r._2, dim, numTables, bitsPerTable, seed))
      val overCapSet: java.util.HashSet[java.lang.Long] = {
        val set = new java.util.HashSet[java.lang.Long]()
        if (bucketCounts != null) {
          val seen = new java.util.HashSet[java.lang.Long]()
          rowKeys.foreach(_.foreach { b =>
            if (seen.add(b) && bucketCounts.estimate(b) > maxBucketSize) set.add(b)
          })
        }
        set
      }
      // within-batch: group rows by under-cap bucket, exact-cosine within
      val suppressedSet = new java.util.HashSet[Any]()
      locally {
        val byBucket = new java.util.HashMap[java.lang.Long, java.util.ArrayList[Integer]]()
        var i = 0
        while (i < rows.length) {
          rowKeys(i).foreach { b =>
            if (!overCapSet.contains(b))
              byBucket.computeIfAbsent(b, _ => new java.util.ArrayList[Integer]()).add(i)
          }
          i += 1
        }
        byBucket.forEach { (_, list) =>
          if (list.size >= 2) {
            var a = 0
            while (a < list.size) {
              var b = a + 1
              while (b < list.size) {
                val (ia, ib) = (list.get(a), list.get(b))
                if (cosOf(rows(ia)._2, rows(ib)._2) >= threshold) {
                  if (GateStore.lt(rows(ia)._1, rows(ib)._1)) suppressedSet.add(rows(ib)._1)
                  else if (GateStore.lt(rows(ib)._1, rows(ia)._1)) suppressedSet.add(rows(ia)._1)
                }
                b += 1
              }
              a += 1
            }
          }
        }
      }
      val idxF = GateStore.storeFiles(idxDir)
      val embF = GateStore.storeFiles(embDir)
      // candidate rows: (bucket -> batch row indices) for bloom-positive
      // under-cap buckets
      val candByBucket =
        new java.util.HashMap[java.lang.Long, java.util.ArrayList[Integer]]()
      if (idxF.nonEmpty && embF.nonEmpty) {
        var i = 0
        while (i < rows.length) {
          rowKeys(i).foreach { b =>
            if (!overCapSet.contains(b) && bloom.contains(b))
              candByBucket.computeIfAbsent(b, _ => new java.util.ArrayList[Integer]()).add(i)
          }
          i += 1
        }
      }
      val hitKeys: Array[Long] = {
        val arr = new Array[Long](candByBucket.size)
        val it = candByBucket.keySet().iterator(); var k = 0
        while (it.hasNext) { arr(k) = it.next(); k += 1 }
        arr
      }
      val keyPush = hitKeys.length <= GateStore.MaxPushdownKeys
      val idxPaths =
        if (hitKeys.isEmpty) Array.empty[String]
        else if (keyPush) GateStore.pruned(idxF, hitKeys)
        else idxF.map(_.path)
      if (idxPaths.nonEmpty) {
        // phase 1: candidate (batch row, store id) pairs from the pruned
        // index — the vector bytes stay unread
        val idxRows: Array[(Long, Any)] = {
          val filtered =
            if (keyPush)
              s.read.parquet(idxPaths: _*)
                .where(GateStore.inSetCol(col("bucket"), hitKeys.toSeq))
            else {
              val all = s.read.parquet(idxPaths: _*)
              if (overCapSet.isEmpty) all
              else {
                val oc = overCapSet.toArray.toSeq.asInstanceOf[Seq[Any]]
                all.where(!GateStore.inSetCol(col("bucket"), oc))
              }
            }
          filtered.select(col("bucket"), col("id"))
            .collect().map(r => (r.getLong(0), r.get(1)))
        }
        // (store id -> batch row indices) candidate pairs, deduped
        val pairs = new java.util.HashMap[Any, java.util.HashSet[Integer]]()
        idxRows.foreach { case (b, idS) =>
          val cands = candByBucket.get(b)
          if (cands != null) {
            val set = pairs.computeIfAbsent(idS, _ => new java.util.HashSet[Integer]())
            var k = 0
            while (k < cands.size) { set.add(cands.get(k)); k += 1 }
          }
        }
        if (!pairs.isEmpty) {
          // phase 2: fetch ONLY the candidate vectors, id set pushed into
          // the scan; verify exact cosine on the driver
          val idArr = pairs.keySet().toArray
          val idPush = idArr.length <= GateStore.MaxPushdownKeys
          val embPaths =
            if (idPush && idArr.forall(_.isInstanceOf[Long]))
              GateStore.pruned(embF, idArr.map(_.asInstanceOf[Long]).sorted)
            else embF.map(_.path)
          if (embPaths.nonEmpty) {
            val vs0 = s.read.parquet(embPaths: _*)
            val vs = if (idPush) vs0.where(GateStore.inSetCol(col("id"), idArr.toSeq)) else vs0
            vs.select(col("id"), col("v").cast("array<double>"))
              .collect().foreach { r =>
                val cands = pairs.get(r.get(0))
                if (cands != null) {
                  val vS = r.getSeq[Double](1).toArray
                  cands.forEach { i =>
                    if (cosOf(rows(i)._2, vS) >= threshold)
                      suppressedSet.add(rows(i)._1)
                    ()
                  }
                }
              }
          }
        }
      }
      val total = obs.get("rows").asInstanceOf[Long]
      val n = total - suppressedSet.size
      admitted += n
      suppressed += total - n
      // sink BEFORE store append (at-least-once under failure-retry —
      // see StreamDedupGate's delivery contract); null embeddings can't
      // pair and are not stored
      if (n > 0) {
        val survivors =
          (if (suppressedSet.isEmpty) keyed
           else keyed.where(col(orderCol).isNull ||
             !GateStore.inSetCol(col(orderCol), suppressedSet.toArray.toSeq)))
            .drop("__v")
        eng.insertInto(sink, survivors)
      }
      appendStores(keyed.where(col("__v").isNotNull))
      updateFilters(rowKeys.flatten)
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
