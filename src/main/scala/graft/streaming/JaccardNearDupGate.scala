package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cv.ContViewEngine
import graft.functions.GraftFunctions
import graft.ops.{MinHashLsh, TextOps}
import graft.sketch.BloomFilter

/** Streaming MinHash/Jaccard near-duplicate gate — the fourth member of
  * the dedup gate family (exact: [[StreamDedupGate]], Hamming:
  * [[SimHashNearDupGate]], embedding: [[CosineNearDupGate]]), and the
  * incremental form of the batch `q_minhash_neardup` operator: a document
  * is forwarded iff no earlier document's shingle set estimates Jaccard ≥
  * `threshold` against it. Suppression is "seen"-based (every arrival
  * suppresses later ones whether or not it was admitted), so the admitted
  * set is single-shot recomputable. `orderCol` must be unique per stream
  * (shared gate contract).
  *
  * SIMILARITY CONTRACT — estimate-based, unlike the batch operator: the
  * batch pipeline re-joins document text to verify exact Jaccard on
  * candidates, but a streaming gate never stores text (the state is
  * signatures only, 8·k bytes/doc), so verification is the MinHash
  * estimate itself: the fraction of agreeing signature components, whose
  * standard error is ~sqrt(j(1-j)/k) (≤0.063 at k=64) — a doc at true
  * Jaccard just below the threshold can be suppressed and vice versa, a
  * banding-independent property of every signature-only system. Exact
  * copies estimate 1.0 and are always suppressed. Banding recall for a
  * pair at estimated similarity j is 1-(1-j^rowsPerBand)^numBands
  * (the classic S-curve); [[JaccardNearDupGate.create]] (and the
  * `jaccard_gate(...)` DDL) computes the floor at `threshold` and warns
  * loudly below 0.95.
  *
  * State layout, filters, delivery, compaction, restart: identical to
  * [[CosineNearDupGate]] — `seen_keys` (bucket, id) band-key index in
  * range shards joined first, `seen_sigs` (id, sig) read only for
  * surfaced candidate ids, driver-resident bloom/CMS fed by one bounded
  * per-batch key collect, bloom regrow at compaction, at-least-once
  * delivery (sink before store append), bootstrap from the persisted
  * index.
  */
final class JaccardNearDupGate private (
    eng: ContViewEngine,
    val name: String,
    textSql: String,
    orderCol: String,
    sink: String,
    sigDir: Path,
    idxDir: Path,
    threshold: Double,
    shingleN: Int,
    numBands: Int,
    rowsPerBand: Int,
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

  private def sigOf(text: org.apache.spark.sql.Column) =
    MinHashLsh.minhashSignature(
      TextOps.shingles(text, shingleN), numBands * rowsPerBand)

  private def keysOf(sig: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftBridge.column(MinHashLsh.MinHashBuckets(
      org.apache.spark.sql.GraftBridge.expression(sig), numBands, rowsPerBand))

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
      batches = GateStore.maxBatch(sigDir, "sigs")
    }
  }

  /** Append pre-signed rows straight into the seen-stores (bloom/CMS
    * updated, nothing forwarded) — the scale-probe's seeding hook. */
  private[graft] def seedStore(rows: DataFrame): Unit = synchronized {
    batches += 1
    val keyed = rows.withColumn("__sig", sigOf(expr(textSql)))
      .where(col("__sig").isNotNull)
      .persist()
    try {
      appendStores(keyed)
      updateFilters(collectBuckets(keyed))
    } finally { keyed.unpersist(); () }
  }

  private def appendStores(keyed: DataFrame): Unit = {
    // signatures first, index second: a crash in between leaves signatures
    // with no index entry, which the batch's retry re-appends (duplicates
    // are tolerated by the DISTINCTs downstream of every store read)
    GateStore.append(
      keyed.select(col(orderCol).as("id"), col("__sig").as("sig")),
      sigDir, "sigs", batches, sortCol = Some("id"))
    GateStore.append(
      keyed.select(explode(keysOf(col("__sig"))).as("bucket"),
        col(orderCol).as("id")),
      idxDir, "keys", batches, sortCol = Some("bucket"))
  }

  /** Driver-side filter update — see SimHashNearDupGate.updateFilters. */
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
    keyed.where(col("__sig").isNotNull)
      .select(explode(keysOf(col("__sig"))).as("bucket"))
      .collect().map(_.getLong(0))

  // driver-side signature agreement, matching MinHashLsh.sigAgreeEval
  private def agreeOf(a: Array[Long], b: Array[Long]): Double = {
    val n = math.min(a.length, b.length)
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / n
  }

  private[streaming] def onBatch(batch: DataFrame): Unit = synchronized {
    batches += 1
    val s = batch.sparkSession
    val obs = new org.apache.spark.sql.Observation(s"jacgate_${name}_$batches")
    val keyed = batch.drop("arrival_timestamp")
      .withColumn("__sig", sigOf(expr(textSql)))
      .observe(obs, count(lit(1)).as("rows"))
      .persist()
    try {
      // ONE bounded collect — (orderCol, signature), 8·k B/doc — and the
      // suppression decision runs on the driver: band keys derived with
      // the same math as the stored index (MinHashLsh.bandKeysOf), the
      // occupancy cap reads the CMS as of batch START, the bloom is probed
      // in place, within-batch pairing is a hash-group + agreement loop.
      // Only the store-candidate work touches executors — a file-range-
      // pruned index read and a candidate-id-pruned signature fetch, both
      // collected and verified on the driver (see CosineNearDupGate for
      // the shape).
      val rows: Array[(Any, Array[Long])] =
        keyed.where(col("__sig").isNotNull).select(col(orderCol), col("__sig"))
          .collect().map(r => (r.get(0), r.getSeq[Long](1).toArray))
      val rowKeys: Array[Array[Long]] = rows.map(r =>
        MinHashLsh.bandKeysOf(r._2, numBands, rowsPerBand))
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
                if (agreeOf(rows(ia)._2, rows(ib)._2) >= threshold) {
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
      val sigF = GateStore.storeFiles(sigDir)
      val candByBucket =
        new java.util.HashMap[java.lang.Long, java.util.ArrayList[Integer]]()
      if (idxF.nonEmpty && sigF.nonEmpty) {
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
          val idArr = pairs.keySet().toArray
          val idPush = idArr.length <= GateStore.MaxPushdownKeys
          val sigPaths =
            if (idPush && idArr.forall(_.isInstanceOf[Long]))
              GateStore.pruned(sigF, idArr.map(_.asInstanceOf[Long]).sorted)
            else sigF.map(_.path)
          if (sigPaths.nonEmpty) {
            val vs0 = s.read.parquet(sigPaths: _*)
            val vs = if (idPush) vs0.where(GateStore.inSetCol(col("id"), idArr.toSeq)) else vs0
            vs.select(col("id"), col("sig"))
              .collect().foreach { r =>
                val cands = pairs.get(r.get(0))
                if (cands != null) {
                  val sigS = r.getSeq[Long](1).toArray
                  cands.forEach { i =>
                    if (agreeOf(rows(i)._2, sigS) >= threshold)
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
      // see StreamDedupGate's delivery contract); null signatures can't
      // pair and are not stored
      if (n > 0) {
        val survivors =
          (if (suppressedSet.isEmpty) keyed
           else keyed.where(col(orderCol).isNull ||
             !GateStore.inSetCol(col(orderCol), suppressedSet.toArray.toSeq)))
            .drop("__sig")
        eng.insertInto(sink, survivors)
      }
      appendStores(keyed.where(col("__sig").isNotNull))
      updateFilters(rowKeys.flatten)
    } finally keyed.unpersist()
    if (compactEvery > 0 && batches % compactEvery == 0) compact()
  }

  /** Fold both stores into range shards and regrow the bloom when the
    * index outgrew its design size — see CosineNearDupGate.compact. */
  def compact(): Unit = synchronized {
    GateStore.compact(eng.spark, sigDir, "sigs", Seq("id", "sig"), batches,
      sortCol = Some("id"))
    val n = GateStore.compact(eng.spark, idxDir, "keys", Seq("bucket", "id"),
      batches, sortCol = Some("bucket"))
    if (n > bloomN) {
      bloomN = math.min(Int.MaxValue.toLong,
        math.max(bloomN.toLong * 4, n * 2)).toInt
      System.err.println(s"[graft] JaccardNearDupGate($name): index at $n keys " +
        s"outgrew the bloom design size; regrowing filter to n=$bloomN")
      bloom = BloomFilter.empty(bloomP, bloomN)
      bloom.union(BloomFilter.deserialize(
        eng.spark.read.parquet(GateStore.files(idxDir): _*)
          .agg(GraftFunctions.bloom_agg(col("bucket"), bloomP, bloomN).as("b"))
          .collect()(0).getAs[Array[Byte]]("b")))
    }
  }
}

object JaccardNearDupGate {

  /** Banding recall floor for a pair at estimated similarity exactly
    * `threshold`: 1-(1-t^rowsPerBand)^numBands (the LSH S-curve). */
  def recallEstimate(threshold: Double, numBands: Int, rowsPerBand: Int): Double =
    1.0 - math.pow(1.0 - math.pow(threshold, rowsPerBand), numBands)

  /** Register a Jaccard near-dup gate on `eng`: a continuous transform
    * reading `selectSql` (must project `orderCol`, which must be UNIQUE
    * per stream; `textSql` computes the text whose shingles are hashed)
    * whose not-similar-to-anything-earlier survivors are forwarded to
    * stream `sink` (original columns unchanged — the signature is
    * internal state, never part of the payload).
    *
    * Similarity is the MinHash ESTIMATE (see the class contract) and
    * banding recall is probabilistic in (threshold, numBands,
    * rowsPerBand); a configuration whose recall floor at `threshold`
    * falls below 0.95 is accepted but warned about loudly on stderr.
    */
  def create(eng: ContViewEngine, name: String, selectSql: String,
      textSql: String, orderCol: String, sink: String, storeRoot: String,
      threshold: Double, shingleN: Int = 3,
      numBands: Int = 16, rowsPerBand: Int = 4,
      bloomP: Double = 0.01, bloomN: Int = 1 << 20,
      maxBucketSize: Int = Int.MaxValue,
      compactEvery: Int = 256): JaccardNearDupGate = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccard gate threshold must be in (0, 1], got $threshold")
    val recall = recallEstimate(threshold, numBands, rowsPerBand)
    if (recall < 0.95)
      System.err.println(f"[graft] JaccardNearDupGate($name%s): banding " +
        f"recall at threshold=$threshold%.3f with numBands=$numBands%d, " +
        f"rowsPerBand=$rowsPerBand%d is ~$recall%.3f — near-pairs at the " +
        "threshold may be falsely admitted; raise numBands or lower " +
        "rowsPerBand to restore recall")
    val sigDir = Paths.get(storeRoot, name, "seen_sigs")
    val idxDir = Paths.get(storeRoot, name, "seen_keys")
    Files.createDirectories(sigDir)
    Files.createDirectories(idxDir)
    val gate = new JaccardNearDupGate(eng, name, textSql, orderCol, sink,
      sigDir, idxDir, threshold, shingleN, numBands, rowsPerBand,
      bloomP, bloomN, maxBucketSize, compactEvery)
    gate.bootstrap()
    eng.createContTransform(name, selectSql,
      outputFunc = Some(gate.onBatch _), emitChanges = false)
    // a catalog-replayed transform is bare (no callback) — re-attach
    eng.rebindTransformOutput(name, gate.onBatch _)
    gate
  }
}
