package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cv.ContViewEngine
import graft.functions.GraftFunctions
import graft.ops.{SimHash, TextOps}
import graft.sketch.BloomFilter

/** Streaming NEAR-duplicate gate: the approximate sibling of
  * [[StreamDedupGate]]. A document is forwarded iff no earlier document on
  * the stream (any prior batch, or a lower-`orderCol` row of the same
  * batch) sits within SimHash Hamming distance `maxDist` of it —
  * "seen"-based suppression, so every arriving fingerprint becomes a
  * suppressor for later arrivals whether or not it was itself admitted
  * (the set a later doc is checked against is feed-order-prefix-closed,
  * which keeps the semantics single-shot recomputable: admitted(d) ⇔ no
  * d' earlier than d with hamming(d,d') ≤ maxDist). `orderCol` must be
  * unique per stream: two rows sharing a value can't order against each
  * other and would both pass. Delivery is at-least-once under
  * failure-retry (sink forward precedes the store append — see
  * [[StreamDedupGate]]'s delivery contract).
  *
  * State is the fingerprint store EXPLODED by banded bucket key —
  * (bucket, id, fp) rows in append-only parquet, never the text — under
  * the block-permutation scheme (Manku WWW'07; `blocks`=6 → C(6,3)=20
  * keys of ~33 bits), so candidate generation is an equi-join with recall
  * 1.0 at distance ≤ maxDist and the explode cost is paid ONCE at append
  * time, not per batch. Per-batch store cost tracks the BATCH, not the
  * corpus:
  *  - a driver-resident Bloom filter over every bucket key ever seen
  *    gates the join — a batch row whose 20 buckets ALL miss the filter
  *    provably has no store candidate, and a fully-fresh batch reads
  *    nothing;
  *  - the surviving (bloom-positive) bucket keys are collected (bounded
  *    by [[GateStore.MaxPushdownKeys]]) and pushed into the store scan as
  *    a file-range prune ([[GateStore.pruned]] against compaction's
  *    range-sharded shards) plus an in-set row filter, so the join reads
  *    only the key slices the batch actually touches;
  *  - compaction folds the per-batch appends into bucket-range-sharded
  *    sorted files (parallel rewrite) and regrows the Bloom filter when
  *    the store outgrows its design size, so the fast path never silently
  *    saturates away.
  * At 10B docs the exploded store is ~3.2 TB of (bucket,id,fp) triples in
  * range shards; a 5k-row batch with ~1k bloom-positive keys reads ~1k
  * slices of it, independent of corpus size. The banding geometry
  * (blocks, maxDist) is baked into the stored bucket keys; the raw `fp`
  * column rides along so a re-band is a one-pass rewrite, and restarts
  * must use the geometry the store was written with.
  */
final class SimHashNearDupGate private (
    eng: ContViewEngine,
    val name: String,
    textSql: String,
    orderCol: String,
    sink: String,
    storeDir: Path,
    maxDist: Int,
    blocks: Int,
    bloomP: Double,
    bloomN0: Int,
    maxBucketSize: Int,
    compactEvery: Int) {

  private var bloom = BloomFilter.empty(bloomP, bloomN0)
  private var bloomN = bloomN0
  // Hot-bucket guard (opt-in, the SimHash.nearDuplicates cap's streaming
  // form): a boilerplate-heavy crawl floods banded buckets — thousands of
  // near-identical fingerprints sharing every key — and the candidate join
  // goes quadratic in the flood. With a cap, buckets whose SEEN-so-far
  // occupancy exceeds it stop generating candidates on both sides of the
  // join. Occupancy is tracked by a driver-resident CountMinSketch over
  // bucket keys (overestimates only ⇒ may exclude a near-cap bucket early,
  // never lets a flooded one through); the batch reads the sketch as of
  // batch START, so a batch's own rows don't cap each other mid-flight and
  // the admitted set stays deterministic. Recall contract: a pair agreeing
  // ONLY in flooded buckets is missed — same trade as the batch pipeline,
  // chosen explicitly by setting the cap.
  private val bucketCounts: graft.sketch.CountMinSketch =
    if (maxBucketSize == Int.MaxValue) null
    else graft.sketch.CountMinSketch.empty()
  private var batches = 0L
  private var admitted = 0L
  private var suppressed = 0L

  /** (batches, admitted survivors, suppressed near-duplicates) so far. */
  def stats: (Long, Long, Long) = synchronized((batches, admitted, suppressed))

  /** Restart bootstrap: the exploded fingerprint store IS the dedup state;
    * one distributed pass over its bucket column rebuilds the
    * memory-resident bucket bloom (and the CMS occupancy when the
    * hot-bucket cap is active). */
  private[streaming] def bootstrap(): Unit = synchronized {
    val files = GateStore.files(storeDir)
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
      batches = GateStore.maxBatch(storeDir, "fps")
    }
  }

  /** Fold per-batch fingerprint files into bucket-range shards — crash-safe
    * without a manifest (duplicated (bucket, id, fp) rows change nothing:
    * the candidate join deduplicates suppressor hits), so the shards land
    * before the olds are unlinked. Regrows the driver bloom when the store
    * has outgrown its design size, so the bloom's false-positive rate (and
    * with it the fast path) survives an unbounded stream. */
  def compact(): Unit = synchronized {
    val n = GateStore.compact(eng.spark, storeDir, "fps",
      Seq("bucket", "id", "fp"), batches, sortCol = Some("bucket"))
    if (n > bloomN) {
      bloomN = math.min(Int.MaxValue.toLong,
        math.max(bloomN.toLong * 4, n * 2)).toInt
      System.err.println(s"[graft] SimHashNearDupGate($name): store at $n keys " +
        s"outgrew the bloom design size; regrowing filter to n=$bloomN")
      bloom = BloomFilter.empty(bloomP, bloomN)
      bloom.union(BloomFilter.deserialize(
        eng.spark.read.parquet(GateStore.files(storeDir): _*)
          .agg(GraftFunctions.bloom_agg(col("bucket"), bloomP, bloomN).as("b"))
          .collect()(0).getAs[Array[Byte]]("b")))
    }
  }

  /** Append pre-fingerprinted rows straight into the seen-store (bloom/CMS
    * updated, nothing forwarded): the scale-probe's way of standing up a
    * 10×/100× store without replaying history through the join path. */
  private[graft] def seedStore(rows: DataFrame): Unit = synchronized {
    batches += 1
    val keyed = rows
      .withColumn("fp", SimHash.simhash64(TextOps.tokens(expr(textSql))))
      .where(col("fp").isNotNull)
      .persist()
    try {
      GateStore.append(
        keyed.select(explode(SimHash.blockKeys(col("fp"), blocks, maxDist)).as("bucket"),
          col(orderCol).as("id"), col("fp")),
        storeDir, "fps", batches, sortCol = Some("bucket"))
      updateFilters(collectBuckets(keyed))
    } finally { keyed.unpersist(); () }
  }

  /** Driver-side filter update from the batch's collected bucket keys
    * (with multiplicity, for the CMS): every stored row's buckets are
    * exactly this multiset, so the bloom ⊇ store invariant stays exact. */
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
    keyed.where(col("fp").isNotNull)
      .select(explode(SimHash.blockKeys(col("fp"), blocks, maxDist)).as("bucket"))
      .collect().map(_.getLong(0))

  // opt-in phase timing on stderr (GRAFT_GATE_TRACE=1) — dev diagnosis only
  private val trace = sys.env.get("GRAFT_GATE_TRACE").contains("1")
  @inline private def traced[T](label: String)(f: => T): T =
    if (!trace) f
    else {
      val t0 = System.nanoTime()
      val out = f
      System.err.println(f"[gate-trace] $name%s $label%s ${(System.nanoTime() - t0) / 1e3}%.0f us")
      out
    }

  private[streaming] def onBatch(batch: DataFrame): Unit = synchronized { traced("onbatch-total") {
    batches += 1
    val s = batch.sparkSession
    val obs = new org.apache.spark.sql.Observation(s"ndgate_${name}_$batches")
    val keyed = batch.drop("arrival_timestamp")
      .observe(obs, count(lit(1)).as("rows"))
      .withColumn("fp", SimHash.simhash64(TextOps.tokens(expr(textSql))))
      .persist() // fingerprints feed the bucket join, the store append and the sink
    try {
      // ONE bounded collect of the batch's bucket keys (with multiplicity)
      // feeds every driver-side decision: the occupancy cap (CMS as of
      // batch START), the bloom probe (the filter never ships to executors
      // — regrown it is megabytes), the file-range prune, and the
      // post-append filter update.
      val buckets = traced("collect")(collectBuckets(keyed))
      val distinctBuckets = buckets.distinct
      val overCap: Array[Long] =
        if (bucketCounts == null) Array.emptyLongArray
        else distinctBuckets.filter(b => bucketCounts.estimate(b) > maxBucketSize)
      val overCapSet = overCap.toSet
      val allKeys = keyed.select(col(orderCol).as("__id"), col("fp"),
        explode(SimHash.blockKeys(col("fp"), blocks, maxDist)).as("bucket"))
      // cap active: only buckets under occupancy (as of batch start) join
      val bkeys =
        if (overCap.isEmpty) allKeys
        else allKeys.where(!GateStore.inSetCol(col("bucket"), overCap.toSeq))
      // within-batch: an earlier row suppresses a later one at distance
      // <= maxDist; banding guarantees every such pair shares a bucket key
      // — which can only happen in a bucket that occurs at least TWICE in
      // this batch, and the driver already holds the multiset: the
      // self-join runs only over those buckets (usually none), so an
      // all-fresh batch skips the in-batch shuffle entirely
      val counts = new java.util.HashMap[java.lang.Long, Integer]()
      buckets.foreach(b => counts.merge(b, 1, (a, x) => a + x))
      val multiBuckets = distinctBuckets
        .filter(b => counts.get(b) >= 2 && !overCapSet.contains(b))
      val inBatch =
        if (multiBuckets.isEmpty) allKeys.select(col("__id")).limit(0)
        else {
          val mkeys = bkeys.where(GateStore.inSetCol(col("bucket"), multiBuckets.toSeq))
          val l = mkeys.select(col("bucket"), col("__id").as("id_l"), col("fp").as("fp_l"))
          val r = mkeys.select(col("bucket"), col("__id").as("id_r"), col("fp").as("fp_r"))
          l.join(r, Seq("bucket"))
            .where(col("id_l") < col("id_r") &&
              bit_count(col("fp_l").bitwiseXOR(col("fp_r"))) <= maxDist)
            .select(col("id_r").as("__id"))
        }
      val storeF = GateStore.storeFiles(storeDir)
      // bucket-bloom gate: an under-cap key that misses the driver bloom
      // has no store candidate (no false negatives); the surviving keys
      // prune the store read at file level (range-stamped shards) and row
      // level (in-set), so the join touches only the batch's key slices.
      // A pathological batch with more hit keys than MaxPushdownKeys falls
      // back to the unpruned (still correct, cap-respecting) join.
      val hitKeys: Array[Long] =
        if (storeF.isEmpty) Array.emptyLongArray
        else distinctBuckets.filter(b => !overCapSet.contains(b) && bloom.contains(b))
      val pushdown = hitKeys.length <= GateStore.MaxPushdownKeys
      val storePaths =
        if (hitKeys.isEmpty) Array.empty[String]
        else if (pushdown) GateStore.pruned(storeF, hitKeys)
        else storeF.map(_.path)
      val fromStore =
        if (storePaths.isEmpty) inBatch.limit(0)
        else {
          val hit =
            if (pushdown) bkeys.where(GateStore.inSetCol(col("bucket"), hitKeys.toSeq))
            else bkeys
          val store0 =
            if (pushdown)
              s.read.parquet(storePaths: _*)
                .where(GateStore.inSetCol(col("bucket"), hitKeys.toSeq))
            else {
              // symmetric cap exclusion still needed on the fallback path
              // (the in-set filter implies it: hitKeys exclude overCap)
              val all = s.read.parquet(storePaths: _*)
              if (overCap.isEmpty) all
              else all.where(!GateStore.inSetCol(col("bucket"), overCap.toSeq))
            }
          val store = store0
            .select(col("bucket"), col("id").as("id_s"), col("fp").as("fp_s"))
          hit.join(store, Seq("bucket"))
            .where(bit_count(col("fp").bitwiseXOR(col("fp_s"))) <= maxDist)
            .select(col("__id"))
        }
      val suppressedIds = inBatch.unionByName(fromStore).distinct()
        .withColumnRenamed("__id", orderCol)
      val survivors = keyed.join(suppressedIds, Seq(orderCol), "left_anti").persist()
      try {
        val n = traced("suppress+count")(survivors.count())
        admitted += n
        suppressed += obs.get("rows").asInstanceOf[Long] - n
        // sink BEFORE store append (at-least-once under failure-retry, see
        // StreamDedupGate's delivery contract): a batch that fails mid-gate
        // can be retried without its own fingerprints suppressing it
        if (n > 0) traced("sink")(eng.insertInto(sink, survivors))
        // append EVERY row's fingerprint exploded by bucket key
        // (seen-semantics: suppressed docs still suppress later arrivals;
        // null fingerprints can't pair and are not stored), then the
        // driver-side bloom/CMS update from the already-collected keys
        traced("append")(GateStore.append(
          keyed.where(col("fp").isNotNull).select(
            explode(SimHash.blockKeys(col("fp"), blocks, maxDist)).as("bucket"),
            col(orderCol).as("id"), col("fp")),
          storeDir, "fps", batches, sortCol = Some("bucket")))
        traced("filters")(updateFilters(buckets))
      } finally survivors.unpersist()
    } finally keyed.unpersist()
    if (compactEvery > 0 && batches % compactEvery == 0) compact()
  } }
}

object SimHashNearDupGate {

  /** Register a near-dup gate on `eng`: a continuous transform reading
    * `selectSql` (must project `orderCol`; `textSql` computes the text the
    * fingerprint hashes) whose not-near-anything-earlier survivors are
    * forwarded to stream `sink` with the fingerprint attached as `fp`.
    */
  def create(eng: ContViewEngine, name: String, selectSql: String,
      textSql: String, orderCol: String, sink: String, storeRoot: String,
      maxDist: Int = 3, blocks: Int = 6,
      bloomP: Double = 0.01, bloomN: Int = 1 << 20,
      maxBucketSize: Int = Int.MaxValue,
      compactEvery: Int = 256): SimHashNearDupGate = {
    val dir = Paths.get(storeRoot, name, "seen_fps")
    Files.createDirectories(dir)
    val gate = new SimHashNearDupGate(eng, name, textSql, orderCol, sink, dir,
      maxDist, blocks, bloomP, bloomN, maxBucketSize, compactEvery)
    gate.bootstrap() // resume from a persisted store after an engine restart
    eng.createContTransform(name, selectSql,
      outputFunc = Some(gate.onBatch _), emitChanges = false)
    // a catalog-replayed transform is bare (no callback) — re-attach
    eng.rebindTransformOutput(name, gate.onBatch _)
    gate
  }
}
