package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

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
  * State is 16 bytes per document ever seen — (id, 64-bit fingerprint) in
  * append-only parquet, never the text — so 10B docs is ~160 GB of key
  * column, and the candidate join explodes fingerprints into
  * block-permutation bucket keys (Manku WWW'07; `blocks`=6 → C(6,3)=20
  * keys of ~33 bits) on BOTH sides, making candidate generation an
  * equi-join with recall 1.0 at distance ≤ maxDist. A driver-resident
  * Bloom filter over every bucket key ever seen gates the join: a batch
  * row whose 20 buckets ALL miss the filter provably has no store
  * candidate and skips the store entirely — fresh-content batches pay two
  * map-side jobs and zero store reads. At larger scale, partition the
  * store's exploded keys by bucket range so the join prunes to the
  * batch's buckets instead of scanning all fingerprints; the compact
  * (id, fp) layout here is the base both evolutions share.
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
    bloomN: Int,
    maxBucketSize: Int,
    compactEvery: Int) {

  private val bloom = BloomFilter.empty(bloomP, bloomN)
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

  /** Restart bootstrap: the fingerprint store IS the dedup state; one
    * distributed pass over it rebuilds the memory-resident bucket bloom
    * (and the CMS occupancy when the hot-bucket cap is active). */
  private[streaming] def bootstrap(): Unit = synchronized {
    val files = GateStore.files(storeDir)
    if (files.nonEmpty) {
      val keys = eng.spark.read.parquet(files: _*)
        .select(explode(SimHash.blockKeys(col("fp"), blocks, maxDist)).as("bucket"))
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

  /** Merge per-batch fingerprint files into one — crash-safe without a
    * manifest (duplicated (id, fp) rows change nothing: the candidate join
    * deduplicates suppressor hits), so the merged file lands before the
    * olds are unlinked. */
  def compact(): Unit = synchronized {
    GateStore.compact(eng.spark, storeDir, "fps", Seq("id", "fp"), batches)
  }

  private[streaming] def onBatch(batch: DataFrame): Unit = synchronized {
    batches += 1
    val s = batch.sparkSession
    val obs = new org.apache.spark.sql.Observation(s"ndgate_${name}_$batches")
    val keyed = batch.drop("arrival_timestamp")
      .observe(obs, count(lit(1)).as("rows"))
      .withColumn("fp", SimHash.simhash64(TextOps.tokens(expr(textSql))))
      .persist() // fingerprints feed the bucket join, the store append and the sink
    try {
      val allKeys = keyed.select(col(orderCol).as("__id"), col("fp"),
        explode(SimHash.blockKeys(col("fp"), blocks, maxDist)).as("bucket"))
      // cap active: only buckets under occupancy (as of batch start) join
      val bkeys =
        if (bucketCounts == null) allKeys
        else allKeys.where(GraftFunctions.freq(
          lit(bucketCounts.serialize()), col("bucket")) <= maxBucketSize)
      // within-batch: an earlier row suppresses a later one at distance
      // <= maxDist; banding guarantees every such pair shares a bucket key
      val l = bkeys.select(col("bucket"), col("__id").as("id_l"), col("fp").as("fp_l"))
      val r = bkeys.select(col("bucket"), col("__id").as("id_r"), col("fp").as("fp_r"))
      val inBatch = l.join(r, Seq("bucket"))
        .where(col("id_l") < col("id_r") &&
          bit_count(col("fp_l").bitwiseXOR(col("fp_r"))) <= maxDist)
        .select(col("id_r").as("__id"))
      val files = GateStore.files(storeDir)
      val fromStore =
        if (files.isEmpty) inBatch.limit(0)
        else {
          // bucket-bloom gate: a row whose every bucket key misses the
          // filter has no store candidate (no false negatives) — only
          // bloom-positive keys join the exploded store
          val hit = bkeys.where(
            GraftFunctions.bloom_contains(lit(bloom.serialize()), col("bucket")))
          val storeAll = s.read.parquet(files: _*)
            .select(col("id").as("id_s"), col("fp").as("fp_s"))
            .select(col("id_s"), col("fp_s"),
              explode(SimHash.blockKeys(col("fp_s"), blocks, maxDist)).as("bucket"))
          // symmetric exclusion: a flooded bucket generates no candidates
          // from the store side either (`hit` derives from bkeys, already
          // cap-filtered)
          val store =
            if (bucketCounts == null) storeAll
            else storeAll.where(GraftFunctions.freq(
              lit(bucketCounts.serialize()), col("bucket")) <= maxBucketSize)
          hit.join(store, Seq("bucket"))
            .where(bit_count(col("fp").bitwiseXOR(col("fp_s"))) <= maxDist)
            .select(col("__id"))
        }
      val suppressedIds = inBatch.unionByName(fromStore).distinct()
        .withColumnRenamed("__id", orderCol)
      val survivors = keyed.join(suppressedIds, Seq(orderCol), "left_anti").persist()
      try {
        val n = survivors.count()
        admitted += n
        suppressed += obs.get("rows").asInstanceOf[Long] - n
        // sink BEFORE store append (at-least-once under failure-retry, see
        // StreamDedupGate's delivery contract): a batch that fails mid-gate
        // can be retried without its own fingerprints suppressing it
        if (n > 0) eng.insertInto(sink, survivors)
        // append EVERY row's fingerprint (seen-semantics: suppressed docs
        // still suppress later arrivals; null fingerprints can't pair and
        // are not stored), then the bucket-key bloom update
        GateStore.append(
          keyed.where(col("fp").isNotNull).select(col(orderCol).as("id"), col("fp")),
          storeDir, "fps", batches)
        val keyCol = keyed
          .select(explode(SimHash.blockKeys(col("fp"), blocks, maxDist)).as("bucket"))
        val updates =
          if (bucketCounts == null)
            keyCol.agg(GraftFunctions.bloom_agg(col("bucket"), bloomP, bloomN).as("b"))
              .collect()(0)
          else
            keyCol.agg(GraftFunctions.bloom_agg(col("bucket"), bloomP, bloomN).as("b"),
              GraftFunctions.freq_agg(col("bucket")).as("c")).collect()(0)
        bloom.union(BloomFilter.deserialize(updates.getAs[Array[Byte]]("b")))
        if (bucketCounts != null)
          bucketCounts.merge(
            graft.sketch.CountMinSketch.deserialize(updates.getAs[Array[Byte]]("c")))
      } finally survivors.unpersist()
    } finally keyed.unpersist()
    if (compactEvery > 0 && batches % compactEvery == 0) compact()
  }
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
