package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cv.ContViewEngine
import graft.functions.GraftFunctions
import graft.sketch.BloomFilter

/** Streaming exact-dedup gate: a continuous transform that forwards only the
  * FIRST occurrence of each content key ever seen on a stream, in arrival
  * order — the incremental form of the batch `q_dedup_exact` operator, and
  * the step a production ingest pipeline runs so duplicate documents never
  * reach downstream state at all.
  *
  * Semantics (deterministic given batch order and a unique `orderCol`):
  *  - within a batch, the row with the lowest `orderCol` wins its key
  *    (ties on `orderCol` are broken arbitrarily — feed a unique id);
  *  - across batches, a key admitted once is never admitted again;
  *  - a row whose key evaluates to NULL is ALWAYS forwarded and never
  *    stored (an incomparable key can't deduplicate — same policy as the
  *    near-dup gates, whose null fingerprints generate no candidates);
  *  - survivors are forwarded to `sink` with the key attached as `h`.
  *
  * Delivery: at-least-once under failure-retry. The sink forward runs
  * BEFORE the seen-store append, so a batch that fails mid-gate can be
  * retried without losing documents; the retried batch's survivors may
  * reach the sink twice (detectable downstream), but a document can never
  * be silently suppressed by state its failed delivery left behind.
  *
  * Mechanics, sized for the 100-TB regime:
  *  - The seen-key store is APPEND-ONLY key-column parquet (a dedup set
  *    only grows): each batch whose survivors are non-empty appends ONE
  *    file via temp-write + atomic rename — no read-modify-write of
  *    existing state, so per-batch write cost is O(new keys), never
  *    O(corpus). Auto-compaction (`compactEvery`) folds the per-batch
  *    files so listing/footer overhead stays bounded indefinitely.
  *  - A driver-resident Bloom filter gates the expensive path, and it
  *    STAYS driver-resident: the batch's distinct keys are collected once
  *    (bounded by batch size — megabytes at worst) and probed on the
  *    driver, because shipping a corpus-sized filter (megabytes once
  *    regrown) into every executor task as a literal costs more than the
  *    scan it saves. Keys whose probe misses are DEFINITELY new (no false
  *    negatives) and skip the store entirely; a batch of genuinely fresh
  *    content costs zero store reads. The per-batch filter update is a
  *    driver-side add of the same collected keys — every non-null batch
  *    key ends up stored-or-already-stored, so the bloom ⊇ store
  *    invariant is exact.
  *  - Bloom-positive candidates prune the store read twice: at FILE level
  *    against the range-stamped compaction shards (GateStore.pruned) and
  *    at ROW level via an in-set filter, so the anti-join's store side is
  *    bounded by the batch's candidate keys, not the corpus. The filter
  *    regrows at compaction (exact store count known there), so the fast
  *    path survives unbounded streams.
  *
  * Concurrency: `onBatch` is serialized on the gate — the engine's sync and
  * async ingest paths already order batches, and the gate's first-wins
  * guarantee is only meaningful under an ordered feed.
  *
  * Restart: `create` on an engine whose catalog already replayed this
  * transform re-binds the callback and `bootstrap` rebuilds the bloom from
  * the persisted store — suppression resumes exactly. (The DDL spelling,
  * `outputfunc = dedup_gate(...)`, replays without any re-run of user
  * code: ContViewEngine.createGateTransform.)
  *
  * Reference anchor: the transform surface is pipelinedb's CREATE VIEW with
  * action=transform + output function (commands.c:219-253); the dedup
  * semantics layered on it are beyond-ref (training-data pipeline).
  */
final class StreamDedupGate private (
    eng: ContViewEngine,
    val name: String,
    keySql: String,
    orderCol: String,
    sink: String,
    storeDir: Path,
    bloomP: Double,
    bloomN0: Int,
    compactEvery: Int) {

  private var bloom = BloomFilter.empty(bloomP, bloomN0)
  private var bloomN = bloomN0
  private var batches = 0L
  private var admitted = 0L
  private var suppressed = 0L

  /** (batches, admitted survivors, suppressed duplicates) so far. */
  def stats: (Long, Long, Long) = synchronized((batches, admitted, suppressed))

  /** Current bloom design size (grows at compaction — see [[compact]]). */
  private[streaming] def currentBloomN: Int = synchronized(bloomN)

  /** Restart bootstrap: a re-created gate on an existing store resumes
    * exactly — the key set IS the store; only the bloom is memory-resident,
    * and one distributed bloom_agg over the persisted keys rebuilds it.
    * (admitted/suppressed counters restart at zero: session telemetry,
    * not dedup state.)
    */
  private[streaming] def bootstrap(): Unit = synchronized {
    val files = GateStore.files(storeDir)
    if (files.nonEmpty) {
      // right-size FIRST (metadata-only count): a corpus-sized store under
      // the construction-time design n would run the filter saturated
      bloomN = GateStore.bloomSizeFor(
        eng.spark.read.parquet(files: _*).count(), bloomN)
      bloom = GateStore.buildBloom(eng.spark, storeDir, "h", bloomP, bloomN)
      batches = GateStore.maxBatch(storeDir, "keys")
    }
  }

  /** Fold the per-batch key files into key-range shards (also runs
    * automatically every `compactEvery` batches) — a parallel rewrite,
    * never a single-task funnel. Crash-safe without a manifest because a
    * dedup store tolerates DUPLICATED keys — the anti-join result is
    * identical — so the shards land before the olds are unlinked. The
    * exact key count compaction surfaces right-sizes the driver bloom: on
    * an unbounded stream a fixed-n filter would saturate toward fp-rate 1
    * and silently degrade every batch to the full store anti-join, so the
    * filter is regrown (and rebuilt distributed) once the store outgrows
    * its design size. */
  def compact(): Unit = synchronized {
    val n = GateStore.compact(eng.spark, storeDir, "keys", Seq("h"), batches,
      sortCol = Some("h"))
    if (n > bloomN) {
      bloomN = GateStore.bloomSizeFor(n, bloomN)
      System.err.println(s"[graft] StreamDedupGate($name): store at $n keys " +
        s"outgrew the bloom design size; regrowing filter to n=$bloomN")
      bloom = GateStore.buildBloom(eng.spark, storeDir, "h", bloomP, bloomN)
    }
  }

  /** Append pre-keyed rows straight into the seen-store (bloom updated,
    * nothing forwarded) — the scale-probe's way of standing up a 10×/100×
    * store without replaying history through the join path. */
  private[graft] def seedStore(rows: DataFrame): Unit = synchronized {
    batches += 1
    val keys = rows.withColumn("h", expr(keySql)).where(col("h").isNotNull)
      .select("h")
    GateStore.append(keys, storeDir, "keys", batches, sortCol = Some("h"))
    keys.collect().foreach(r => bloom.add(r.get(0)))
  }

  private[streaming] def onBatch(batch: DataFrame): Unit = synchronized {
    batches += 1
    val s = batch.sparkSession
    // input-row count rides the first action via observe() — a separate
    // batch.count() would re-run the transform projection per batch
    val obs = new org.apache.spark.sql.Observation(s"gate_${name}_$batches")
    val keyed = batch.drop("arrival_timestamp")
      .observe(obs, count(lit(1)).as("rows"))
      .withColumn("h", expr(keySql))
      .persist()
    try {
      // ONE bounded collect — (orderCol, key) — and the whole suppression
      // decision runs on the driver: within-batch first-wins is a hash
      // group + min, the bloom is probed in place (never shipped to
      // executors), and the store check collects ONLY the candidate keys
      // actually present in the pruned, in-set-filtered store slice. The
      // old shape paid a window shuffle + an anti-join + a count job per
      // batch; this shape runs zero shuffles.
      val rows: Array[(Any, Any)] =
        keyed.where(col("h").isNotNull).select(col(orderCol), col("h"))
          .collect().map(r => (r.get(0), r.get(1)))
      val batchKeys: Array[Any] = rows.map(_._2).distinct
      // within-batch first-wins: min orderCol per key; later rows of the
      // same key are suppressed (rows with a null order id can't order
      // and are never suppressed — the unique-orderCol contract)
      val winnerByKey = new java.util.HashMap[Any, (Any, Int)]()
      val inBatchSuppressed = new java.util.HashSet[Any]()
      if (rows.length != batchKeys.length) {
        var i = 0
        while (i < rows.length) {
          val (id, h) = rows(i)
          val prev = winnerByKey.get(h)
          if (prev == null) winnerByKey.put(h, (id, i))
          else if (prev._1 == null) {
            // a null-order-id winner keeps its key (nulls order first, as
            // the window path did); a later non-null row is suppressed; a
            // SECOND null-id row cannot be targeted by any id filter and
            // passes through — off the unique-orderCol contract either way
            if (id != null) inBatchSuppressed.add(id)
          } else if (id == null || GateStore.lt(id, prev._1)) {
            inBatchSuppressed.add(prev._1)
            winnerByKey.put(h, (id, i))
          } else inBatchSuppressed.add(id)
          i += 1
        }
      } else rows.foreach { case (id, h) => winnerByKey.put(h, (id, -1)) }
      // Bloom gate: misses are definitely-new and bypass the store scan;
      // only possible repeats (true dups + ~p false positives) pay the
      // store-presence check — a collect of the candidate keys that exist
      // in the pruned slice (bounded by the candidate count itself)
      val storeF = GateStore.storeFiles(storeDir)
      val cand = batchKeys.filter(bloom.contains)
      val present: java.util.HashSet[Any] = {
        val set = new java.util.HashSet[Any]()
        if (storeF.nonEmpty && cand.nonEmpty) {
          GateStore.withInPushdown(s, cand.length)(
            s.read.parquet(GateStore.pruned(storeF, cand): _*)
              .where(GateStore.inSetCol(col("h"), cand.toSeq))
              .select("h").collect()).foreach(r => set.add(r.get(0)))
        }
        set
      }
      // a winner whose key is already stored is suppressed too
      val suppressedIds = new java.util.HashSet[Any]()
      inBatchSuppressed.forEach(id => { suppressedIds.add(id); () })
      var storeSuppressedNullId = 0
      winnerByKey.forEach { (h, winner) =>
        if (present.contains(h)) {
          if (winner._1 != null) suppressedIds.add(winner._1)
          else storeSuppressedNullId += 1
        }
      }
      val total = obs.get("rows").asInstanceOf[Long]
      // admitted counts what the survivor filter will actually forward,
      // computed over the same collected rows the filter semantics cover
      // (off-contract duplicate null order ids previously diverged: the
      // key-based branch drops EVERY row of a store-present key, but the
      // old arithmetic counted the second null-id row as admitted)
      val keyBasedFilter = storeSuppressedNullId > 0
      var dropped = 0
      if (!suppressedIds.isEmpty || keyBasedFilter) {
        var i = 0
        while (i < rows.length) {
          val (id, h) = rows(i)
          val drop =
            if (keyBasedFilter)
              present.contains(h) || (id != null && suppressedIds.contains(id))
            else id != null && suppressedIds.contains(id)
          if (drop) dropped += 1
          i += 1
        }
      }
      val n = total - dropped
      admitted += n
      suppressed += total - n
      // admitted keys — the winners not already stored — are known on the
      // driver, so the append is a plain LocalRelation write; null-key
      // rows pass through the sink unconditionally and are never stored
      if (n > 0) {
        // sink BEFORE store append: see the delivery contract above
        val survivors =
          if (suppressedIds.isEmpty && storeSuppressedNullId == 0) keyed
          else if (storeSuppressedNullId == 0)
            keyed.where(col(orderCol).isNull ||
              !GateStore.inSetCol(col(orderCol), suppressedIds.toArray.toSeq))
          else {
            // a suppressed null-order-id winner is only filterable by key
            val presentKeys = new java.util.ArrayList[Any]()
            present.forEach(h => { presentKeys.add(h); () })
            keyed.where(col("h").isNull ||
              (!GateStore.inSetCol(col("h"), presentKeys.toArray.toSeq) &&
                (col(orderCol).isNull ||
                  !GateStore.inSetCol(col(orderCol), suppressedIds.toArray.toSeq))))
          }
        eng.insertInto(sink, survivors)
        val newKeys = new java.util.ArrayList[org.apache.spark.sql.Row]()
        winnerByKey.forEach { (h, winner) =>
          if (!present.contains(h)) { newKeys.add(org.apache.spark.sql.Row(h)); () }
        }
        if (!newKeys.isEmpty) {
          val hType = keyed.schema(keyed.schema.fieldIndex("h")).dataType
          GateStore.append(
            s.createDataFrame(newKeys, org.apache.spark.sql.types.StructType(
              Seq(org.apache.spark.sql.types.StructField("h", hType)))),
            storeDir, "keys", batches, sortCol = Some("h"))
        }
      }
      // every non-null batch key is now stored-or-already-stored, so adding
      // them all preserves the bloom ⊇ store invariant exactly
      batchKeys.foreach(bloom.add)
    } finally { keyed.unpersist(); () }
    if (compactEvery > 0 && batches % compactEvery == 0) compact()
  }
}

object StreamDedupGate {

  private[streaming] def deleteRecursively(f: java.io.File): Unit =
    GateStore.deleteRecursively(f)

  /** Register a dedup gate on `eng`: a continuous transform reading
    * `selectSql` (must project `orderCol`; the key is computed by `keySql`
    * over the projected columns) whose first-occurrence survivors are
    * forwarded to stream `sink` with the key attached as column `h`.
    */
  def create(eng: ContViewEngine, name: String, selectSql: String,
      keySql: String, orderCol: String, sink: String,
      storeRoot: String,
      bloomP: Double = 0.01, bloomN: Int = 1 << 17,
      compactEvery: Int = 256): StreamDedupGate = {
    val root = Paths.get(storeRoot, name)
    Files.createDirectories(root)
    GateStore.stampGeometry(root, "shards_1")
    val dir = root.resolve("seen_keys")
    Files.createDirectories(dir)
    val gate = new StreamDedupGate(eng, name, keySql, orderCol, sink, dir,
      bloomP, bloomN, compactEvery)
    gate.bootstrap() // resume from a persisted store after an engine restart
    eng.createContTransform(name, selectSql,
      outputFunc = Some(gate.onBatch _), emitChanges = false)
    // the catalog replays the transform BARE (a callback can't persist);
    // if that's what createContTransform just idempotently returned,
    // re-attach this gate so it doesn't sit silently dead
    eng.rebindTransformOutput(name, gate.onBatch _)
    gate
  }

  /** The G-core horizontally-sharded form of [[create]] (see
    * [[ShardedDedupGate]]): rows route to core hash(key) mod `shards`,
    * each core a full single-key-slice gate with its own store + bloom.
    * Admitted set identical to the unsharded gate's; reopening under a
    * different G is refused. */
  def createSharded(eng: ContViewEngine, name: String, selectSql: String,
      keySql: String, orderCol: String, sink: String, storeRoot: String,
      shards: Int,
      bloomP: Double = 0.01, bloomN: Int = 1 << 17,
      compactEvery: Int = 256): ShardedDedupGate = {
    require(shards >= 2, s"use create() for an unsharded gate (shards=$shards)")
    val root = Paths.get(storeRoot, name)
    Files.createDirectories(root)
    GateStore.stampGeometry(root, s"shards_$shards")
    val cores = (0 until shards).map { k =>
      val dir = root.resolve(s"s${k}of$shards").resolve("seen_keys")
      Files.createDirectories(dir)
      val core = new StreamDedupGate(eng, name, keySql, orderCol, sink, dir,
        bloomP, bloomN, compactEvery)
      core.bootstrap()
      core
    }
    val gate = new ShardedDedupGate(eng, name, keySql, cores)
    eng.createContTransform(name, selectSql,
      outputFunc = Some(gate.onBatch _), emitChanges = false)
    eng.rebindTransformOutput(name, gate.onBatch _)
    gate
  }
}
