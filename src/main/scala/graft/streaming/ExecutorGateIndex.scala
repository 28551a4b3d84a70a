package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.{Partition, Partitioner, SparkContext, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** EXECUTOR-DISTRIBUTED gate index: the (bucket-key → 64-bit aux [, store
  * id, event time]) probe state of a streaming near-dup gate, partitioned
  * by bucket across long-lived executor-local shards — the scale-out past
  * the single-driver ceiling of [[ResidentIndex]] (whose byte budget,
  * G-thread sharding and O(store)/batch disk fallback all live in ONE
  * driver JVM). Reference anchor: pipelinedb's combiner tier — a
  * separately scalable process pool receiving group-hash-routed state
  * updates (config.c:300-306 `num_combiners` 1-1024;
  * combiner_receiver.c:160-177 group-hash routing) — re-expressed in
  * Spark's execution model: state shards live where tasks run, the driver
  * only routes and coordinates.
  *
  * The aux word is the gate's inline similarity digest and ONE predicate
  * serves the whole family — popcount(auxBatch ^ auxStore) ≤ cutoff: the
  * SimHash fingerprint at Hamming radius maxDist, the jaccard parity
  * sketch and the cosine SRP sketch at their calibrated cutoffs (a
  * sketchless gate passes cutoff 64 ≡ every bucket-mate). Two result
  * modes: `withIds = false` answers "is this row suppressed" directly
  * (the SimHash decision is aux-complete); `withIds = true` returns
  * sketch-admissible candidate (row, store id [, ts]) pairs for the
  * owning gate's exact payload verification (the split-store gates).
  *
  * SHAPE. Bucket b belongs to shard floorMod(b, P) (bucket keys are
  * banded hashes — uniform by construction). Each shard is a
  * [[ResidentIndex]] (sorted main run + hashed delta — the same LSM
  * layout as the driver hot tier) plus id/ts pools, held in a JVM-global
  * registry keyed by (store path, shard id), so it SURVIVES across Spark
  * jobs. Per batch the driver ships O(batch) probe rows plus the previous
  * batch's O(batch) index delta, runs ONE P-partition job, and collects
  * O(candidates) back: the corpus-sized state never moves, per-batch
  * traffic is bounded by the batch, and memory scales with the CLUSTER
  * (P shards across executor heaps), not with one driver budget.
  *
  * CONSISTENCY. The parquet gate store remains the durable source of
  * truth; shards are caches REBUILDABLE from it. Every shard carries
  * (generation, applied-batch); a probe task whose shard is missing, from
  * another generation (compaction reap / bulk seed / gate restart), or
  * not exactly at the delta floor reports STALE instead of answering, and
  * the driver runs one rebuild job — a single distributed store scan
  * shuffled by the same bucket partitioner, loading every shard in one
  * pass — then retries the probe. Deltas apply strictly in batch order:
  * the delta for batch N rides batch N+1's probe job, AFTER N's durable
  * append (the gate drains its commit pipeline before deciding), so a
  * rebuild always reproduces at least what the shards knew — modulo a
  * LOST durable append, the gate family's accepted at-least-once loss
  * class.
  *
  * PLACEMENT. Probe tasks prefer the executor that last hosted their
  * shard (`getPreferredLocations`, recorded per job — the same pinning
  * Structured Streaming's StateStoreRDD gets from its coordinator); a
  * task scheduled elsewhere self-heals with one rebuild. On local[n] all
  * shards share the JVM and the pin is trivially satisfied.
  */
private[graft] final class ExecutorGateIndex(
    spark: SparkSession,
    storeDir: String,
    val parts: Int,
    ttlEnabled: Boolean,
    withIds: Boolean = false,
    auxCol: Option[String] = Some("fp")) {

  import ExecutorGateIndex._

  require(parts >= 1, s"need at least one state partition, got $parts")

  private val storeKey = storeDir
  // generation: instance nonce + invalidation count — a gate restart, a
  // compaction fold, or a bulk seed invalidates every shard (rebuild)
  private val nonce = java.util.UUID.randomUUID().toString.take(8)
  ExecutorGateIndex.stampOwner(storeDir, "_owner_idx", nonce)
  ExecutorGateState.registerLiveDir(storeKey)
  private var invalidations = 0L
  private def gen: String = s"$nonce:$invalidations"
  private var needRebuild = true // bootstrap starts from the store

  // last-known executor host of each shard (next job's preferred location)
  private val shardHosts = new Array[String](parts)

  // deltas not yet applied to the shards: (batch, entries) — shipped with
  // the next probe job; depth ≤ 1 in steady flow, bounded by batch always
  private val pending = new java.util.ArrayDeque[(Long, Array[DeltaRow])]()
  private var appliedFloor = -1L // shards sit exactly here between probes

  /** Buffer batch `n`'s exploded (bucket, aux, tsMicros, id) entries at
    * the gate's durable commit; they ride the next probe job. Call for
    * EVERY committed batch (empty arrays keep the range contiguous). */
  def bufferDelta(n: Long, entries: Array[DeltaRow]): Unit =
    synchronized { pending.addLast((n, entries)); () }

  /** The durable store changed shape under the shards (bulk seed,
    * compaction reap, crash recovery): drop the delta buffer and force a
    * rebuild at the next probe. */
  def invalidate(): Unit = synchronized {
    pending.clear()
    invalidations += 1
    needRebuild = true
  }

  /** Suppression/candidate probe for one batch against the distributed
    * shards. `withIds = false`: one (rowIdx, null, 0) per row with an
    * in-window match at popcount ≤ cutoff — the row is suppressed.
    * `withIds = true`: every admissible (rowIdx, store id, store
    * tsMicros) candidate pair, for exact verification by the gate.
    *
    * @param probes (rowIdx, bucket, aux, tsMicros), pre-filtered by the
    *               driver bloom/occupancy cap; ts ignored unwindowed
    * @param batch  this batch's number — shards must cover ≤ batch-1
    */
  def probe(probes: Array[(Int, Long, Long, Long)], batch: Long,
      cutoff: Int, ttlMicros: Long): Array[(Int, Any, Long)] = synchronized {
    ExecutorGateIndex.checkOwner(storeDir, "_owner_idx", nonce,
      "ExecutorGateIndex")
    val expectApplied = batch - 1
    if (needRebuild) rebuildAll(expectApplied)
    val deltas = pending.toArray(Array.empty[(Long, Array[DeltaRow])])
    pending.clear()
    val floor = appliedFloor
    appliedFloor = expectApplied
    var out = runProbe(probes, deltas, floor, expectApplied, cutoff, ttlMicros)
    var attempts = 0
    while (out.isLeft && attempts < 2) {
      // an executor moved/lost its shard (never on local[n] — and the
      // executor-granular pin makes a repeat rare on a cluster): rebuild
      // heals every shard, then the probe must answer
      System.err.println(s"[graft] ExecutorGateIndex($storeKey): shards " +
        s"${out.swap.getOrElse(Nil).mkString(",")} stale; rebuilding from the store")
      rebuildAll(expectApplied)
      out = runProbe(probes, Array.empty, expectApplied, expectApplied,
        cutoff, ttlMicros)
      attempts += 1
    }
    out.getOrElse(throw new IllegalStateException(
      s"gate shards ${out.swap.getOrElse(Nil)} stale after $attempts rebuilds — store $storeKey"))
  }

  /** One probe job. Left(stale shard ids) if any shard could not answer. */
  private def runProbe(probes: Array[(Int, Long, Long, Long)],
      deltas: Array[(Long, Array[DeltaRow])], floor: Long,
      expectApplied: Long, cutoff: Int,
      ttlMicros: Long): Either[Seq[Int], Array[(Int, Any, Long)]] = {
    val expectGen = gen
    val (sKey, p, ttl, ids) = (storeKey, parts, ttlEnabled, withIds)
    // group driver-side (batch-bounded): partition k's task payload
    val perShard = Array.fill(p)(
      new scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long)]())
    probes.foreach { pr =>
      perShard(java.lang.Math.floorMod(pr._2, p.toLong).toInt) += pr
    }
    val deltaPerShard =
      Array.fill(p)(new scala.collection.mutable.ArrayBuffer[(Long, DeltaRow)]())
    deltas.foreach { case (bn, entries) =>
      entries.foreach { e =>
        deltaPerShard(java.lang.Math.floorMod(e.bucket, p.toLong).toInt) +=
          ((bn, e))
      }
    }
    val payload: Array[ShardTask] = (0 until p).map { k =>
      ShardTask(perShard(k).toArray, deltaPerShard(k).toArray)
    }.toArray
    val rdd = new GateTaskRDD(spark.sparkContext, payload, shardHosts.clone())
    val results = try rdd.mapPartitionsWithIndex { (k, it) =>
      val task = it.next()
      val host = ExecutorGateState.taskLocation
      val shard = ExecutorGateState.shardFor(sKey, k, ttl, ids)
      shard.synchronized {
        if (shard.gen != expectGen || shard.applied != floor) {
          Iterator.single((k, host, true, Array.empty[(Int, Any, Long)]))
        } else {
          // apply the shipped deltas in batch order, then advance to the
          // probe's floor (a shard with no routed entries advances too —
          // the shipped batch range is contiguous by contract)
          task.deltas.sortBy(_._1).foreach { case (_, e) =>
            shard.add(e.bucket, e.aux, e.ts, e.id)
          }
          shard.applied = expectApplied
          val out = new scala.collection.mutable.ArrayBuffer[(Int, Any, Long)]()
          task.probes.foreach { case (rowIdx, b, aux, ts) =>
            var done = false
            shard.idx.foreachMatch(b) { (sAux, ord) =>
              if (!done && java.lang.Long.bitCount(sAux ^ aux) <= cutoff &&
                  (ttlMicros == 0L || shard.ts(ord) > ts - ttlMicros)) {
                if (!ids) { out += ((rowIdx, null, 0L)); done = true }
                else out += ((rowIdx, shard.id(ord),
                  if (ttlMicros == 0L) 0L else shard.ts(ord)))
              }
            }
          }
          Iterator.single((k, host, false, out.toArray))
        }
      }
    }.collect() finally rdd.destroy()
    results.foreach { case (k, host, _, _) => shardHosts(k) = host }
    val stale = results.collect { case (k, _, true, _) => k }.toSeq
    if (stale.nonEmpty) Left(stale)
    else {
      val all = results.flatMap(_._4)
      Right(if (withIds) all else all.distinct)
    }
  }

  /** Rebuild every shard from the durable store in ONE distributed pass:
    * scan the parquet files, shuffle by the bucket partitioner, load each
    * partition into its executor-local shard. O(store) read + one shuffle
    * — the bootstrap cost, paid at restart/compaction/seed, never per
    * batch. */
  private def rebuildAll(expectApplied: Long): Unit = {
    invalidations += 1 // orphan any shard the job does not reach
    val expectGen = gen
    val (sKey, p, ttl, ids) = (storeKey, parts, ttlEnabled, withIds)
    val files = GateStore.files(storeDir)
    val rows =
      if (files.isEmpty) spark.sparkContext.emptyRDD[(Long, DeltaRow)]
      else {
        val cols = Seq(col("bucket"),
          auxCol.map(col).getOrElse(lit(0L)).cast("long").as("__aux")) ++
          (if (ids) Seq(col("id")) else Nil) ++
          (if (ttl) Seq(unix_micros(col("ts"))) else Nil)
        val tsPos = if (ids) 3 else 2
        spark.read.parquet(files.toSeq: _*).select(cols: _*).rdd.map { r =>
          (r.getLong(0), DeltaRow(r.getLong(0), r.getLong(1),
            if (ttl) r.getLong(tsPos) else 0L, if (ids) r.get(2) else null))
        }
      }
    val hosts = rows.partitionBy(new BucketPartitioner(p))
      .mapPartitionsWithIndex { (k, it) =>
        val host = ExecutorGateState.taskLocation
        val shard = ExecutorGateState.shardFor(sKey, k, ttl, ids)
        shard.synchronized {
          shard.reset()
          it.foreach { case (_, e) => shard.add(e.bucket, e.aux, e.ts, e.id) }
          shard.idx.mergeDelta()
          shard.gen = expectGen
          shard.applied = expectApplied
        }
        Iterator.single((k, host))
      }.collect()
    hosts.foreach { case (k, host) => shardHosts(k) = host }
    appliedFloor = expectApplied
    pending.clear()
    needRebuild = false
  }

  /** Test seam: orphan one shard's registry entry (wrong generation), as
    * an executor loss / task migration would — the next probe must detect
    * it, rebuild from the store, and still answer correctly. */
  private[graft] def poisonShard(k: Int): Unit =
    ExecutorGateState.shardFor(storeKey, k, ttlEnabled, withIds).gen = "poisoned"

  /** Approximate total entries across shards (probe/spec telemetry). */
  def totalEntries: Long = {
    val (sKey, p, ttl, ids) = (storeKey, parts, ttlEnabled, withIds)
    val rdd = new GateTaskRDD(spark.sparkContext,
      Array.fill(p)(ShardTask(Array.empty, Array.empty)), shardHosts.clone())
    try rdd.mapPartitionsWithIndex { (k, _) =>
      Iterator.single(
        ExecutorGateState.shardFor(sKey, k, ttl, ids).idx.size.toLong)
    }.collect().sum finally rdd.destroy()
  }
}

private[graft] object ExecutorGateIndex {

  /** One exploded index entry: id is null when the gate is aux-complete. */
  final case class DeltaRow(bucket: Long, aux: Long, ts: Long, id: Any)

  /** One shard's per-task payload: probe rows + tagged index deltas. */
  final case class ShardTask(
      probes: Array[(Int, Long, Long, Long)],
      deltas: Array[(Long, DeltaRow)])

  /** Default state-partition count: ~one shard per 2 cores keeps probe
    * tasks short while leaving scheduler slots for the scan work. On a
    * real cluster this would be sized to executors × cores. */
  def defaultParts(spark: SparkSession): Int =
    math.max(4, spark.sparkContext.defaultParallelism / 2)

  /** Owner-nonce stamp: two LIVE instances sharing a store path have
    * different nonces, so interleaved probes would ping-pong full
    * O(store) rebuilds (each instance's generation orphans the other's
    * shards) rather than erroring. Each instance stamps its nonce at
    * construction; a probe finding someone else's stamp fails FAST with
    * the real diagnosis. Restart fixtures are unaffected — the abandoned
    * instance is never probed again. The marker is not `.parquet`, so
    * store scans/compaction never see it. */
  private[streaming] def stampOwner(dir: String, marker: String,
      nonce: String): Unit =
    graft.io.StoreFs.forRoot(dir).writeString(
      GateStore.child(dir, marker), nonce)

  private[streaming] def checkOwner(dir: String, marker: String,
      nonce: String, what: String): Unit = {
    val fs = graft.io.StoreFs.forRoot(dir)
    val f = GateStore.child(dir, marker)
    val cur =
      if (!fs.exists(f)) {
        // the whole store dir gone = the gate was DROPPED while this
        // instance lived (dropContTransform deletes root/<name> wholesale)
        // — this instance is the stale one; fail with that diagnosis
        // instead of letting stampOwner throw NoSuchFileException
        if (!fs.exists(dir))
          throw new IllegalStateException(
            s"$what at $dir: the store directory was deleted (gate " +
              "dropped?) while this instance was live — drop this instance")
        // marker alone deleted out-of-band (store dir cleaned/recreated
        // while instances live): RE-STAMP this caller's nonce instead of
        // assuming ownership, so another live instance still fails fast on
        // its next probe rather than silently reverting to rebuild ping-pong
        stampOwner(dir, marker, nonce)
        nonce
      }
      else fs.readString(f)
    if (cur != nonce) throw new IllegalStateException(
      s"$what at $dir was superseded by another live instance (owner " +
        s"stamp $cur != this instance's $nonce): two gates share one " +
        "store path — drop this instance, or give each its own store")
  }
}

/** Deterministic bucket→shard routing shared by probe grouping, delta
  * grouping, and the rebuild shuffle: floorMod(bucket, P). */
private[graft] final class BucketPartitioner(p: Int) extends Partitioner {
  override def numPartitions: Int = p
  override def getPartition(key: Any): Int =
    java.lang.Math.floorMod(key.asInstanceOf[Long], p.toLong).toInt
}

/** Stored-payload decode for the executor payload shards (the per-gate
  * resident form, duplicated NOWHERE: array copies only — verification
  * stays the gate's own `similar` on the driver). */
private[graft] sealed trait PayloadDecoder extends Serializable {
  def decode(r: org.apache.spark.sql.Row): AnyRef
}
private[graft] case object LongsPayload extends PayloadDecoder {
  def decode(r: org.apache.spark.sql.Row): AnyRef = r.getSeq[Long](1).toArray
}
private[graft] case object FloatsPayload extends PayloadDecoder {
  def decode(r: org.apache.spark.sql.Row): AnyRef = r.getSeq[Float](1).toArray
}

/** EXECUTOR-RESIDENT payload pool — phase 2's analogue of
  * [[ExecutorGateIndex]] for the split-store gates: (store id →
  * stored-precision payload) partitioned by id hash across executor-local
  * shards, so the candidate payload FETCH is memory lookups instead of an
  * id-pruned parquet read whose cost creeps toward O(store) as candidate
  * ids span every range shard. Per batch the driver ships the candidate
  * id set + the previous batch's payload delta in one P-partition job and
  * gets only the CANDIDATES' payloads back (bounded by true
  * sketch-admissible candidates); verification then runs on the driver
  * with the gate's own exact `similar` — one implementation of the math.
  * Ids the pool cannot answer (rebuild raced a compaction, etc.) fall
  * back to the gate's disk fetch — a pool miss is always correct, never
  * wrong. Same (generation, applied-batch) consistency protocol, stale →
  * one rebuild job from the durable payload store, and the same
  * preferred-location pinning. */
private[graft] final class ExecutorPayloadPool(
    spark: SparkSession,
    payloadDir: String,
    val parts: Int,
    payloadColName: String,
    decoder: PayloadDecoder) {

  import ExecutorPayloadPool.PayloadTask

  private val storeKey = payloadDir + "#pay"
  private val nonce = java.util.UUID.randomUUID().toString.take(8)
  ExecutorGateIndex.stampOwner(payloadDir, "_owner_pay", nonce)
  ExecutorGateState.registerLiveDir(storeKey)
  private var invalidations = 0L
  private def gen: String = s"$nonce:$invalidations"
  private var needRebuild = true
  private val shardHosts = new Array[String](parts)
  private val pending =
    new java.util.ArrayDeque[(Long, Array[(Any, AnyRef)])]()
  private var appliedFloor = -1L

  @inline private def shardOf(id: Any): Int =
    java.lang.Math.floorMod(if (id == null) 0 else id.hashCode, parts)

  /** Buffer batch `n`'s (id, resident payload) entries at the durable
    * payload commit; call for EVERY committed batch (empty included). */
  def bufferDelta(n: Long, entries: Array[(Any, AnyRef)]): Unit =
    synchronized { pending.addLast((n, entries)); () }

  /** Spec seam: undrained delta batches on the driver. The gate drains
    * every batch (even candidate-free ones), so this stays ≤ 1 — a grown
    * queue is the payload-accumulation bug the per-batch drain removes. */
  private[graft] def pendingDepthForSpec: Int = synchronized(pending.size)

  def invalidate(): Unit = synchronized {
    pending.clear()
    invalidations += 1
    needRebuild = true
  }

  /** Fetch the candidates' payloads: Map(id → resident payload). Shards
    * must cover ≤ batch-1 (the gate drains commits before deciding). */
  def fetch(ids: Array[Any], batch: Long): java.util.HashMap[Any, AnyRef] =
    synchronized {
      ExecutorGateIndex.checkOwner(payloadDir, "_owner_pay", nonce,
        "ExecutorPayloadPool")
      val expectApplied = batch - 1
      if (needRebuild) rebuildAll(expectApplied)
      val deltas = pending.toArray(Array.empty[(Long, Array[(Any, AnyRef)])])
      pending.clear()
      val floor = appliedFloor
      appliedFloor = expectApplied
      var out = runFetch(ids, deltas, floor, expectApplied)
      var attempts = 0
      while (out.isLeft && attempts < 2) {
        System.err.println(s"[graft] ExecutorPayloadPool($storeKey): " +
          s"shards ${out.swap.getOrElse(Nil).mkString(",")} stale; rebuilding from the store")
        rebuildAll(expectApplied)
        out = runFetch(ids, Array.empty, expectApplied, expectApplied)
        attempts += 1
      }
      out.getOrElse(throw new IllegalStateException(
        s"payload shards ${out.swap.getOrElse(Nil)} stale after $attempts rebuilds — $storeKey"))
    }

  private def runFetch(ids: Array[Any],
      deltas: Array[(Long, Array[(Any, AnyRef)])], floor: Long,
      expectApplied: Long): Either[Seq[Int], java.util.HashMap[Any, AnyRef]] = {
    val expectGen = gen
    val (sKey, p) = (storeKey, parts)
    val idPerShard = Array.fill(p)(new scala.collection.mutable.ArrayBuffer[Any]())
    ids.foreach(id => idPerShard(shardOf(id)) += id)
    val deltaPerShard =
      Array.fill(p)(new scala.collection.mutable.ArrayBuffer[(Long, Any, AnyRef)]())
    deltas.foreach { case (bn, entries) =>
      entries.foreach(e => deltaPerShard(shardOf(e._1)) += ((bn, e._1, e._2)))
    }
    val payload = (0 until p).map(k =>
      PayloadTask(idPerShard(k).toArray, deltaPerShard(k).toArray)).toArray
    val rdd = new GateTaskRDD(spark.sparkContext, payload, shardHosts.clone())
    val results = try rdd.mapPartitionsWithIndex { (k, it) =>
      val task = it.next()
      val host = ExecutorGateState.taskLocation
      val shard = ExecutorGateState.payloadShardFor(sKey, k)
      shard.synchronized {
        if (shard.gen != expectGen || shard.applied != floor) {
          Iterator.single((k, host, true, Array.empty[(Any, AnyRef)]))
        } else {
          task.deltas.sortBy(_._1).foreach { case (_, id, pay) =>
            shard.map.put(id, pay); ()
          }
          shard.applied = expectApplied
          val out = task.ids.flatMap { id =>
            Option(shard.map.get(id)).map(id -> _)
          }
          Iterator.single((k, host, false, out))
        }
      }
    }.collect() finally rdd.destroy()
    results.foreach { case (k, host, _, _) => shardHosts(k) = host }
    val stale = results.collect { case (k, _, true, _) => k }.toSeq
    if (stale.nonEmpty) Left(stale)
    else {
      val out = new java.util.HashMap[Any, AnyRef]()
      results.foreach(_._4.foreach { case (id, pay) => out.put(id, pay); () })
      Right(out)
    }
  }

  private def rebuildAll(expectApplied: Long): Unit = {
    invalidations += 1
    val expectGen = gen
    val (sKey, p, dec) = (storeKey, parts, decoder)
    val files = GateStore.files(payloadDir)
    val rows =
      if (files.isEmpty) spark.sparkContext.emptyRDD[(Any, AnyRef)]
      else spark.read.parquet(files.toSeq: _*)
        .select(col("id"), col(payloadColName)).rdd
        .map(r => (r.get(0), dec.decode(r)))
    val parted = rows.partitionBy(new Partitioner {
      override def numPartitions: Int = p
      override def getPartition(key: Any): Int =
        java.lang.Math.floorMod(if (key == null) 0 else key.hashCode, p)
    })
    val hosts = parted.mapPartitionsWithIndex { (k, it) =>
      val host = ExecutorGateState.taskLocation
      val shard = ExecutorGateState.payloadShardFor(sKey, k)
      shard.synchronized {
        shard.map.clear()
        it.foreach { case (id, pay) => shard.map.put(id, pay); () }
        shard.gen = expectGen
        shard.applied = expectApplied
      }
      Iterator.single((k, host))
    }.collect()
    hosts.foreach { case (k, host) => shardHosts(k) = host }
    appliedFloor = expectApplied
    pending.clear()
    needRebuild = false
  }
}

private[graft] object ExecutorPayloadPool {
  /** One payload shard's task payload: candidate ids + tagged deltas. */
  final case class PayloadTask(
      ids: Array[Any], deltas: Array[(Long, Any, AnyRef)])
}

/** EXECUTOR-RESIDENT seen-key store — the EXACT dedup gate's distributed
  * membership tier: (key → max seen-time) partitioned by key hash across
  * executor-local shards. Replaces the gate's two corpus-scale driver
  * structures at once: the Bloom filter (billions of keys at 100 TB =
  * GB-scale driver bits) and the pruned store-presence read. Per batch
  * the driver ships the batch's distinct keys + the previous batch's
  * delta in one P-partition job and gets back only the PRESENT keys
  * (bounded by true duplicates); deltas are tagged with a self-issued
  * monotone sequence (the gate drains its commit pipeline before every
  * decision, so everything below the floor is already durable and a
  * rebuild — one distributed scan of the (h[, ts]) store, maxing
  * seen-times per key — always covers the shards' knowledge). Same
  * stale-detect/rebuild/pinning protocol as [[ExecutorGateIndex]].
  *
  * `keyCol` names the store's key column: "h" for the dedup gate's
  * seen-keys store, "gh" for the contamination gate's STATIC reference-
  * gram store (which never calls [[bufferDelta]] — membership only). */
private[graft] final class ExecutorSeenStore(
    spark: SparkSession,
    storeDir: String,
    val parts: Int,
    ttlEnabled: Boolean,
    keyCol: String = "h") {

  import ExecutorPayloadPool.PayloadTask

  private val storeKey = storeDir + "#seen"
  private val nonce = java.util.UUID.randomUUID().toString.take(8)
  ExecutorGateIndex.stampOwner(storeDir, "_owner_seen", nonce)
  ExecutorGateState.registerLiveDir(storeKey)
  private var invalidations = 0L
  private def gen: String = s"$nonce:$invalidations"
  private var needRebuild = true
  private val shardHosts = new Array[String](parts)
  private var seq = 0L // self-issued delta sequence
  private val pending = new java.util.ArrayDeque[(Long, Array[(Any, Long)])]()
  private var appliedFloor = -1L

  @inline private def shardOf(id: Any): Int =
    java.lang.Math.floorMod(if (id == null) 0 else id.hashCode, parts)

  /** Buffer (key, seen-time micros) entries at the durable key-store
    * commit (ts = Long.MinValue unwindowed). */
  def bufferDelta(entries: Array[(Any, Long)]): Unit = synchronized {
    seq += 1
    pending.addLast((seq, entries))
    ()
  }

  def invalidate(): Unit = synchronized {
    pending.clear()
    invalidations += 1
    needRebuild = true
  }

  /** Membership lookup: key → max stored seen-time for every PRESENT key
    * of `keys` (unwindowed entries carry Long.MinValue — presence is the
    * signal). */
  def lookup(keys: Array[Any]): java.util.HashMap[Any, java.lang.Long] =
    synchronized {
      ExecutorGateIndex.checkOwner(storeDir, "_owner_seen", nonce,
        "ExecutorSeenStore")
      val expectApplied = seq
      if (needRebuild) rebuildAll(expectApplied)
      val deltas = pending.toArray(Array.empty[(Long, Array[(Any, Long)])])
      pending.clear()
      val floor = appliedFloor
      appliedFloor = expectApplied
      var out = runLookup(keys, deltas, floor, expectApplied)
      var attempts = 0
      while (out.isLeft && attempts < 2) {
        System.err.println(s"[graft] ExecutorSeenStore($storeKey): shards " +
          s"${out.swap.getOrElse(Nil).mkString(",")} stale; rebuilding from the store")
        rebuildAll(expectApplied)
        out = runLookup(keys, Array.empty, expectApplied, expectApplied)
        attempts += 1
      }
      out.getOrElse(throw new IllegalStateException(
        s"seen-store shards ${out.swap.getOrElse(Nil)} stale after $attempts rebuilds — $storeKey"))
    }

  private def runLookup(keys: Array[Any],
      deltas: Array[(Long, Array[(Any, Long)])], floor: Long,
      expectApplied: Long)
      : Either[Seq[Int], java.util.HashMap[Any, java.lang.Long]] = {
    val expectGen = gen
    val (sKey, p) = (storeKey, parts)
    val keyPerShard = Array.fill(p)(new scala.collection.mutable.ArrayBuffer[Any]())
    keys.foreach(k => keyPerShard(shardOf(k)) += k)
    val deltaPerShard =
      Array.fill(p)(new scala.collection.mutable.ArrayBuffer[(Long, Any, AnyRef)]())
    deltas.foreach { case (sn, entries) =>
      entries.foreach(e =>
        deltaPerShard(shardOf(e._1)) += ((sn, e._1, java.lang.Long.valueOf(e._2))))
    }
    val payload = (0 until p).map(k =>
      PayloadTask(keyPerShard(k).toArray, deltaPerShard(k).toArray)).toArray
    val rdd = new GateTaskRDD(spark.sparkContext, payload, shardHosts.clone())
    val results = try rdd.mapPartitionsWithIndex { (k, it) =>
      val task = it.next()
      val host = ExecutorGateState.taskLocation
      val shard = ExecutorGateState.payloadShardFor(sKey, k)
      shard.synchronized {
        if (shard.gen != expectGen || shard.applied != floor) {
          Iterator.single((k, host, true, Array.empty[(Any, AnyRef)]))
        } else {
          task.deltas.sortBy(_._1).foreach { case (_, key, ts) =>
            val t = ts.asInstanceOf[java.lang.Long]
            val prev = shard.map.get(key).asInstanceOf[java.lang.Long]
            if (prev == null || t.longValue > prev.longValue)
              shard.map.put(key, t)
            ()
          }
          shard.applied = expectApplied
          val out = task.ids.flatMap { key =>
            Option(shard.map.get(key)).map(key -> _)
          }
          Iterator.single((k, host, false, out))
        }
      }
    }.collect() finally rdd.destroy()
    results.foreach { case (k, host, _, _) => shardHosts(k) = host }
    val stale = results.collect { case (k, _, true, _) => k }.toSeq
    if (stale.nonEmpty) Left(stale)
    else {
      val out = new java.util.HashMap[Any, java.lang.Long]()
      results.foreach(_._4.foreach { case (key, t) =>
        out.put(key, t.asInstanceOf[java.lang.Long]); ()
      })
      Right(out)
    }
  }

  private def rebuildAll(expectApplied: Long): Unit = {
    invalidations += 1
    val expectGen = gen
    val (sKey, p, ttl) = (storeKey, parts, ttlEnabled)
    val files = GateStore.files(storeDir)
    val rows =
      if (files.isEmpty) spark.sparkContext.emptyRDD[(Any, Long)]
      else {
        val cols = Seq(col(keyCol)) ++
          (if (ttl) Seq(unix_micros(col("ts"))) else Nil)
        spark.read.parquet(files.toSeq: _*).select(cols: _*).rdd
          .map(r => (r.get(0), if (ttl && !r.isNullAt(1)) r.getLong(1)
                               else Long.MinValue))
      }
    val parted = rows.partitionBy(new Partitioner {
      override def numPartitions: Int = p
      override def getPartition(key: Any): Int =
        java.lang.Math.floorMod(if (key == null) 0 else key.hashCode, p)
    })
    val hosts = parted.mapPartitionsWithIndex { (k, it) =>
      val host = ExecutorGateState.taskLocation
      val shard = ExecutorGateState.payloadShardFor(sKey, k)
      shard.synchronized {
        shard.map.clear()
        it.foreach { case (key, t) =>
          val prev = shard.map.get(key).asInstanceOf[java.lang.Long]
          if (prev == null || t > prev.longValue)
            shard.map.put(key, java.lang.Long.valueOf(t))
          ()
        }
        shard.gen = expectGen
        shard.applied = expectApplied
      }
      Iterator.single((k, host))
    }.collect()
    hosts.foreach { case (k, host) => shardHosts(k) = host }
    appliedFloor = expectApplied
    pending.clear()
    needRebuild = false
  }
}

/** Executor-side shard registry — JVM-global so state outlives jobs. One
  * writer at a time per shard (the gate serializes its batches; rebuild
  * and probe both take the shard monitor). */
private[graft] object ExecutorGateState {

  final class Shard(ttlEnabled: Boolean, withIds: Boolean) {
    @volatile var gen: String = ""
    @volatile var applied: Long = Long.MinValue
    // unbudgeted by DESIGN: a shard holds store/P entries and the real
    // bound is the executor heap × the cluster's executor count — the
    // point of the tier. (Long.MaxValue disables ResidentIndex's budget.)
    val idx = new ResidentIndex(hasOrd = ttlEnabled || withIds, Long.MaxValue)
    private val tss = new scala.collection.mutable.ArrayBuffer[Long]()
    private val idPool = new scala.collection.mutable.ArrayBuffer[Any]()
    def ts(ord: Int): Long = tss(ord)
    def id(ord: Int): Any = idPool(ord)
    def add(bucket: Long, aux: Long, tsMicros: Long, rowId: Any): Unit = {
      val needOrd = ttlEnabled || withIds
      val ord =
        if (!needOrd) -1
        else {
          if (ttlEnabled) tss += tsMicros
          if (withIds) idPool += rowId
          math.max(tss.length, idPool.length) - 1
        }
      idx.add(bucket, aux, ord)
      ()
    }
    def reset(): Unit = { idx.reset(); tss.clear(); idPool.clear() }
  }

  private val shards = new ConcurrentHashMap[String, Shard]()

  /** The running task's pin target, at EXECUTOR granularity (Spark's
    * `executor_<host>_<id>` TaskLocation form): the registry is per-JVM,
    * so a host-level pin would be satisfied by the WRONG executor when
    * two share a host — the shard would read as permanently stale. Local
    * mode pins by host (one JVM; locality is trivially satisfied). */
  def taskLocation: String = {
    val env = org.apache.spark.SparkEnv.get
    val host = env.blockManager.blockManagerId.host
    if (env.executorId == "driver") host
    else s"executor_${host}_${env.executorId}"
  }

  def shardFor(storeKey: String, k: Int, ttl: Boolean, ids: Boolean): Shard =
    // config flags are part of the KEY: a gate re-created at a reused path
    // with different windowing must get fresh shards, not a Shard whose
    // baked-in ttl/ids layout is wrong (generation fencing resets data,
    // not construction flags)
    shards.computeIfAbsent(s"$storeKey#$k#$ttl#$ids", _ => new Shard(ttl, ids))

  /** One payload shard: (id → resident payload) + the same consistency
    * header as [[Shard]]. */
  final class PayloadShard {
    @volatile var gen: String = ""
    @volatile var applied: Long = Long.MinValue
    val map = new java.util.HashMap[Any, AnyRef]()
  }

  private val payloadShards = new ConcurrentHashMap[String, PayloadShard]()

  def payloadShardFor(storeKey: String, k: Int): PayloadShard =
    payloadShards.computeIfAbsent(s"$storeKey#$k", _ => new PayloadShard)

  /** Store dirs with LIVE executor-tier instances constructed by THIS
    * driver — lets the drop path skip the cluster-wide sweep job for the
    * (common) gates that never used the executor backend. */
  private val liveDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[streaming] def registerLiveDir(dir: String): Unit = {
    liveDirs.add(dir); ()
  }

  /** Drop-path eviction across the WHOLE cluster: sweep this JVM's
    * registry, then — when the dropped store ever had executor-tier
    * instances and the master is not local — run one short job with a
    * task per core slot so every executor JVM sweeps its own registry
    * (at stage submit the scheduler fills every free slot in one wave,
    * so ≥ totalSlots instantaneous tasks reach every executor; the
    * visited-executor check retries the rare miss). Without this, a
    * dropped gate's REMOTE shards — generation-fenced, so never read
    * again — would wait for executor recycle to free their heap.
    * Reference anchor: the reaper/terminate path frees per-CQ combiner
    * state (scheduler.c:584-698), it does not leak it until process
    * exit. */
  /** Store dirs whose drop sweep gave up before reaching every executor
    * (value = executors missed by the LATEST give-up wave — an
    * APPROXIMATION: a retry that misses a different executor overwrites
    * the count, so the number says "how behind is the newest attempt",
    * not "exactly which JVMs still leak"): each missed JVM's registry
    * keeps the dropped gates' generation-fenced shards (never read
    * again, but heap-resident) until executor recycle OR a later sweep.
    * EVERY subsequent [[dropDistributedUnder]] — including one whose own
    * dir has no executor shards — retries the pending dirs in its tasks
    * and clears them once a wave reaches the whole cluster, so the leak
    * SELF-HEALS at the next drop of any gate instead of persisting
    * silently. Surfaced (as the missed-executor sum) via
    * `graft_gate_stats.pendingRemoteDrops`. */
  private val pendingDropDirs =
    new ConcurrentHashMap[String, Integer]()
  def pendingRemoteDrops: Long =
    pendingDropDirs.values().stream().mapToLong(_.toLong).sum()
  /** Test seams: spoof the cluster's executor count (forces the sweep to
    * miss "executors" no wave can reach) / reset the session state. */
  private[graft] var spoofExecutorCount: Option[Int] = None
  private[graft] def resetPendingRemoteDrops(): Unit = {
    pendingDropDirs.clear(); ()
  }

  def dropDistributedUnder(spark: SparkSession, dir: String): Unit = {
    dropUnder(dir)
    val prefix = if (dir.endsWith("/")) dir else dir + "/"
    var had = false
    val it = liveDirs.iterator()
    while (it.hasNext) {
      val d = it.next()
      if (d == dir || d.startsWith(prefix) || d.startsWith(dir + "#")) {
        it.remove(); had = true
      }
    }
    val sc = spark.sparkContext
    // run the sweep when THIS dir had executor-tier shards, OR when a
    // previous sweep left pending debt — otherwise a cluster that never
    // drops another executor-backed gate would keep the leaked shards
    // until executor recycle, making the "self-heal" conditional on
    // unrelated future work
    if (sc.isLocal || (!had && pendingDropDirs.isEmpty)) return
    def executors(): Int = spoofExecutorCount.getOrElse(
      math.max(0, sc.statusTracker.getExecutorInfos.length - 1))
    // this sweep also retries every dir a PREVIOUS sweep gave up on --
    // the task payload is a name list, so piggybacking costs nothing
    val dirs: Seq[String] =
      dir +: pendingDropDirs.keySet().toArray(Array.empty[String]).toSeq
    val visited = scala.collection.mutable.Set[String]()
    var attempts = 0
    while (attempts < 3 && visited.size < executors()) {
      val slots = math.max(sc.defaultParallelism, executors() * 2) * 2
      visited ++= sc.parallelize(0 until slots, slots).mapPartitions { _ =>
        dirs.foreach(ExecutorGateState.dropUnder)
        Iterator.single(org.apache.spark.SparkEnv.get.executorId)
      }.collect()
      attempts += 1
    }
    val missed = executors() - visited.size
    if (missed <= 0) {
      // full-cluster wave: every pending dir was swept everywhere, so any
      // previously-leaked dead shards are gone -- the counter self-heals
      if (!pendingDropDirs.isEmpty) {
        pendingDropDirs.clear()
        System.err.println(s"[graft] drop sweep for $dir reached all " +
          s"${executors()} executors; previously-pending drops cleared " +
          "(graft_gate_stats.pendingRemoteDrops back to 0)")
      }
    } else {
      // LOUD give-up: a sweep that never reached every executor leaves
      // heap-resident (dead) shards there until recycle OR a later full
      // sweep (the retry above) -- record it and name what we know,
      // instead of exiting without a trace. Record only dirs that ever
      // HELD executor shards (this dir when had, plus the already-pending
      // debt) -- a shard-less dir riding the retry piggyback must not
      // inflate the counter
      val record = (if (had) Seq(dir) else Nil) ++ dirs.drop(1)
      record.foreach(d => pendingDropDirs.put(d, Integer.valueOf(missed)))
      System.err.println(s"[graft] drop sweep for $dir gave up after " +
        s"$attempts waves: reached ${visited.size} of ${executors()} " +
        s"executors (ids ${visited.toSeq.sorted.mkString(",")}) -- $missed " +
        "executor(s) keep dead shards until recycle or the next full " +
        "sweep (graft_gate_stats.pendingRemoteDrops)")
    }
  }

  /** Drop-path eviction, THIS JVM only: free every shard registered under
    * a store-root prefix (the engine deletes `root/<gate>/` wholesale).
    * Executor tasks of [[dropDistributedUnder]]'s sweep job call this in
    * their own JVMs. */
  def dropUnder(dir: String): Unit = {
    val prefix = if (dir.endsWith("/")) dir else dir + "/"
    def sweep[V](m: ConcurrentHashMap[String, V]): Unit = {
      val it = m.keySet().iterator()
      while (it.hasNext) {
        val k = it.next()
        if (k.startsWith(prefix) || k.startsWith(dir + "#")) it.remove()
      }
    }
    sweep(shards)
    sweep(payloadShards)
  }

  /** Test seam: live registry entries under a store-root prefix. */
  private[graft] def registeredUnder(dir: String): Int = {
    val prefix = if (dir.endsWith("/")) dir else dir + "/"
    def count[V](m: ConcurrentHashMap[String, V]): Int = {
      var n = 0
      m.keySet().forEach(k =>
        if (k.startsWith(prefix) || k.startsWith(dir + "#")) n += 1)
      n
    }
    count(shards) + count(payloadShards)
  }
}

/** An RDD whose P partitions each carry ONE pre-grouped task payload and
  * prefer the executor that last hosted their shard — the minimal form of
  * Structured Streaming's StateStoreRDD placement contract. No shuffle:
  * the payload is batch-bounded, grouped on the driver, and ships as ONE
  * BROADCAST of the per-shard array — partitions carry only their index,
  * so tasks serialize small (kilobytes) however large the batch; probe
  * slices riding the Partition objects instead were serialized through
  * the scheduler per task (measured "task of very large size (1696 KiB)"
  * warnings at 5k-row batches — tens of MB of driver→executor closure
  * traffic per 100k-row batch). Callers MUST [[destroy]] after the job —
  * one probe per batch would otherwise leak a broadcast per batch. */
private[graft] final class GateTaskRDD[T: scala.reflect.ClassTag](
    sc: SparkContext,
    @transient private val payload: Array[T],
    hosts: Array[String])
  extends RDD[T](sc, Nil) {

  private val bc = sc.broadcast(payload)

  override def getPartitions: Array[Partition] =
    payload.indices.map(i => new GateTaskPartition(i): Partition).toArray

  override def compute(split: Partition, context: TaskContext): Iterator[T] =
    Iterator.single(bc.value(split.index))

  override def getPreferredLocations(split: Partition): Seq[String] = {
    val h = hosts(split.index)
    if (h == null || h.isEmpty) Nil else Seq(h)
  }

  /** Release the batch's broadcast blocks — driver AND executor copies.
    * In Spark 4 the no-arg `Broadcast.destroy()` delegates to
    * `destroy(blocking = false)` (verified in spark-core 4.1.2 bytecode:
    * `destroy()` loads iconst_0), so this is an async message, not a
    * per-job synchronous round-trip — unlike `unpersist(false)`, which
    * frees only executor copies and leaves the DRIVER block to linger
    * until the Broadcast object is GC'd and ContextCleaner reaps it. */
  def destroy(): Unit = bc.destroy()
}

private final class GateTaskPartition(override val index: Int)
  extends Partition
