package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cv.ContViewEngine

/** The per-batch lifecycle a near-dup gate core exposes so G key-slice
  * cores can cooperate on ONE batch under a [[ShardedNearDupGate]] wrapper
  * (and so the unsharded gate is just the G=1 composition of the same
  * pieces — one implementation of every phase):
  *
  *  1. [[prepareBatch]]    — project the payload column, persist (once,
  *                           shared by every core);
  *  2. [[collectBatchRows]] — ONE bounded driver collect of (orderCol,
  *                           payload) (once, shared);
  *  3. [[decideBatch]]     — the suppression decision over the core's OWN
  *                           key slice (within-batch pairing + store
  *                           candidates), returning an opaque ctx;
  *  4. (wrapper)           — union the suppressed sets, forward survivors
  *                           to the sink ONCE (sink before store append —
  *                           the family's at-least-once contract);
  *  5. [[commitPayloadBatch]] — the shared payload-store append (core 0
  *                           only — payloads are NOT duplicated per core);
  *  6. [[commitIndexBatch]] — the core's index-slice append + driver
  *                           filter updates;
  *  7. [[maybeCompact]]    — per-core compaction cadence.
  */
private[streaming] trait ShardableGateCore {
  private[streaming] def prepareBatch(batch: DataFrame,
      obs: Option[org.apache.spark.sql.Observation]): DataFrame
  private[streaming] def collectBatchRows(keyed: DataFrame): AnyRef
  private[streaming] def decideBatch(keyed: DataFrame, rows: AnyRef): AnyRef
  /** Verify work that reads SHARED state (the split-store gates' payload
    * fetch): run ONCE by the wrapper over every core's merged candidates
    * — per-core verification of a shared store would multiply the read by
    * G. Returns additional suppressed ids; default none. */
  private[streaming] def verifySharedPairs(ctxs: Seq[AnyRef]): java.util.HashSet[Any] =
    new java.util.HashSet[Any]()
  private[streaming] def suppressedOf(ctx: AnyRef): java.util.HashSet[Any]
  private[streaming] def survivorsOf(keyed: DataFrame,
      sup: java.util.HashSet[Any]): DataFrame
  /** The order-id column name (the exactly-once spool builds its
    * `__admitted` flag over it — [[GateEpochs.spool]]). */
  private[streaming] def orderColName: String
  private[streaming] def commitPayloadBatch(ctx: AnyRef): Unit
  private[streaming] def commitIndexBatch(ctx: AnyRef): Unit
  /** Exactly-once recovery hook ([[GateEpochs]]): re-derive this core's
    * store appends for `epoch` from the spooled full batch — skipping any
    * store already at or past it — and sync the batch counter. Stateless
    * gates need nothing. */
  private[streaming] def commitRecovered(spooled: DataFrame, epoch: Long): Unit = ()
  /** Pre-spool half of the exactly-once RETRY-DEDUP WINDOW, for cores
    * whose decisions are STATELESS (the contamination gate): add ids the
    * window has seen in recent epochs to `sup` (an upstream's crash-retry
    * of an already-delivered epoch would otherwise be re-admitted — the
    * stateful gates get this suppression from their seen-stores for
    * free), and return this batch's id set for [[rememberRetryIds]].
    * The remember MUST wait for the spool commit point: remembering
    * before it would suppress the retry of a batch that crashed PRE-spool
    * — dropping the batch outright. Stateful cores return null. */
  private[streaming] def retrySuppress(keyed: DataFrame,
      sup: java.util.HashSet[Any]): java.util.HashSet[Any] = null
  /** Post-spool half: remember the epoch's ids in the retry window. */
  private[streaming] def rememberRetryIds(ids: java.util.HashSet[Any]): Unit = ()
  /** Highest batch number persisted in this core's stores (the sharded
    * wrapper's epoch-counter floor on restart). */
  private[streaming] def storeMaxBatch: Long = 0L
  private[streaming] def maybeCompact(): Unit
  private[streaming] def compactNow(): Unit
  private[graft] def seedStore(rows: DataFrame): Unit
  /** The core's durable store directories — the [[CommitPipeline]]
    * cross-instance drain keys (same-JVM restart fixtures). */
  private[streaming] def storeRoots: Seq[String] = Nil
}

/** G key-slice cores of one near-dup gate running each batch's suppression
  * decision CONCURRENTLY — the horizontal scale-out of the gate family's
  * single-driver decision loop. Ownership is by KEY POSITION: banded LSH
  * emits one key per band/table position, and core k owns positions ≡ k
  * (mod G), so every bucket collision — within the batch or against the
  * store — is decided by exactly one core and the union of the cores'
  * suppressed sets equals the unsharded gate's set exactly (exact
  * verification dedups either way). Each core owns its own index-slice
  * store (range-sharded within the slice) and its own driver bloom/CMS —
  * at 1/G the size — while the (id, payload) store is SHARED and written
  * once per batch by core 0.
  *
  * What scales: per-core store slices, driver filters, driver-side pairing
  * loops, and the candidate reads all shrink by G, and the G decisions run
  * on independent threads (independent Spark jobs — on a cluster, each
  * core's reads fan out to executors concurrently). What does not: the
  * one batch collect and the one survivor forward, both bounded by batch
  * size. Delivery, restart, and null semantics are the family's: the
  * wrapper forwards survivors BEFORE any store append; a re-created
  * wrapper on the same store root re-binds G bootstrapped cores; the
  * shard count is stamped into the store root and a mismatched reopen is
  * refused (slices would silently mix).
  */
final class ShardedNearDupGate private[streaming] (
    eng: ContViewEngine,
    val name: String,
    sink: String,
    cores: Seq[ShardableGateCore],
    spoolRoot: Option[String] = None,
    delivery: String = StreamDedupGate.AtLeastOnce) {

  require(cores.nonEmpty, "sharded gate needs at least one core")
  require(delivery == StreamDedupGate.AtLeastOnce ||
    delivery == StreamDedupGate.ExactlyOnce,
    s"unknown delivery mode '$delivery'")
  require(delivery == StreamDedupGate.AtLeastOnce || spoolRoot.nonEmpty,
    "exactly_once sharded gate needs a spool root")

  private val exactlyOnce = delivery == StreamDedupGate.ExactlyOnce
  /** ONE spool for the whole wrapper — the batch is decided jointly, so
    * the epoch protocol runs at wrapper level and recovery replays each
    * core's store slice from the same spooled batch ([[GateEpochs]]). */
  // internal columns whichever core family prepared the batch may carry
  // (Spark's drop ignores absent names; simhash's `fp` is documented sink
  // payload and stays)
  private[graft] lazy val epochs = new GateEpochs(eng, name, sink,
    GateStore.child(spoolRoot.getOrElse("."), "spool"),
    cores, dropCols = Seq("__p", "__gh"))

  private val pool = java.util.concurrent.Executors.newFixedThreadPool(
    cores.size,
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger()
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-gate-$name-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    })

  private var batches = 0L
  private var admitted = 0L
  private var suppressed = 0L

  locally {
    if (exactlyOnce) {
      // store-half recovery (delivery at the next batch head — the DDL
      // replay path may hold the engine's registration lock here), and the
      // epoch-counter floor: restart must not reuse committed epoch numbers
      epochs.recoverStores()
      batches = math.max(epochs.maxEpoch(),
        cores.map(_.storeMaxBatch).foldLeft(0L)(math.max))
    }
  }

  /** (batches, admitted survivors, suppressed duplicates) so far. */
  def stats: (Long, Long, Long) = synchronized((batches, admitted, suppressed))

  def shardCount: Int = cores.size
  private[graft] def firstCore: ShardableGateCore = cores.head

  private def inPool[T](fs: Seq[() => T]): Seq[T] = {
    val futs = fs.map(f => pool.submit(
      new java.util.concurrent.Callable[T] { def call(): T = f() }))
    futs.map(_.get())
  }

  // opt-in phase timing on stderr (GRAFT_GATE_TRACE=1) — dev diagnosis only
  private val trace = sys.env.get("GRAFT_GATE_TRACE").contains("1")
  @inline private def traced[T](label: String)(f: => T): T =
    if (!trace) f
    else {
      val t0 = System.nanoTime()
      val out = f
      System.err.println(f"[gate-trace] sh-$name%s $label%s ${(System.nanoTime() - t0) / 1e3}%.0f us")
      out
    }

  /** Deferred-commit pipeline (at-least-once batches; [[CommitPipeline]]
    * documents the ordering contract): ONE wrapper-level task per batch —
    * the cores' appends of batch N overlap batch N+1's prepare/collect,
    * while decides still serialize on the committed store state. */
  private val pipeline =
    new CommitPipeline(s"sh-$name", cores.flatMap(_.storeRoots).distinct)
  /** Test/stats seam: see [[CommitPipeline]]. */
  private[graft] def commitPipeline: CommitPipeline = pipeline
  private val ingestLock = new Object

  /** Barrier for callers about to read or delete the durable stores
    * (engine drop path, probes): joins any deferred commit. */
  private[graft] def drainCommits(): Unit = pipeline.drain()

  /** Deliver any epoch the last crash interrupted RIGHT NOW (instead of
    * at the next batch head — a quiet stream would otherwise withhold a
    * spool-committed epoch's rows indefinitely). Must not be called while
    * holding engine locks. No-op in at-least-once mode. */
  def recover(): Unit =
    if (exactlyOnce) { pipeline.drain(); synchronized(epochs.recoverPending()) }

  private[streaming] def onBatch(batch: DataFrame): Unit = ingestLock.synchronized { traced("sh-total") {
    if (exactlyOnce) { pipeline.drain(); epochs.recoverPending() }
    val epoch0 = synchronized { batches += 1; batches }
    val obs = new org.apache.spark.sql.Observation(s"shgate_${name}_$epoch0")
    val keyed = cores.head.prepareBatch(batch, Some(obs))
    var deferred = false
    try {
      val rows = traced("sh-collect")(cores.head.collectBatchRows(keyed))
      pipeline.drain() // decisions serialize on the committed store state
      val ctxs = traced("sh-decide")(
        inPool(cores.map(c => () => c.decideBatch(keyed, rows))))
      val sup = new java.util.HashSet[Any]()
      cores.zip(ctxs).foreach { case (c, ctx) => sup.addAll(c.suppressedOf(ctx)) }
      // shared-store verification (split-store gates): one payload fetch
      // over the union of every core's candidates
      sup.addAll(traced("sh-verify")(cores.head.verifySharedPairs(ctxs)))
      // retry-dedup window (stateless-decision cores, exactly-once only):
      // suppress re-fed ids from recent epochs BEFORE counting/spooling;
      // the window state lives on core 0 — row identity is wrapper-wide,
      // not key-sliced, so one core's window covers the joint decision
      val retryIds =
        if (exactlyOnce) cores.head.retrySuppress(keyed, sup) else null
      val total = obs.get("rows").asInstanceOf[Long]
      val n = total - sup.size
      synchronized { admitted += n; suppressed += total - n }
      if (exactlyOnce) {
        // epoch protocol at WRAPPER level ([[GateEpochs]]): one spool per
        // jointly-decided batch; each core's slice replays from it. The
        // spool is the commit point — exactly-once never defers.
        val epoch = epoch0
        epochs.failpoint("before-spool")
        epochs.spool(epoch, keyed, cores.head.orderColName, sup)
        // remember only AFTER the spool commit point (see retrySuppress)
        if (retryIds != null) cores.head.rememberRetryIds(retryIds)
        epochs.failpoint("after-spool")
        traced("sh-pay")(cores.head.commitPayloadBatch(ctxs.head))
        traced("sh-idx")(inPool(
          cores.zip(ctxs).map { case (c, ctx) => () => c.commitIndexBatch(ctx) }))
        epochs.failpoint("after-store")
        epochs.deliverAndMark(epoch, knownNonEmpty = Some(n > 0))
      } else {
        // sink BEFORE store append (at-least-once under failure-retry)
        if (n > 0) traced("sh-sink")(
          eng.insertInto(sink, cores.head.survivorsOf(keyed, sup)))
        // shared payload lands FIRST (core 0), index slices second — an
        // index entry must never outlive a crash its payload didn't survive
        // longer than the batch's own retry
        if (CommitPipeline.enabled) {
          deferred = true
          pipeline.submit({ () =>
            try {
              traced("sh-pay")(cores.head.commitPayloadBatch(ctxs.head))
              traced("sh-idx")(inPool(
                cores.zip(ctxs).map { case (c, ctx) => () => c.commitIndexBatch(ctx) }))
              inPool(cores.map(c => () => c.maybeCompact()))
              ()
            } finally { keyed.unpersist(); () }
          }, label = s"batch $epoch0")
        } else {
          traced("sh-pay")(cores.head.commitPayloadBatch(ctxs.head))
          traced("sh-idx")(inPool(
            cores.zip(ctxs).map { case (c, ctx) => () => c.commitIndexBatch(ctx) }))
        }
      }
      ()
    } finally { if (!deferred) { keyed.unpersist(); () } }
    if (!deferred) { inPool(cores.map(c => () => c.maybeCompact())); () }
  } }

  /** Probe seeding hook: stand up a pre-populated store without the join
    * path (every core appends its slice; core 0 the shared payloads). */
  private[graft] def seedStore(rows: DataFrame): Unit = synchronized {
    pipeline.drain()
    cores.foreach(_.seedStore(rows))
  }

  /** Per-core compaction fold (also runs on the per-core cadence). */
  def compact(): Unit = synchronized {
    pipeline.drain()
    inPool(cores.map(c => () => { c.compactNow(); () })); ()
  }
}

/** G key-space shards of the EXACT dedup gate: rows route to core
  * hash(key) mod G, so each core sees a DISJOINT key slice and the full
  * single-core gate (first-wins ordering, bloom, store, sink forward,
  * delivery contract) applies unchanged per slice — the wrapper is a pure
  * router whose G decisions run concurrently. Null keys hash to a
  * constant and ride one core, where the key-null pass-through rule
  * applies as ever. Aggregate suppression equals the unsharded gate's
  * exactly: two rows share a key iff they share a core.
  */
final class ShardedDedupGate private[streaming] (
    eng: ContViewEngine,
    val name: String,
    keySql: String,
    cores: Seq[StreamDedupGate]) {

  require(cores.size >= 2, "sharded dedup gate needs at least two cores")

  private val pool = java.util.concurrent.Executors.newFixedThreadPool(
    cores.size,
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger()
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-gate-$name-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    })

  private var batchesN = 0L

  /** (batches, admitted, suppressed) — admitted/suppressed aggregate the
    * per-core counters (each core counts its own routed slice). */
  def stats: (Long, Long, Long) = synchronized {
    val per = cores.map(_.stats)
    (batchesN, per.map(_._2).sum, per.map(_._3).sum)
  }

  /** Deferred commits lost across every routed core (`graft_gate_stats`). */
  private[graft] def lostCommits: Long =
    cores.map(_.commitPipeline.lostCommits).sum

  /** Test seam: the routed cores (failpoint/drain access). */
  private[graft] def coreGates: Seq[StreamDedupGate] = cores

  def shardCount: Int = cores.size

  private def shardCol = pmod(xxhash64(expr(keySql)), lit(cores.size))

  private[streaming] def onBatch(batch: DataFrame): Unit = synchronized {
    batchesN += 1
    val keyed = batch.persist()
    try {
      val futs = cores.zipWithIndex.map { case (c, k) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = c.onBatch(keyed.where(shardCol === lit(k)))
        })
      }
      futs.foreach(_.get())
    } finally { keyed.unpersist(); () }
  }

  /** Probe seeding hook: routes pre-keyed rows to their owning cores. */
  private[graft] def seedStore(rows: DataFrame): Unit = synchronized {
    val keyed = rows.persist()
    try cores.zipWithIndex.foreach { case (c, k) =>
      c.seedStore(keyed.where(shardCol === lit(k)))
    } finally { keyed.unpersist(); () }
  }

  def compact(): Unit = synchronized {
    val futs = cores.map(c => pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = c.compact()
    }))
    futs.foreach(_.get())
  }
}
