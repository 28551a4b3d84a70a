package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

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
  * Semantics (deterministic given batch order):
  *  - within a batch, the row with the lowest `orderCol` wins its key;
  *  - across batches, a key admitted once is never admitted again;
  *  - survivors are forwarded to `sink` with the key attached as `h`.
  *
  * Mechanics, sized for the 100-TB regime:
  *  - The seen-key store is APPEND-ONLY key-column parquet (a dedup set
  *    only grows): each batch whose survivors are non-empty appends ONE
  *    file via temp-write + atomic rename — no read-modify-write of
  *    existing state, so per-batch write cost is O(new keys), never
  *    O(corpus).
  *  - A driver-resident Bloom filter (graft.sketch.BloomFilter, the same
  *    state the engine's `bloom_agg` materializes) gates the expensive
  *    path: rows whose key misses the filter are DEFINITELY new (no false
  *    negatives) and skip the store entirely; only Bloom-positive rows
  *    anti-join the store. A batch of genuinely fresh content therefore
  *    costs two map-side jobs and zero store reads; the full key scan is
  *    paid only when candidate duplicates exist. The per-batch filter
  *    update is a distributed `bloom_agg` over survivor keys (one small
  *    job), OR-merged into the driver copy — keys are never collected.
  *  - The anti-join itself is an equi-join on the key column; the store
  *    side scans a single 32-char column regardless of document width. At
  *    tens of billions of keys, shard the Bloom filter by key prefix and
  *    sort-compact the store so the join prunes by file footer — the
  *    append-only layout above is the one both evolutions start from.
  *
  * Concurrency: `onBatch` is serialized on the gate — the engine's sync and
  * async ingest paths already order batches, and the gate's first-wins
  * guarantee is only meaningful under an ordered feed.
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
    bloomN: Int,
    compactEvery: Int) {

  private val bloom = BloomFilter.empty(bloomP, bloomN)
  private var batches = 0L
  private var admitted = 0L
  private var suppressed = 0L

  /** (batches, admitted survivors, suppressed duplicates) so far. */
  def stats: (Long, Long, Long) = synchronized((batches, admitted, suppressed))

  private def storeFiles(): Array[String] = {
    val d = storeDir.toFile
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath)
  }

  /** Restart bootstrap: a re-created gate on an existing store resumes
    * exactly — the key set IS the store; only the bloom is memory-resident,
    * and one distributed bloom_agg over the persisted keys rebuilds it.
    * (batches/admitted/suppressed counters restart at zero: they are
    * session telemetry, not dedup state.)
    */
  private[streaming] def bootstrap(): Unit = synchronized {
    val files = storeFiles()
    if (files.nonEmpty) {
      val b = eng.spark.read.parquet(files: _*)
        .agg(GraftFunctions.bloom_agg(col("h"), bloomP, bloomN).as("b"))
        .collect()(0).getAs[Array[Byte]]("b")
      bloom.union(BloomFilter.deserialize(b))
      batches = files.map(_.split("keys_").last.stripSuffix(".parquet"))
        .flatMap(s => scala.util.Try(s.toLong).toOption)
        .foldLeft(0L)(math.max)
    }
  }

  /** Merge the per-batch key files into one. Crash-safe without a manifest
    * because a dedup store tolerates DUPLICATED keys (the anti-join result
    * is identical), so the merged file can land before the olds are
    * unlinked; a crash in between only re-reads some keys twice until the
    * next compact. Run it every few hundred batches to keep file-listing
    * and parquet-footer overhead off the per-batch path.
    */
  def compact(): Unit = synchronized {
    val files = storeFiles()
    if (files.length > 1) {
      val stage = Files.createTempDirectory(storeDir, ".stage")
      val tmp = Files.createTempFile(storeDir, ".tmp_compact", ".inprogress")
      try {
        eng.spark.read.parquet(files: _*).select("h").distinct()
          .coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = Option(stage.toFile.listFiles())
          .getOrElse(Array.empty).find(_.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException("no compacted part written"))
        Files.move(part.toPath, tmp, StandardCopyOption.REPLACE_EXISTING)
        Files.move(tmp, storeDir.resolve(
          f"keys_$batches%05d_c${System.nanoTime()}%d.parquet"),
          StandardCopyOption.ATOMIC_MOVE)
        files.foreach(f => Files.deleteIfExists(Paths.get(f)))
      } finally {
        Files.deleteIfExists(tmp)
        StreamDedupGate.deleteRecursively(stage.toFile)
      }
    }
  }

  private[streaming] def onBatch(batch: DataFrame): Unit = synchronized {
    batches += 1
    val s = batch.sparkSession
    // input-row count rides the survivors job via observe() — a separate
    // batch.count() would re-run the transform projection per batch.
    // The observed node sits below the window's exchange, which BOTH
    // bloom branches read: exchange reuse executes it once, so the metric
    // is exact (StreamDedupGateSpec pins the stats; a runtime that stopped
    // reusing the exchange would double-count and fail there, visibly)
    val obs = new org.apache.spark.sql.Observation(s"gate_${name}_$batches")
    val keyed = batch.drop("arrival_timestamp")
      .observe(obs, count(lit(1)).as("rows"))
      .withColumn("h", expr(keySql))
    // within-batch first-wins: one shuffle on the key, heap-free row_number
    val w = Window.partitionBy("h").orderBy(col(orderCol))
    val firsts = keyed.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val files = storeFiles()
    val survivors0 =
      if (files.isEmpty) firsts
      else {
        // Bloom gate: misses are definitely-new and bypass the store scan;
        // only possible repeats (true dups + ~p false positives) pay the
        // anti-join against the key column
        val mayRepeat = bloom_contains(lit(bloom.serialize()), col("h"))
        val fresh = firsts.where(!mayRepeat)
        val candidates = firsts.where(mayRepeat)
        val seen = s.read.parquet(files: _*)
        fresh.unionByName(candidates.join(seen, Seq("h"), "left_anti"))
      }
    // one materialization feeds the store append, the filter update and the
    // sink forward — and pins the nondeterministic-free row set they share
    val survivors = survivors0.persist()
    try {
      val n = survivors.count()
      admitted += n
      suppressed += obs.get("rows").asInstanceOf[Long] - n
      if (n > 0) {
        val tmp = Files.createTempFile(storeDir, ".tmp_keys", ".inprogress")
        val stage = Files.createTempDirectory(storeDir, ".stage")
        try {
          survivors.select("h").coalesce(1).write.mode("overwrite")
            .parquet(stage.toString)
          val part = Option(stage.toFile.listFiles())
            .getOrElse(Array.empty).find(_.getName.endsWith(".parquet"))
            .getOrElse(throw new IllegalStateException("no key part written"))
          Files.move(part.toPath, tmp, StandardCopyOption.REPLACE_EXISTING)
          Files.move(tmp, storeDir.resolve(f"keys_$batches%05d.parquet"),
            StandardCopyOption.ATOMIC_MOVE)
        } finally {
          Files.deleteIfExists(tmp)
          StreamDedupGate.deleteRecursively(stage.toFile)
        }
        val update = survivors.agg(
          GraftFunctions.bloom_agg(col("h"), bloomP, bloomN).as("b"))
          .collect()(0).getAs[Array[Byte]]("b")
        bloom.union(BloomFilter.deserialize(update))
        eng.insertInto(sink, survivors)
      }
    } finally survivors.unpersist()
    if (compactEvery > 0 && batches % compactEvery == 0) compact()
  }

  private def bloom_contains(state: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column) = GraftFunctions.bloom_contains(state, v)

}

object StreamDedupGate {

  private[streaming] def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }


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
    val dir = Paths.get(storeRoot, name, "seen_keys")
    Files.createDirectories(dir)
    val gate = new StreamDedupGate(eng, name, keySql, orderCol, sink, dir,
      bloomP, bloomN, compactEvery)
    gate.bootstrap() // resume from a persisted store after an engine restart
    eng.createContTransform(name, selectSql,
      outputFunc = Some(gate.onBatch _), emitChanges = false)
    gate
  }
}
