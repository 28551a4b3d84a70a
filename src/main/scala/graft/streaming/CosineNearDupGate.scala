package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

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
  * forces.
  *
  * Candidates come from seeded signed-random-projection LSH: bucket keys
  * are deterministic in (dim, numTables, bitsPerTable, seed), so a batch's
  * keys match the keys of every earlier batch and restarts re-derive them
  * from config alone. At high thresholds (≥0.95) collision probability for
  * a true near-pair is ~1 per table — recall is effectively structural —
  * while unrelated vectors collide in a given table with p ≈ 2^-bits.
  * Exact cosine verifies every candidate, so false bucket collisions cost
  * wall-clock, never correctness.
  *
  * State is the (id, embedding) append-only parquet store (4·dim bytes a
  * row at float precision — 256 B/doc at dim=64); a driver bloom over all
  * bucket keys ever seen lets fresh-content batches skip the store scan.
  * The degenerate-flood hazard (millions of zero/boilerplate embeddings
  * sharing buckets) is the same as the batch pipeline's — wire this gate
  * behind [[StreamDedupGate]] so exact copies never reach it, and add the
  * CMS occupancy cap (SimHashNearDupGate.maxBucketSize pattern) before
  * pointing it at an uncurated crawl.
  */
final class CosineNearDupGate private (
    eng: ContViewEngine,
    val name: String,
    embSql: String,
    orderCol: String,
    sink: String,
    storeDir: Path,
    threshold: Double,
    dim: Int,
    numTables: Int,
    bitsPerTable: Int,
    seed: Long,
    bloomP: Double,
    bloomN: Int,
    compactEvery: Int) {

  private val bloom = BloomFilter.empty(bloomP, bloomN)
  private var batches = 0L
  private var admitted = 0L
  private var suppressed = 0L

  /** (batches, admitted survivors, suppressed near-duplicates) so far. */
  def stats: (Long, Long, Long) = synchronized((batches, admitted, suppressed))

  private def keysOf(v: org.apache.spark.sql.Column) =
    AnnSearch.srpBucketKeys(v, dim, numTables, bitsPerTable, seed)

  private[streaming] def bootstrap(): Unit = synchronized {
    val files = GateStore.files(storeDir)
    if (files.nonEmpty) {
      val b = eng.spark.read.parquet(files: _*)
        .select(explode(keysOf(col("v"))).as("bucket"))
        .agg(GraftFunctions.bloom_agg(col("bucket"), bloomP, bloomN).as("b"))
        .collect()(0).getAs[Array[Byte]]("b")
      bloom.union(BloomFilter.deserialize(b))
      batches = GateStore.maxBatch(storeDir, "embs")
    }
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
      val bkeys = keyed.select(col(orderCol).as("__id"), col("__v"),
        explode(keysOf(col("__v"))).as("bucket"))
      val l = bkeys.select(col("bucket"), col("__id").as("id_l"), col("__v").as("v_l"))
      val r = bkeys.select(col("bucket"), col("__id").as("id_r"), col("__v").as("v_r"))
      val inBatch = l.join(r, Seq("bucket"))
        .where(col("id_l") < col("id_r") &&
          VectorExpressions.cosineSim(col("v_l"), col("v_r")) >= threshold)
        .select(col("id_r").as("__id"))
      val files = GateStore.files(storeDir)
      val fromStore =
        if (files.isEmpty) inBatch.limit(0)
        else {
          val hit = bkeys.where(
            GraftFunctions.bloom_contains(lit(bloom.serialize()), col("bucket")))
          val store = s.read.parquet(files: _*)
            .select(col("id").as("id_s"), col("v").as("v_s"))
            .select(col("id_s"), col("v_s"),
              explode(keysOf(col("v_s"))).as("bucket"))
          hit.join(store, Seq("bucket"))
            .where(VectorExpressions.cosineSim(col("__v"), col("v_s")) >= threshold)
            .select(col("__id"))
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
        GateStore.append(
          keyed.where(col("__v").isNotNull)
            .select(col(orderCol).as("id"), col("__v").as("v")),
          storeDir, "embs", batches)
        val update = keyed
          .select(explode(keysOf(col("__v"))).as("bucket"))
          .agg(GraftFunctions.bloom_agg(col("bucket"), bloomP, bloomN).as("b"))
          .collect()(0).getAs[Array[Byte]]("b")
        bloom.union(BloomFilter.deserialize(update))
      } finally survivors.unpersist()
    } finally keyed.unpersist()
    if (compactEvery > 0 && batches % compactEvery == 0) compact()
  }

  /** Merge per-batch embedding files into one — crash-safe without a
    * manifest (duplicated (id, v) rows change nothing: suppressor hits
    * deduplicate through the DISTINCT on suppressed ids). */
  def compact(): Unit = synchronized {
    GateStore.compact(eng.spark, storeDir, "embs", Seq("id", "v"), batches)
  }
}

object CosineNearDupGate {

  /** Register a cosine near-dup gate on `eng`: a continuous transform
    * reading `selectSql` (must project `orderCol`; `embSql` names the
    * embedding column) whose not-similar-to-anything-earlier survivors are
    * forwarded to stream `sink` (embedding column dropped from the payload
    * the gate adds — the original columns pass through unchanged).
    */
  def create(eng: ContViewEngine, name: String, selectSql: String,
      embSql: String, orderCol: String, sink: String, storeRoot: String,
      threshold: Double, dim: Int,
      numTables: Int = 8, bitsPerTable: Int = 12, seed: Long = 42L,
      bloomP: Double = 0.01, bloomN: Int = 1 << 20,
      compactEvery: Int = 256): CosineNearDupGate = {
    val dir = Paths.get(storeRoot, name, "seen_embs")
    Files.createDirectories(dir)
    val gate = new CosineNearDupGate(eng, name, embSql, orderCol, sink, dir,
      threshold, dim, numTables, bitsPerTable, seed, bloomP, bloomN,
      compactEvery)
    gate.bootstrap()
    eng.createContTransform(name, selectSql,
      outputFunc = Some(gate.onBatch _), emitChanges = false)
    // a catalog-replayed transform is bare (no callback) — re-attach
    eng.rebindTransformOutput(name, gate.onBatch _)
    gate
  }
}
