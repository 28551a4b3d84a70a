package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._

import graft.cv.ContViewEngine
import graft.ops.AnnSearch

/** Streaming embedding near-duplicate gate — one of the dedup gate family
  * (exact: [[StreamDedupGate]], Hamming: [[SimHashNearDupGate]], Jaccard:
  * [[JaccardNearDupGate]]): a document is forwarded iff no earlier
  * document's embedding scores cosine ≥ `threshold` against it.
  * Suppression is "seen"-based (every arrival suppresses later ones
  * whether or not it was admitted), so the admitted set is single-shot
  * recomputable: admitted(d) ⇔ no earlier d' with cos(d, d') ≥ threshold —
  * which is exactly what the DuckDB oracle brute-forces. `orderCol` must
  * be unique per stream (shared gate contract).
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
  * State, filters, delivery, compaction, restart, and the zero-shuffle
  * per-batch flow are [[IndexedNearDupGate]]'s: a `seen_keys` (bucket, id)
  * LSH index in range shards, and a `seen_embs` (id, vector) store at
  * FLOAT precision (4·dim bytes a row — the exact-cosine verification
  * casts back to double; a pair at cosine within float epsilon of the
  * threshold is not a semantics the LSH candidate stage resolves either
  * way) read only for surfaced candidate ids. The hot-bucket occupancy
  * cap (`maxBucketSize`) guards the degenerate-flood hazard — millions of
  * boilerplate embeddings sharing buckets — at the documented recall
  * trade: pairs colliding ONLY in flooded buckets are missed.
  */
final class CosineNearDupGate private (
    eng: ContViewEngine,
    name: String,
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
    compactEvery: Int)
  extends IndexedNearDupGate[Array[Double]](eng, name, orderCol, sink,
    embDir, idxDir, "embs", "v", bloomP, bloomN0, maxBucketSize, compactEvery) {

  override protected def obsPrefix: String = "cosgate"
  override protected def payloadCol: Column = expr(embSql).cast("array<double>")
  override protected def keysCol(payload: Column): Column =
    AnnSearch.srpBucketKeys(payload, dim, numTables, bitsPerTable, seed)
  override protected def payloadOf(r: Row): Array[Double] =
    r.getSeq[Double](1).toArray
  override protected def keysOf(p: Array[Double]): Array[Long] =
    AnnSearch.srpBucketKeysOf(p, dim, numTables, bitsPerTable, seed)
  // stored at float precision (the class contract), decoded back for the
  // exact verification
  override protected def storedPayloadCol: Column = col("__p").cast("array<float>")
  override protected def readPayloadCol(c: Column): Column = c.cast("array<double>")
  override protected def storedPayloadOf(p: Array[Double]): Any =
    p.map(_.toFloat).toSeq
  override protected def storedPayloadType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)

  override protected def externalPayloadOf(p: Array[Double]): Any = p.toSeq
  override protected def externalPayloadType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)

  // distributed form of [[similar]]: same exact-cosine expression the batch
  // operators use; the isnan guard matters because Spark ORDERS NaN above
  // every double (a zero-norm pair would flip from not-similar to similar),
  // and a length-mismatch null already drops out of the join filter
  override protected def similarCol(batchPayload: Column, storePayload: Column): Column = {
    val c = graft.functions.VectorExpressions.cosineSim(batchPayload, storePayload)
    c.geq(lit(threshold)) && !isnan(c)
  }

  // exact cosine, matching VectorExpressions.CosineSim: length mismatch →
  // no pair (the expression returns null), zero norm → NaN → false
  override protected def similar(a: Array[Double], b: Array[Double]): Boolean = {
    if (a.length != b.length) return false
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb)) >= threshold
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
