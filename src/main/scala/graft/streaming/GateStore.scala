package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.StoreFs

/** Shared append-only store plumbing for the streaming dedup gates: file
  * listing, atomic single-file batch append, range-sharded compaction, and
  * batch-counter recovery. One implementation so a fix (filename parse,
  * move ordering) cannot drift between the three gates.
  *
  * Store dirs are STRINGS routed through the [[graft.io.StoreFs]] seam
  * (round 17): a plain root runs java.nio byte-for-byte as before, while
  * a URI root ("file:/…", "hdfs://…", "s3a://…") drives every listing/
  * marker/publish through the Hadoop FileSystem — the port the CV tier
  * took in round 16, extended to the gates (the production LLM-pipeline
  * surface). Executor-LOCAL scratch (shard heaps) stays node-local by
  * design; only the SHARED store root rides the seam.
  *
  * Layout: `<prefix>_NNNNN.parquet` per appended batch (rows sorted by the
  * gate's key column), plus `<prefix>_NNNNN_c<nanos>_s<k>[_r<lo>_<hi>]
  * .parquet` range shards from compaction. The `_r<lo>_<hi>` suffix
  * records the shard's key-column [min,max] so a per-batch read can prune
  * at FILE level: [[pruned]] keeps every un-ranged file (recent appends,
  * bounded by the gate's compaction cadence) plus only the ranged shards
  * whose interval contains at least one of the batch's candidate keys.
  * That is what makes per-batch store cost track the BATCH's key count
  * instead of the corpus: at 10B stored keys the compacted shards cover
  * the keyspace in slices, and a 5k-row batch touches only the slices its
  * own keys land in.
  *
  * The store tolerates duplicated rows (every consumer anti-joins or
  * DISTINCTs), so compaction needs no manifest: the merged shards land
  * before the old files are unlinked, and a crash in between only
  * re-reads bytes.
  */
private[graft] object GateStore {

  /** Per-batch candidate keys beyond this are not pushed into the store
    * scan as an in-set filter (the filter itself would dwarf the read);
    * the gate falls back to the unpruned join, which is still correct. */
  val MaxPushdownKeys: Int = 1 << 17

  /** Pruned store slices larger than this (file bytes) are not fetched to
    * the driver for in-place candidate verification — the bound is what
    * makes the driver fetch safe: a filtered collect returns a SUBSET of
    * the slice's rows, so slice bytes cap the fetch regardless of filter
    * selectivity (worst-case driver heap ≈ a few × this, transiently).
    * Bigger slices take the distributed verify join — the normal path at
    * corpus scale, where uniform candidate keys touch most shards; the
    * driver path is the low-latency small-store regime. */
  val MaxDriverVerifyBytes: Long = 128L << 20

  /** Per-batch candidate sets beyond this ESTIMATED java-serialized size
    * are not pushed as an InSet filter: the set rides EVERY scan task's
    * binary and Spark warns at 1000 KiB. Measured (bench pushdown probe):
    * 32-char md5-string keys serialize at ~45 B each, boxed longs at
    * ~14 B — a 100k-row batch's ~25k string candidates already cross
    * 1 MB, so string-keyed gates hit this bound long before the count
    * bound. Over-bound paths fall back to shipping the set ONCE per
    * executor as a broadcast join side. */
  val MaxPushdownBytes: Long = 768L << 10

  /** Test seams: specs shrink the bounds to force the distributed fallback
    * paths on small fixtures and assert result equality with the driver
    * paths (the invariant that makes concurrent-suite interference
    * harmless: either path must produce identical admitted sets). */
  private[graft] var maxPushdownKeysOverride: Option[Int] = None
  private[graft] var maxDriverVerifyBytesOverride: Option[Long] = None
  private[graft] var maxPushdownBytesOverride: Option[Long] = None
  def maxPushdownKeys: Int = maxPushdownKeysOverride.getOrElse(MaxPushdownKeys)
  def maxPushdownBytes: Long =
    maxPushdownBytesOverride.getOrElse(MaxPushdownBytes)

  /** Whether `keys` fits scan-task binaries as an InSet filter — count
    * bound AND estimated-bytes bound (string: UTF-8 byte length + 16;
    * other: 16 — the measured java-serialization footprints rounded down,
    * so the estimate never blocks a set the measurement would allow).
    * The string term counts BYTES OF UTF-8, not chars: the set ships as
    * UTF8String values, so a multi-byte key (CJK text is 3 B/char) would
    * be undercounted up to ~3× by `s.length`. Counted without
    * materializing the encoded array per key. */
  def pushdownOk(keys: Array[_]): Boolean = {
    if (keys.length > maxPushdownKeys) return false
    val cap = maxPushdownBytes
    var bytes = 0L
    var i = 0
    while (i < keys.length && bytes <= cap) {
      bytes += (keys(i) match {
        case s: String => utf8Length(s) + 16
        case _ => 16
      })
      i += 1
    }
    bytes <= cap
  }

  /** UTF-8 encoded length of `s` without allocating the byte array
    * (surrogate pairs → one 4-byte sequence). */
  def utf8Length(s: String): Long = {
    var n = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x80) n += 1
      else if (c < 0x800) n += 2
      else if (Character.isHighSurrogate(c) && i + 1 < s.length &&
        Character.isLowSurrogate(s.charAt(i + 1))) { n += 4; i += 1 }
      else n += 3
      i += 1
    }
    n
  }

  /** Rows of `df` whose `column` is NOT in `ids`, rows with a NULL
    * `column` always kept — an InSet filter when `ids` fits task
    * binaries, else a broadcast LEFT ANTI join (one per-executor transfer
    * of the set instead of a copy in every task; a null join key never
    * matches, so the null-passes contract holds on both paths). */
  def exceptIds(df: org.apache.spark.sql.DataFrame, column: String,
      ids: Array[Any]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    if (ids.isEmpty) df
    else if (pushdownOk(ids))
      df.where(col(column).isNull || !inSetCol(col(column), ids.toSeq))
    else {
      val t = df.schema(df.schema.fieldIndex(column)).dataType
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row](ids.length)
      ids.foreach(k => { rows.add(org.apache.spark.sql.Row(k)); () })
      val idsDf = df.sparkSession.createDataFrame(rows,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__gate_sup", t))))
      df.join(broadcast(idsDf), col(column) === col("__gate_sup"), "left_anti")
    }
  }

  /** `df` plus a boolean `flag` column: true unless `column` is in `ids`
    * (NULL `column` → true) — the [[exceptIds]] predicate as a FLAG
    * instead of a filter, for the exactly-once spool's `__admitted`
    * column. Same two regimes: InSet under the task-binary bound,
    * broadcast LEFT join + null-marker test above it (`ids` is a set, so
    * the join never multiplies rows). */
  def withAdmittedFlag(df: org.apache.spark.sql.DataFrame, column: String,
      ids: Array[Any], flag: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    if (ids.isEmpty) df.withColumn(flag, lit(true))
    else if (pushdownOk(ids))
      df.withColumn(flag,
        col(column).isNull || !inSetCol(col(column), ids.toSeq))
    else {
      val t = df.schema(df.schema.fieldIndex(column)).dataType
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row](ids.length)
      ids.foreach(k => { rows.add(org.apache.spark.sql.Row(k)); () })
      val idsDf = df.sparkSession.createDataFrame(rows,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__gate_sup", t))))
      df.join(broadcast(idsDf), col(column) === col("__gate_sup"), "left")
        .withColumn(flag, col("__gate_sup").isNull)
        .drop("__gate_sup")
    }
  }
  def maxDriverVerifyBytes: Long =
    maxDriverVerifyBytesOverride.getOrElse(MaxDriverVerifyBytes)

  /** `c IN (values)` as ONE InSet expression node. `Column.isInCollection`
    * builds an `In` with one Literal child per value — at the gates' tens
    * of thousands of candidate keys per batch, Catalyst spends SECONDS
    * analyzing/optimizing that tree per batch (measured: ~2 s of a 3 s
    * batch). InSet carries the whole set in a single node, so plan work is
    * O(1) in the key count. Values are converted to Catalyst-internal form
    * (strings → UTF8String, timestamps → micros, dates → days, …) because
    * InSet compares RUNTIME values — a java.sql.Timestamp in the set would
    * silently never match the column's internal Long and the filter would
    * no-op. Binary keys are rejected loudly: their internal form is a
    * byte array whose set equality is referential, so a binary
    * orderCol/keySql cannot gate correctly — hash it to string/long. */
  def inSetCol(c: org.apache.spark.sql.Column, values: Iterable[Any]): org.apache.spark.sql.Column = {
    val conv: Set[Any] = values.map {
      case b: Array[Byte] =>
        throw new IllegalArgumentException(
          "binary gate keys are not supported (byte-array equality is " +
            s"referential in a filter set; got ${b.length}-byte value) — " +
            "hash the key to a string or long in keySql/orderCol")
      case other =>
        org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToCatalyst(other)
    }.toSet
    if (captureInSetStats) {
      // bench probe seam: the InSet's value set is what a large candidate
      // list serializes into EVERY scan task's binary — java-serialize it
      // here (same mechanism the TaskSetManager sizes) so the trade behind
      // maxPushdownKeys carries a measured number per round. A gate batch
      // builds SEVERAL in-sets (the candidate-key store filter, then the
      // smaller suppressed-id survivor filter), so the capture keeps the
      // LARGEST since enable — the worst task binary IS the trade.
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(conv)
      oos.close()
      if (bos.size.toLong > lastInSetBytes) {
        lastInSetKeys = conv.size
        lastInSetBytes = bos.size.toLong
      }
    }
    org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.InSet(
        org.apache.spark.sql.GraftBridge.expression(c), conv))
  }

  /** Bench/probe seam ([[inSetCol]]): when enabled, record each pushed
    * candidate set's cardinality and java-serialized bytes. */
  @volatile private[graft] var captureInSetStats: Boolean = false
  @volatile private[graft] var lastInSetKeys: Int = 0
  @volatile private[graft] var lastInSetBytes: Long = 0L

  /** A store file plus the encoded [min,max] of its sort column when the
    * filename carries one (range-sharded compaction output). Ranges are
    * stored ENCODED (see [[encodeKey]]) so one lexicographic comparison
    * serves every key type. */
  final case class StoreFile(path: String, range: Option[(String, String)])

  private val rangeRe = """.*_r([0-9a-zA-Z.\-]*)_([0-9a-zA-Z.\-]*)\.parquet$""".r

  /** Filename-safe, order-preserving encoding of a range-stamp key:
    * lexicographic order of the encoding equals the column's sort order.
    * Longs map to 16-hex-digit sign-flipped unsigned; strings embed as-is
    * when they are already filename-safe and underscore-free (md5 hex keys
    * are). Returns None for unencodable values — the file simply goes
    * unstamped and is always read, which is correct, just unpruned. */
  def encodeKey(v: Any): Option[String] = v match {
    case l: Long => Some(f"${l ^ Long.MinValue}%016x")
    case i: Int => encodeKey(i.toLong)
    case s: String if s.nonEmpty && s.length <= 64 &&
      s.forall(c => c.isLetterOrDigit || c == '.' || c == '-') => Some(s)
    case _: java.sql.Timestamp | _: java.sql.Date | _: java.time.Instant |
        _: java.time.LocalDate | _: java.time.LocalDateTime =>
      // internal micros/days (Long/Int) order identically to the column's
      // sort order, so datetime-keyed stores prune at file level too; both
      // the range stamps (compact's collected min/max) and the per-batch
      // candidate keys arrive here as external objects, so the encoding
      // agrees with itself by construction
      encodeKey(org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToCatalyst(v))
    case _ => None
  }

  /** Driver-side `<` over collected order-column values (the gates'
    * within-batch pairing). Matches Spark's ordering for the orderable
    * types a gate orderCol can be (integral, string, timestamp — all
    * Comparable); null compares false both ways, mirroring SQL `<`. */
  def lt(a: Any, b: Any): Boolean =
    a != null && b != null &&
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0

  // ---- string-path helpers (URI-root-safe; '/'-joined both ways) ---------

  /** `dir`/`name` as one path string (plain roots normalized absolute so
    * shard-registry keys and CommitPipeline roots compare stably). */
  def child(dir: String, name: String): String =
    dir.stripSuffix("/") + "/" + name

  /** The gate-root dir for `name` under an engine store root — absolute
    * for plain paths (registry/pipeline keys), verbatim for URI roots. */
  def gateRoot(storeRoot: String, name: String): String = {
    val base =
      if (StoreFs.hasScheme(storeRoot)) storeRoot.stripSuffix("/")
      else java.nio.file.Paths.get(storeRoot).toAbsolutePath.toString
    base + "/" + name
  }

  /** Parent dir of a '/'-joined path string. */
  def parentOf(p: String): String = {
    val s = p.stripSuffix("/")
    val i = s.lastIndexOf('/')
    require(i > 0, s"no parent: $p")
    s.substring(0, i)
  }

  /** Last path segment. */
  def baseName(p: String): String =
    p.stripSuffix("/").split('/').last

  /** Total bytes of the given store FILES (per-batch driver-side sizing
    * checks) — ONE stat per file (absent files count 0, matching the old
    * File.length behavior); treeBytes would walk/list per file. */
  def bytesOf(paths: Iterable[String]): Long =
    paths.map { p =>
      try StoreFs.forRoot(p).fileSize(p)
      catch {
        case _: java.io.FileNotFoundException => 0L
        case _: java.nio.file.NoSuchFileException => 0L
      }
    }.sum

  private val tmpCounter = new java.util.concurrent.atomic.AtomicLong()

  /** A fresh unique name for in-progress staging under a store dir. */
  private def uniqueName(prefix: String, suffix: String): String =
    f"$prefix${System.nanoTime()}%d_${tmpCounter.incrementAndGet()}%d$suffix"

  /** Record (or verify) the key-geometry a gate store was built with. The
    * bucket keys persisted in a near-dup index are a pure function of the
    * gate's geometry parameters (planes/bands/seed); reopening a store
    * under different parameters would make every stored key silently
    * unmatchable — duplicates admitted, no error. The stamp turns that
    * into a loud refusal. Stored as a dot-file the parquet listing
    * ignores; an existing UN-stamped store (pre-stamp layout) adopts the
    * current stamp, which is correct exactly when the caller kept its
    * parameters — the same contract it already lived under. */
  def stampGeometry(dir: String, stamp: String): Unit = {
    val fs = StoreFs.forRoot(dir)
    val f = child(dir, ".geometry")
    if (fs.exists(f)) {
      val prev = fs.readString(f).trim
      require(prev == stamp,
        s"gate store at $dir was built with key geometry '$prev' but is " +
          s"being reopened with '$stamp' — stored bucket keys would " +
          "silently never match; recreate the store or restore the " +
          "original gate parameters")
    } else fs.writeString(f, stamp)
  }

  /** Store-dir layout contract: every `*.parquet` entry directly under a
    * store dir is a regular FILE (appendLocal/compact allocate flat
    * unique names; nothing creates a `*.parquet` DIRECTORY here). The
    * listing relies on that — StoreFs.list cannot ask "is it a file?"
    * portably, and a dir named `*.parquet` would reach spark.read and
    * fileSize, which only the Local impl rejects loudly. */
  def files(dir: String): Array[String] =
    StoreFs.forRoot(dir).list(dir)
      .filter(_.endsWith(".parquet")).map(child(dir, _)).toArray

  def storeFiles(dir: String): Array[StoreFile] = files(dir).map {
    case p @ rangeRe(lo, hi) => StoreFile(p, Some((lo, hi)))
    case p => StoreFile(p, None)
  }

  /** Files a batch with the given candidate keys must read: every un-ranged
    * file plus ranged shards containing at least one key. Keys are encoded
    * and sorted here; callers pass raw values. */
  def pruned(fs: Array[StoreFile], keys: Array[_]): Array[String] = {
    val encoded = keys.flatMap(k => encodeKey(k)).sorted
    val allEncodable = encoded.length == keys.length
    fs.collect {
      case StoreFile(p, None) => p
      // an unencodable candidate key could live anywhere: read everything
      case StoreFile(p, _) if !allEncodable => p
      case StoreFile(p, Some((lo, hi))) if intersects(encoded, lo, hi) => p
    }
  }

  private def intersects(sorted: Array[String], lo: String, hi: String): Boolean = {
    // first element >= lo, if any, must be <= hi
    var a = 0
    var b = sorted.length
    while (a < b) {
      val m = (a + b) >>> 1
      if (sorted(m).compareTo(lo) < 0) a = m + 1 else b = m
    }
    a < sorted.length && sorted(a).compareTo(hi) <= 0
  }

  /** Highest batch number recorded in the dir's filenames — compacted
    * files (`_c` suffix) count via their numeric prefix. */
  def maxBatch(dir: String, prefix: String): Long = {
    val re = (java.util.regex.Pattern.quote(prefix) + "_(\\d+)").r
    files(dir).flatMap(f => re.findFirstMatchIn(baseName(f))
      .map(_.group(1).toLong)).foldLeft(0L)(math.max)
  }

  /** Gate-store parquet page size. Smaller pages would cap a point
    * lookup's I/O (one page per candidate key, via column-index pruning +
    * [[withInPushdown]]) but were measured to tax the full-scan paths the
    * distributed joins take — 64 KB pages cost the simhash gate ~20% at a
    * 100× store with no measurable lookup win at probe scales, so this
    * stays at the parquet default; revisit if multi-GB per-gate stores
    * make page-granular lookups the dominant term. */
  val PageBytes: Int = 1 << 20

  /** Per-value parquet In pushdown beyond this many keys risks a stack
    * overflow: the pushed predicate is a RECURSIVE or-chain of equals, and
    * thousands of terms blow the task stack during filter evaluation
    * (observed at ~6k keys) — which is why Spark's default threshold is
    * 10. Beyond the cap the scan keeps the default range-only pushdown. */
  val MaxInPushdownKeys: Int = 1536

  /** Run `f` with the parquet In-pushdown threshold covering `n` values
    * (when `n` ≤ [[MaxInPushdownKeys]]): above the threshold Spark pushes
    * only the set's [min,max] range, which prunes NOTHING for candidate
    * keys spread uniformly over the keyspace; per-value pushdown lets
    * parquet row-group stats and column indexes skip to just the pages
    * containing candidates. Session-conf scoped (set + restored around
    * `f`) because the reads happen inside the gate's serialized onBatch,
    * on a session shared with user queries. */
  def withInPushdown[T](s: SparkSession, n: Int)(f: => T): T = {
    if (n > MaxInPushdownKeys) f
    else {
      val key = "spark.sql.parquet.pushdown.inFilterThreshold"
      val prev = s.conf.getOption(key)
      s.conf.set(key, math.max(n, 10).toString)
      try f
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
  }

  /** Write `rows` as ONE parquet file `<prefix>_<batch>.parquet` via
    * temp-write + atomic rename, sorted by `sortCol` when given so row
    * groups carry tight key stats. */
  def append(rows: DataFrame, dir: String, prefix: String, batch: Long,
      sortCol: Option[String] = None, force: Boolean = false): Unit = {
    val fs = StoreFs.forRoot(dir)
    val stage = child(dir, uniqueName(".stage_", ""))
    try {
      val one = rows.coalesce(1)
      val sorted = sortCol.fold(one)(c => one.sortWithinPartitions(c))
      sorted.write.mode("overwrite")
        .option("parquet.page.size", PageBytes.toString)
        .parquet(stage)
      val part = fs.list(stage).find(_.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no $prefix part written"))
      // `force`: fsync data BEFORE the rename and the dirent AFTER it, so
      // the rename is a real commit point across power loss, not just
      // process crash — requested only by the exactly-once SPOOL writes
      // (a lost STORE append is the documented at-least-once class and
      // does not pay the sync). Routed through the StoreFs seam — this
      // publish is a storage commit point (DESIGN_NOTES "Shared-storage
      // commit points"), the exact operation an object-store port swaps.
      fs.publish(child(stage, part),
        child(dir, f"${prefix}%s_$batch%05d.parquet"), durable = force)
    } finally fs.deleteRecursively(stage)
  }

  /** Write driver-held rows as ONE parquet file `<prefix>_<batch>.parquet`
    * DIRECTLY through parquet-mr — no Spark job at all. The per-batch gate
    * appends are LocalRelation writes of rows the driver already holds;
    * routing them through a Spark write pays a whole job's fixed latency
    * (~250 ms in local mode) per store per batch, which became the
    * dominant per-batch term once the resident tier removed the store
    * reads (PERF_NOTES §16) — and multiplied by G under core sharding
    * (G index slices = G jobs). This path writes the same bytes in
    * single-digit milliseconds: rows sorted by `sortCol` on the driver,
    * snappy pages with column stats (so the range-stamped compaction and
    * the in-set pushdown reads behave identically), temp-write + atomic
    * rename like [[append]].
    *
    * Supports the gate stores' PRIMITIVE column types (long/int/string/
    * double/timestamp/date — index stores and exact-gate key stores) plus
    * standard-layout LISTs of long/float/double (the split-store payload
    * columns: minhash signatures, quantized embeddings — round 13: the
    * payload append used to fall back to a Spark LocalRelation write,
    * paying a whole job's latency AND shipping the batch's payloads in
    * one task closure per batch); returns false on any other schema and
    * the caller falls back to the Spark write. */
  def appendLocal(rows: java.util.List[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType, dir: String,
      prefix: String, batch: Long, sortCol: Option[String] = None): Boolean = {
    import org.apache.spark.sql.types._
    import org.apache.parquet.schema.{LogicalTypeAnnotation => L, Types => PT,
      PrimitiveType, MessageType}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    def fieldOf(f: StructField): Option[org.apache.parquet.schema.Type] = {
      f.dataType match {
        // Spark's standard 3-level LIST layout (optional group (LIST) {
        // repeated group list { optional element } }) — what
        // spark.read.parquet round-trips bit-identically
        case ArrayType(elem, _) =>
          val e: Option[PrimitiveType.PrimitiveTypeName] = elem match {
            case LongType => Some(INT64)
            case FloatType => Some(FLOAT)
            case DoubleType => Some(DOUBLE)
            case _ => None
          }
          e.map(t => PT.optionalList().optionalElement(t).named(f.name))
        case _ =>
          val b: Option[PT.PrimitiveBuilder[PrimitiveType]] = f.dataType match {
            case LongType => Some(PT.optional(INT64))
            case IntegerType => Some(PT.optional(INT32)
              .as(L.intType(32, true)))
            case StringType => Some(PT.optional(BINARY).as(L.stringType()))
            case DoubleType => Some(PT.optional(DOUBLE))
            case FloatType => Some(PT.optional(FLOAT))
            case BooleanType => Some(PT.optional(BOOLEAN))
            case TimestampType => Some(PT.optional(INT64)
              .as(L.timestampType(true, L.TimeUnit.MICROS)))
            case DateType => Some(PT.optional(INT32).as(L.dateType()))
            case _ => None
          }
          b.map(_.named(f.name))
      }
    }
    val fields = schema.fields.map(fieldOf)
    if (fields.exists(_.isEmpty)) return false
    val msg = new MessageType("spark_schema", fields.map(_.get): _*)
    // driver-side sort so row groups carry tight key stats (what the Spark
    // path's sortWithinPartitions provided)
    sortCol.foreach { c =>
      val idx = schema.fieldIndex(c)
      rows.sort { (a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row) =>
        val (x, y) = (a.get(idx), b.get(idx))
        if (x == null && y == null) 0
        else if (x == null) -1
        else if (y == null) 1
        else x.asInstanceOf[Comparable[Any]].compareTo(y)
      }
    }
    val fs = StoreFs.forRoot(dir)
    val tmp = child(dir, uniqueName(s".tmp_$prefix", ".inprogress"))
    // parquet-mr writes through the Hadoop Path API, which is URI-capable
    // — the driver-direct fast path survives the port to shared-storage
    // roots (an HDFS-rooted gate store still skips the per-batch Spark job)
    val hTmp =
      if (StoreFs.hasScheme(dir)) new org.apache.hadoop.fs.Path(tmp)
      else new org.apache.hadoop.fs.Path(new java.io.File(tmp).toURI)
    try {
      val conf = new org.apache.hadoop.conf.Configuration(false)
      conf.setClassLoader(getClass.getClassLoader)
      // Direct RecordConsumer writer with per-field closures bound ONCE per
      // schema (round 19; guide §1.2 step 2): the old example-Group path
      // allocated a SimpleGroup (one ArrayList per column) per row and
      // re-matched every CELL's dataType on the gates' COMMIT THREAD, whose
      // duration bounds the deferred-commit pipeline's overlap window —
      // ~170 ms of the 64k-row index append was this loop, not parquet
      // encoding. Identical bytes: same MessageType, same field order, same
      // LIST layout events the Group writer emitted.
      val w = RowParquetWriter.build(hTmp, conf, msg, schema, PageBytes)
      try {
        val it = rows.iterator()
        while (it.hasNext) w.write(it.next())
      } finally w.close()
      // same commit point as [[append]], driver-written bytes
      fs.publish(tmp, child(dir, f"${prefix}%s_$batch%05d.parquet"),
        durable = false)
      true
    } finally fs.deleteRecursively(tmp)
  }

  /** Compacted GENERATIONS beyond this trigger a MAJOR fold (all files);
    * below it, compaction is TIERED — only the per-batch append files fold
    * into a new generation of range shards, so steady-state compaction
    * cost is O(data since the last compaction), never O(corpus). A 10B-key
    * store must not be rewritten every `compactEvery` batches just to
    * absorb a few thousand new keys; counting generations (not shard
    * files) keeps the major-fold cadence independent of how many shards a
    * byte-scaled fold produced. */
  val MajorCompactGenerations: Int = 8

  /** Target on-disk bytes per compaction range shard: shard count scales
    * with the folded data (`bytes / this`, floored at the `shards` param)
    * so per-shard key ranges — and with them [[pruned]]'s file-level
    * selectivity — stay bounded as the corpus grows. A fixed shard count
    * at 10B keys would make every range ~corpus/8 wide and degrade
    * pruning toward reading most of the store per batch. */
  val TargetShardBytes: Long = 64L << 20

  /** Fold store files into range-sharded files (DISTINCT over `cols`,
    * range-partitioned and sorted by `sortCol` when given — a parallel
    * rewrite, never a single-task funnel; shard count = max(`shards`,
    * folded bytes / [[TargetShardBytes]])), TIERED: a minor pass folds
    * only the un-compacted append files (compacted generations may
    * overlap in key range — [[pruned]] checks each file independently,
    * and duplicate rows across generations are tolerated by every
    * consumer); a major pass folds everything once the generation count
    * exceeds `majorGens`. Sort-column min/max is stamped into each
    * shard's filename for [[pruned]] file-level pruning. Returns the
    * store's row count after the fold (file-metadata exact; duplicates
    * across generations count multiply — a conservative over-estimate for
    * the bloom-regrow sizing it feeds). Crash-safe without a manifest:
    * every shard lands (atomic moves) before any old file is unlinked. */
  def compact(spark: SparkSession, dir: String, prefix: String,
      cols: Seq[String], batch: Long, sortCol: Option[String] = None,
      shards: Int = 8, majorGens: Int = MajorCompactGenerations,
      rowFilter: Option[org.apache.spark.sql.Column] = None): Long = {
    val sfs = StoreFs.forRoot(dir)
    val all = files(dir)
    // compacted generations carry the `_c<nanos>` marker; appends do not
    val compacted = all.filter(baseName(_).contains("_c"))
    val appends = all.filterNot(baseName(_).contains("_c"))
    val genRe = """_c(\d+)_""".r
    val generations = compacted.flatMap(p =>
      genRe.findFirstMatchIn(baseName(p)).map(_.group(1)))
      .distinct.length
    val major = generations > majorGens
    val fs = if (major) all else appends
    def totalCount(): Long = {
      val now = files(dir)
      if (now.isEmpty) 0L else spark.read.parquet(now: _*).count()
    }
    if (fs.isEmpty) {
      totalCount()
    } else {
      // even a single append folds: the rewrite is what range-stamps the
      // file for pruned() (a freshly-seeded single-file store must not
      // stay unprunable forever)
      val stage = child(dir, uniqueName(".stage_", ""))
      try {
        val inputBytes = bytesOf(fs)
        val nShards = math.max(shards, math.min(1 << 14,
          ((inputBytes + TargetShardBytes - 1) / TargetShardBytes).toInt))
        // rowFilter is the TTL reaper's hook: expired rows are dropped at
        // fold time (age-based, cheap — reaper.c:49-352's semantics on an
        // append-only store), so a windowed gate's store stays bounded by
        // the window instead of the stream's lifetime
        val read0 = spark.read.parquet(fs: _*)
        val read = rowFilter.fold(read0)(read0.where)
        val distinctRows = read.select(cols.head, cols.tail: _*).distinct()
        val out = sortCol match {
          case Some(c) => distinctRows.repartitionByRange(nShards, col(c))
            .sortWithinPartitions(c)
          case None => distinctRows.repartition(nShards)
        }
        out.write.mode("overwrite")
          .option("parquet.page.size", PageBytes.toString)
          .parquet(stage)
        val parts = sfs.list(stage).filter(_.endsWith(".parquet")).sorted
        // per-shard [min,max] of the sort column (one metadata-light pass
        // over the just-written, page-cached stage) + exact row count
        val ranged: Map[String, (String, String)] = sortCol match {
          case Some(c) =>
            // explicit part paths, not the stage DIRECTORY: the dir's
            // dot-prefixed name trips DataSource's hidden-path check and
            // logs a spurious "All paths were ignored" WARN per compaction
            // (dozens per bench run — they drowned the artifact tail)
            spark.read.parquet(parts.map(child(stage, _)): _*)
              .groupBy(input_file_name().as("f"))
              .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
              .collect()
              .flatMap { r =>
                for (lo <- encodeKey(r.get(1)); hi <- encodeKey(r.get(2)))
                  yield (baseName(new java.net.URI(r.getString(0)).getPath),
                    (lo, hi))
              }.toMap
          case _ => Map.empty
        }
        val nanos = System.nanoTime()
        parts.zipWithIndex.foreach { case (part, k) =>
          val suffix = ranged.get(part)
            .map { case (lo, hi) => s"_r${lo}_$hi" }.getOrElse("")
          // compaction publish: each range-stamped shard becomes visible
          // atomically; the old files are deleted only after every shard
          // landed (a crash mid-loop leaves extra rows, never missing)
          sfs.publish(child(stage, part),
            child(dir, f"${prefix}%s_$batch%05d_c${nanos}%d_s$k%d$suffix%s.parquet"),
            durable = false)
        }
        fs.foreach(sfs.deleteRecursively)
        totalCount()
      } finally sfs.deleteRecursively(stage)
    }
  }

  /** One distributed pass building a bloom of design size `n` over
    * `colName` across every file in `dir` — the shared regrow/bootstrap
    * primitive (compaction and restart both right-size the filter from
    * the store's actual key count so it never runs saturated). */
  def buildBloom(spark: SparkSession, dir: String, colName: String,
      p: Double, n: Int): graft.sketch.BloomFilter = {
    val out = graft.sketch.BloomFilter.empty(p, n)
    val fs = files(dir)
    if (fs.nonEmpty)
      out.union(graft.sketch.BloomFilter.deserialize(
        spark.read.parquet(fs: _*)
          .agg(graft.functions.GraftFunctions.bloom_agg(col(colName), p, n).as("b"))
          .collect()(0).getAs[Array[Byte]]("b")))
    out
  }

  /** The bloom design size for a store of `count` keys given the current
    * size `n0` — grows (never shrinks) with 2x headroom. */
  def bloomSizeFor(count: Long, n0: Int): Int =
    if (count <= n0) n0
    else math.min(Int.MaxValue.toLong, math.max(n0.toLong * 4, count * 2)).toInt

  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }
}

/** Driver-direct parquet writer behind [[GateStore.appendLocal]] (round
  * 19): Spark `Row`s written straight into parquet-mr's `RecordConsumer`
  * through per-FIELD writer closures bound once per schema — no
  * intermediate Group materialization (one object + one ArrayList per
  * column per row) and no per-CELL dataType pattern match on the gates'
  * commit thread. Emits exactly the event sequence the example-Group
  * writer produced for the same MessageType (same 3-level LIST layout,
  * null element → empty inner group, null column → absent field), so the
  * bytes spark.read sees are unchanged. */
private[streaming] object RowParquetWriter {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._
  import org.apache.parquet.io.api.{Binary, RecordConsumer}
  import org.apache.parquet.schema.MessageType

  private def writerFor(f: StructField, i: Int): (RecordConsumer, Row) => Unit = {
    val name = f.name
    def framed(body: (RecordConsumer, Row) => Unit): (RecordConsumer, Row) => Unit =
      (rc, r) => { rc.startField(name, i); body(rc, r); rc.endField(name, i) }
    f.dataType match {
      case LongType => framed((rc, r) => rc.addLong(r.getLong(i)))
      case IntegerType => framed((rc, r) => rc.addInteger(r.getInt(i)))
      case StringType =>
        framed((rc, r) => rc.addBinary(Binary.fromString(r.getString(i))))
      case DoubleType => framed((rc, r) => rc.addDouble(r.getDouble(i)))
      case FloatType => framed((rc, r) => rc.addFloat(r.getFloat(i)))
      case BooleanType => framed((rc, r) => rc.addBoolean(r.getBoolean(i)))
      case TimestampType => framed((rc, r) => rc.addLong(
        org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(
          r.get(i) match {
            case t: java.sql.Timestamp => t.toInstant
            case t: java.time.Instant => t
          })))
      case DateType => framed((rc, r) => rc.addInteger(r.get(i) match {
        case d: java.sql.Date =>
          org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d)
        case d: java.time.LocalDate => d.toEpochDay.toInt
      }))
      case ArrayType(elem, _) =>
        val addElem: (RecordConsumer, Any) => Unit = elem match {
          case LongType => (rc, v) => rc.addLong(v.asInstanceOf[Long])
          case FloatType => (rc, v) => rc.addFloat(v.asInstanceOf[Float])
          case DoubleType => (rc, v) => rc.addDouble(v.asInstanceOf[Double])
          case other => throw new IllegalStateException(s"$other")
        }
        framed { (rc, r) =>
          rc.startGroup()
          val vals: Iterator[Any] = r.get(i) match {
            case a: Array[_] => a.iterator
            case s: scala.collection.Seq[_] => s.iterator
            case other => throw new IllegalStateException(
              s"unexpected array host ${other.getClass}")
          }
          if (vals.hasNext) {
            rc.startField("list", 0)
            vals.foreach { v =>
              rc.startGroup()
              // a null element stays an EMPTY list entry (the layout's
              // optional element) — an unguarded unbox would silently turn
              // null into 0 and corrupt the payload
              if (v != null) {
                rc.startField("element", 0)
                addElem(rc, v)
                rc.endField("element", 0)
              }
              rc.endGroup()
            }
            rc.endField("list", 0)
          }
          rc.endGroup()
        }
      case other => throw new IllegalStateException(s"$other")
    }
  }

  private final class Support(msg: MessageType, schema: StructType)
      extends org.apache.parquet.hadoop.api.WriteSupport[Row] {
    private var rc: RecordConsumer = _
    private val writers: Array[(RecordConsumer, Row) => Unit] =
      schema.fields.zipWithIndex.map { case (f, i) => writerFor(f, i) }
    override def init(conf: org.apache.hadoop.conf.Configuration)
        : org.apache.parquet.hadoop.api.WriteSupport.WriteContext =
      new org.apache.parquet.hadoop.api.WriteSupport.WriteContext(msg,
        java.util.Collections.emptyMap[String, String]())
    override def prepareForWrite(c: RecordConsumer): Unit = rc = c
    override def write(r: Row): Unit = {
      rc.startMessage()
      var i = 0
      while (i < writers.length) {
        if (!r.isNullAt(i)) writers(i)(rc, r)
        i += 1
      }
      rc.endMessage()
    }
  }

  private final class Builder(path: org.apache.hadoop.fs.Path, support: Support)
      extends org.apache.parquet.hadoop.ParquetWriter.Builder[Row, Builder](path) {
    override def self(): Builder = this
    override def getWriteSupport(conf: org.apache.hadoop.conf.Configuration)
        : org.apache.parquet.hadoop.api.WriteSupport[Row] = support
  }

  def build(path: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration, msg: MessageType,
      schema: StructType, pageBytes: Int)
      : org.apache.parquet.hadoop.ParquetWriter[Row] =
    new Builder(path, new Support(msg, schema))
      .withConf(conf)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .withPageSize(pageBytes)
      .build()
}
