package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{AnnSearch, LangId, Media, MinHashLsh, PqSearch, SimHash, TextOps}

/** Training-data-pipeline operators over `documents`/`embeddings`:
  * MinHash+LSH near-dup (oracle: DuckDB brute-force n-gram Jaccard),
  * exact n-gram Jaccard (oracle), SimHash near-dup, LSH ANN, language ID,
  * multimodal metadata extraction (rows-only: custom hash pipelines).
  *
  * The near-dup corpora are seeded deterministically (documents ∪ perturbed
  * copies of even doc_ids) because the synthetic corpus has no natural
  * near-duplicates; both engines construct the identical corpus in SQL.
  */
object DedupQueries {

  /** documents ∪ near-dup copies of even doc_ids (id + 1000000). */
  private def seededCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    d.unionByName(
      d.where(pmod(col("doc_id"), lit(2)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" zz yy")).as("text")))
  }

  private val corpusSql =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text || ' zz yy' AS text
      |  FROM documents WHERE doc_id % 2 = 0
      |)""".stripMargin

  private val shinglesSql =
    """sh AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(range(1, greatest(len(toks)-1, 1)),
      |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM (SELECT doc_id,
      |               list_filter(regexp_split_to_array(text, ' '), t -> t <> '') AS toks
      |        FROM corpus)
      |)""".stripMargin

  val all: Seq[QDef] = Seq(
    // MinHash → banded LSH → exact-Jaccard verify; DuckDB re-derives the
    // answer by brute force over all pairs. Equality holds because the
    // band/row choice (64×2) puts miss probability at (1-0.36)^64 ≈ 4e-13
    // for pairs at the 0.6 threshold.
    QDef(
      "q_minhash_neardup",
      s"""WITH $corpusSql, $shinglesSql
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
         |FROM sh a, sh b
         |WHERE a.doc_id < b.doc_id
         |  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6
         |ORDER BY id_a, id_b""".stripMargin) {
      (s, dir) =>
        MinHashLsh.nearDuplicates(seededCorpus(s, dir), "doc_id", "text", threshold = 0.6)
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
          .orderBy("id_a", "id_b")
    },

    // Exact n-gram Jaccard similarity matrix over a probe set.
    QDef(
      "q_ngram_jaccard",
      """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 30),
        |     sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, greatest(len(toks)-1, 1)),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM (SELECT doc_id,
        |               list_filter(regexp_split_to_array(text, ' '), t -> t <> '') AS toks
        |        FROM corpus))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
        |FROM sh a, sh b
        |WHERE a.doc_id < b.doc_id
        |  AND len(list_intersect(a.sh, b.sh)) > 0
        |ORDER BY id_a, id_b""".stripMargin) {
      (s, dir) =>
        val docs = Tables.documents(s, dir).where(col("doc_id") < 30)
          .select(col("doc_id"), TextOps.shingles(col("text")).as("sh"))
        val a = docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
        val b = docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
        a.join(b, col("id_a") < col("id_b"))
          .where(size(array_intersect(col("sh_a"), col("sh_b"))) > 0)
          .select(col("id_a"), col("id_b"),
            round(TextOps.jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
          .orderBy("id_a", "id_b")
    },

    // SimHash near-dup, oracled on its seeded-recall subset: the corpus is
    // documents ∪ EXACT copies of even doc_ids, and identical text ⇒
    // identical fingerprint ⇒ Hamming 0 (4-chunk banding has recall 1 at
    // distance 0), so restricting the output to self-copy pairs
    // (id_b = id_a + 1000000) yields a deterministic, DuckDB-expressible
    // result: every even doc_id at distance 0. The unrestricted
    // Hamming ≤ 3 behavior (which also surfaces natural near-dup pairs in
    // this corpus) is verified against brute-force Hamming in OpsSpec.
    QDef(
      "q_simhash_neardup",
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b, CAST(0 AS INT) AS hamming
        |FROM documents WHERE doc_id % 2 = 0
        |ORDER BY id_a""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val corpus = d.unionByName(
        d.where(pmod(col("doc_id"), lit(2)) === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      // blocks = 6 runs the wide-key (saturation-proof) banding — the
      // operating point for production corpora — through the driver gate;
      // recall at distance <= 3 is 1.0 under any blocks > 3, so the
      // verified output is identical to the classic 4-chunk scheme's
      SimHash.nearDuplicates(corpus, "doc_id", "text", maxDist = 3, blocks = 6)
        .where(col("id_b") === col("id_a") + 1000000L)
        .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
        .orderBy("id_a")
    },

    // Embedding-cosine near-dup: seeded exact copies of even vec_ids; LSH
    // candidate recall at cos≈1 is 1-1.6e-10, exact cosine verifies — so
    // DuckDB brute force over the same seeded corpus is a valid oracle.
    QDef(
      "q_cosine_neardup",
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id, embedding
        |  FROM embeddings WHERE vec_id % 2 = 0)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[])), 4) AS cos
        |FROM corpus a, corpus b
        |WHERE a.vec_id < b.vec_id
        |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.99
        |ORDER BY id_a, id_b""".stripMargin) {
      (s, dir) =>
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val seeded = e.unionByName(
          e.where(pmod(col("vec_id"), lit(2)) === 0)
            .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
        AnnSearch.cosineNearDuplicates(seeded, dim = 64, threshold = 0.99)
          .orderBy("id_a", "id_b")
    },

    // LSH ANN on a forced-rank-1 domain: every probe (vec_id < 10) gets an
    // exact duplicate seeded at vec_id+100000. An identical vector collides
    // in every LSH table and scores cosine 1.0 — the maximum — so the rank-1
    // row per probe is forced to (probe, probe+100000, 1.0) and is a DuckDB
    // constant (no natural pair reaches round(sim, 6) = 1 on gaussian
    // vectors). Top-k recall behavior stays covered by OpsSpec.
    QDef(
      "q_ann_lsh",
      """SELECT vec_id AS probe_id, vec_id + 100000 AS neighbor_id,
        |       CAST(1.0 AS DOUBLE) AS sim, CAST(1 AS BIGINT) AS rk
        |FROM embeddings WHERE vec_id < 10 ORDER BY probe_id""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val seeded = e.unionByName(
        e.where(col("vec_id") < 10)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
      AnnSearch.lshKnn(seeded, dim = 64, nProbes = 10, k = 3,
        numTables = 16, bitsPerTable = 4)
        .where(col("rk") === 1)
    },

    // IVF-flat ANN — second scale path (inverted lists); same forced-rank-1
    // oracle domain as q_ann_lsh (the duplicate lands in the probe's own
    // nearest inverted list, nprobe ≥ 1 always scans it).
    QDef(
      "q_ann_ivf",
      """SELECT vec_id AS probe_id, vec_id + 100000 AS neighbor_id,
        |       CAST(1.0 AS DOUBLE) AS sim, CAST(1 AS BIGINT) AS rk
        |FROM embeddings WHERE vec_id < 10 ORDER BY probe_id""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val seeded = e.unionByName(
        e.where(col("vec_id") < 10)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
      AnnSearch.ivfKnn(seeded, dim = 64, nProbes = 10, k = 3,
        nCentroids = 16, nprobe = 6)
        .where(col("rk") === 1)
    },

    // Product-quantization ANN — third scale path (compressed-code ADC scan
    // + exact re-rank); same forced-rank-1 oracle domain. The duplicate's
    // ADC score is the self-reconstruction cosine (≈1 up to quantization
    // error), far above the shortlist floor, so it always reaches the exact
    // re-rank, which scores it 1.0 — rank 1 by construction. Shortlist
    // recall and ADC math exactness are spec-covered (OpsSpec).
    QDef(
      "q_ann_pq",
      """SELECT vec_id AS probe_id, vec_id + 100000 AS neighbor_id,
        |       CAST(1.0 AS DOUBLE) AS sim, CAST(1 AS BIGINT) AS rk
        |FROM embeddings WHERE vec_id < 10 ORDER BY probe_id""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val seeded = e.unionByName(
        e.where(col("vec_id") < 10)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
      PqSearch.pqKnn(seeded, dim = 64, nProbes = 10, k = 3,
        m = 16, ksub = 64, shortlist = 64)
        .where(col("rk") === 1)
    },

    // IVF-PQ ANN — the billion-vector composition (coarse inverted lists +
    // ADC over codes within probed lists + exact re-rank); same
    // forced-rank-1 oracle domain: an identical duplicate shares the
    // probe's nearest list (always probed at nprobe >= 1) and tops both the
    // ADC shortlist and the exact re-rank.
    QDef(
      "q_ann_ivfpq",
      """SELECT vec_id AS probe_id, vec_id + 100000 AS neighbor_id,
        |       CAST(1.0 AS DOUBLE) AS sim, CAST(1 AS BIGINT) AS rk
        |FROM embeddings WHERE vec_id < 10 ORDER BY probe_id""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val seeded = e.unionByName(
        e.where(col("vec_id") < 10)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
      PqSearch.ivfPqKnn(seeded, dim = 64, nProbes = 10, k = 3,
        nCentroids = 16, nprobe = 6, m = 16, ksub = 64, shortlist = 64)
        .where(col("rk") === 1)
    },

    // Language ID heuristic — the scoring is pure deterministic string/set
    // math, so DuckDB can recompute it exactly: per-language stopword-hit
    // ratio over distinct stripped tokens (CJK char fraction for zh),
    // argmax by (score, lang).
    QDef(
      "q_langid",
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(
        |           list_filter(regexp_split_to_array(lower(text), ' '), x -> x <> ''),
        |           s -> regexp_replace(s, '[^\p{L}]', '', 'g'))) AS dt,
        |         text
        |  FROM documents WHERE doc_id < 100
        |), scored AS (
        |  SELECT doc_id, l.lang AS lang,
        |    CASE WHEN l.lang = 'zh'
        |      THEN CAST(length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS DOUBLE)
        |           / greatest(length(text), 1)
        |      ELSE CAST(len(list_intersect(dt, l.words)) AS DOUBLE) / greatest(len(dt), 1)
        |    END AS score
        |  FROM toks, (VALUES
        |      ('de', ['der','die','und','das','von','zu','mit','den','ist','nicht']),
        |      ('en', ['the','and','of','to','in','is','that','it','for','with']),
        |      ('es', ['el','la','de','que','y','en','los','del','las','por']),
        |      ('fr', ['le','la','les','des','est','dans','que','une','pour','qui']),
        |      ('zh', CAST([] AS VARCHAR[]))) AS l(lang, words)
        |)
        |SELECT doc_id,
        |       (max({'s': score, 'l': lang})).l AS lang_pred,
        |       round((max({'s': score, 'l': lang})).s, 4) AS confidence
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).where(col("doc_id") < 100)
        .select(col("doc_id"), LangId.detect(col("text")).as("d"))
        .select(col("doc_id"), col("d.lang").as("lang_pred"), col("d.confidence").as("confidence"))
        .orderBy("doc_id")
    },

    // Multimodal plumbing: synthetic binary media → metadata extraction →
    // per-format stats. The synthetic bytes are unhex(md5(text)) and the
    // stub decoder's header parse is pure arithmetic on those bytes, so
    // DuckDB recomputes the whole pipeline from md5 hex substrings.
    QDef(
      "q_media_meta",
      """WITH m AS (
        |  SELECT CASE CAST('0x' || substr(md5(text), 1, 2) AS INT) & 3
        |           WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' WHEN 2 THEN 'wav'
        |           ELSE 'mp4' END AS format,
        |         CAST('0x' || substr(md5(text), 3, 4) AS INT) % 4096 AS width,
        |         CAST('0x' || substr(md5(text), 11, 4) AS INT) % 1024 AS n_frames
        |  FROM documents
        |)
        |SELECT format, count(*) AS n, round(avg(width), 4) AS avg_w,
        |       CAST(sum(n_frames) AS BIGINT) AS frames
        |FROM m GROUP BY format ORDER BY format""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val media = docs.select(col("doc_id"), Media.syntheticMediaBytes(col("text")).as("bytes"))
      Media.extractMetadata(media, "doc_id", "bytes")
        .groupBy("format")
        .agg(count(lit(1)).as("n"), round(avg("width"), 4).as("avg_w"),
          sum("n_frames").cast("long").as("frames"))
        .orderBy("format")
    },

    // Resize pass: binary → binary at target dims. The stub resample is
    // md5 over "hex(input):WxH" (text domain), so DuckDB recomputes the
    // output bytes exactly: input bytes are unhex(md5(text)), whose
    // lowercase hex is md5(text) itself.
    QDef(
      "q_media_resize",
      """SELECT doc_id AS media_id,
        |       CASE CAST('0x' || substr(md5(text), 1, 2) AS INT) & 3
        |         WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' WHEN 2 THEN 'wav'
        |         ELSE 'mp4' END AS format,
        |       64 AS width, 64 AS height,
        |       md5(md5(text) || ':64x64') AS fp
        |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val media = docs.select(col("doc_id"), Media.syntheticMediaBytes(col("text")).as("bytes"))
      Media.resize(media, "doc_id", "bytes", targetW = 64, targetH = 64)
        .select(col("media_id"), col("format"), col("width"), col("height"),
          lower(hex(col("bytes"))).as("fp"))
        .orderBy("media_id")
    },

    // Duplicate-cluster closure: connected components over the MinHash+LSH
    // near-dup pairs, one row per cluster with its canonical (min) id.
    // DuckDB recomputes the same clusters via a recursive transitive
    // closure over the brute-force pair set (tiny at oracle scale; the
    // Spark side is the iterative min-label propagation that scales).
    QDef(
      "q_dedup_clusters",
      s"""WITH RECURSIVE $corpusSql, $shinglesSql,
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a, sh b
         |  WHERE a.doc_id < b.doc_id
         |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6
         |),
         |e AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION
         |  SELECT id_b AS a, id_a AS b FROM pairs
         |),
         |reach(a, b) AS (
         |  SELECT a, b FROM e
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
         |),
         |comp AS (
         |  SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a
         |)
         |SELECT component, count(*) AS n_docs, max(id) AS max_id
         |FROM comp GROUP BY component ORDER BY component""".stripMargin) { (s, dir) =>
      val pairs = MinHashLsh.nearDuplicates(seededCorpus(s, dir), "doc_id", "text", 0.6)
      graft.ops.DedupClusters.clusterSummary(pairs, "id_a", "id_b")
        .orderBy("component")
    })
}
