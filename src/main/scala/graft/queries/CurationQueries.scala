package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** Corpus-curation operators for assembling a training set out of a raw
  * document pool: token-budget sequence packing, overlapping chunking,
  * SemDeDup-style semantic deduplication, and per-domain mixture sampling.
  * (Beyond the reference surface — these are the steps that follow the
  * dedup/quality stages in graft.ops on the way to tokenized shards.)
  *
  * Every query keeps the 100-TB plan shape:
  *  - packing windows run PER SHARD (one hash/round-robin shuffle, then a
  *    partition-local sort) — never a global sort over the corpus;
  *  - chunking is map-only (explode of an index sequence, substring slices);
  *  - semantic dedup joins on a sign-bit bucket key — the classic SRP-LSH
  *    coarse quantizer with axis-aligned projections, so the candidate set
  *    is an equi-join, never an all-pairs cross join (widen the bit count
  *    as the corpus grows to keep per-bucket occupancy bounded);
  *  - mixture sampling is one aggregation; admission is a deterministic
  *    md5-prefix range test (reproducible across engines, re-runs and
  *    repartitioning — no RNG state to coordinate across executors).
  */
object CurationQueries {

  /** Whitespace token list, empty strings dropped — the corpus-wide token
    * accounting convention (same as q_token_count's). */
  private def toks(c: Column): Column = filter(split(c, " "), x => x =!= "")

  /** Sign-bit bucket over the first `bits` dimensions: bit i set iff
    * embedding[i] >= 0. Axis-aligned signed-random-projection LSH — exact
    * duplicates share every bit, near-duplicates almost always do. */
  private def signBucket(emb: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(emb, i + 1) >= 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def signBucketSql(bits: Int): String =
    (0 until bits).map { i =>
      s"CASE WHEN embedding[${i + 1}] >= 0 THEN ${1L << i} ELSE 0 END"
    }.mkString("(", " + ", ")")

  val all: Seq[QDef] = Seq(
    // Token-budget sequence packing (concat-and-cut): within each shard,
    // documents are concatenated in doc_id order and cut into ~512-token
    // packs; a doc belongs to the pack its first token lands in. This is
    // the deterministic, coordination-free packing used to build fixed-
    // context training shards: pack_id = floor(tokens_before / capacity)
    // needs only a per-shard running sum — no bin state, no driver loop.
    // Shards here are doc_id % 8 (round-robin); production uses
    // xxhash64(doc_id) % n_shards — same plan, opaque key. One shuffle on
    // the shard key, sort local to each shard's partition.
    QDef(
      "q_pack_sequences",
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |         CAST(length(list_filter(regexp_split_to_array(text, ' '),
        |                                 x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents
        |), p AS (
        |  SELECT shard, doc_id, n_tok,
        |         sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING
        |                          AND CURRENT ROW) AS cum
        |  FROM t
        |)
        |SELECT shard, CAST(floor(CAST(cum - n_tok AS DOUBLE) / 512) AS BIGINT) AS pack_id,
        |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM p GROUP BY shard, pack_id ORDER BY shard, pack_id""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy("shard").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, dir)
          .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
            size(toks(col("text"))).cast("long").as("n_tok"))
          .withColumn("cum", sum("n_tok").over(w))
          .groupBy(col("shard"),
            floor((col("cum") - col("n_tok")).cast("double") / 512).cast("long").as("pack_id"))
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").cast("long").as("n_tokens"))
          .orderBy("shard", "pack_id")
    },

    // Overlapping fixed-window chunking: 200-char chunks on a 150-char
    // stride (50-char overlap), the retrieval-index prep step. Map-only:
    // explode an index sequence, slice with substring — document text
    // never shuffles, only (doc_id, idx, len, hash) rows leave the scan.
    QDef(
      "q_chunk_docs",
      """WITH c AS (
        |  SELECT doc_id, text,
        |         unnest(generate_series(0,
        |           greatest(CAST(floor(CAST(length(text) - 1 AS DOUBLE) / 150) AS BIGINT), 0)))
        |           AS chunk_idx
        |  FROM documents
        |)
        |SELECT doc_id, chunk_idx,
        |       CAST(length(substr(text, CAST(chunk_idx * 150 + 1 AS INT), 200)) AS BIGINT)
        |         AS chunk_len,
        |       substr(md5(substr(text, CAST(chunk_idx * 150 + 1 AS INT), 200)), 1, 8) AS h
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) {
      (s, dir) =>
        val lastIdx = greatest(
          floor((length(col("text")) - 1).cast("double") / 150).cast("long"), lit(0L))
        val start = (col("chunk_idx") * 150 + 1).cast("int")
        val chunk = col("text").substr(start, lit(200))
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0L), lastIdx)).as("chunk_idx"))
          .select(col("doc_id"), col("chunk_idx"),
            length(chunk).cast("long").as("chunk_len"),
            substring(md5(chunk), 1, 8).as("h"))
          .orderBy("doc_id", "chunk_idx")
    },

    // SemDeDup-style semantic dedup: bucket by the 8 leading sign bits
    // (256 coarse cells), drop any vector with cosine >= 0.98 to a
    // lower-id vector in its cell, keep the rest. Exact duplicates
    // (seeded at vec_id+100000 for every vec_id % 3 = 0) share all sign
    // bits and score cosine 1.0, so recall on them is structural; natural
    // 64-dim pairs never approach 0.98, keeping the threshold test
    // engine-stable. The candidate join is an equi-join on the bucket key
    // — at a billion vectors, raise the bit count so cells stay small.
    QDef(
      "q_semantic_dedup",
      s"""WITH corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000 AS vec_id, embedding
         |  FROM embeddings WHERE vec_id % 3 = 0
         |), b AS (
         |  SELECT vec_id, embedding, ${signBucketSql(8)} AS bucket
         |  FROM corpus
         |), dropped AS (
         |  SELECT DISTINCT y.vec_id
         |  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |  WHERE list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
         |                               CAST(y.embedding AS DOUBLE[])) >= 0.98
         |)
         |SELECT bucket, count(*) AS n_vecs,
         |       CAST(count(*) - count(d.vec_id) AS BIGINT) AS n_kept
         |FROM b LEFT JOIN dropped d ON b.vec_id = d.vec_id
         |GROUP BY bucket ORDER BY bucket""".stripMargin) {
      (s, dir) =>
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val corpus = e.unionByName(
          e.where(col("vec_id") % 3 === 0)
            .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
        val b = corpus.select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"),
          signBucket(col("embedding"), 8).as("bucket"))
        val x = b.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("ea"))
        val y = b.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("eb"))
        val dropped = x.join(y, Seq("bucket"))
          .where(col("id_a") < col("id_b") &&
            VectorExpressions.cosineSim(col("ea"), col("eb")) >= 0.98)
          .select(col("id_b").as("vec_id")).distinct()
          .withColumn("hit", lit(1))
        b.join(dropped, Seq("vec_id"), "left")
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_vecs"),
            (count(lit(1)) - count(col("hit"))).cast("long").as("n_kept"))
          .orderBy("bucket")
    },

    // BPE-style subword token accounting: the GPT-2 pre-tokenizer split
    // (contiguous letter runs / digit runs / punctuation runs, each with an
    // optional leading space — the lookahead-free core of its pattern, so
    // Java regex and RE2 agree), vs whitespace tokens, per source.
    // "Fertility" (subword-per-word ratio) is the standard budget-planning
    // signal. Map-only scan + one aggregation; the regex is the dominant
    // cost and is codegen'd per row — no shuffle carries text.
    QDef(
      "q_bpe_tokens",
      """SELECT source,
        |       CAST(sum(len(regexp_extract_all(text,
        |              ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))) AS BIGINT) AS n_bpe,
        |       CAST(sum(len(list_filter(regexp_split_to_array(text, ' '),
        |                                x -> x <> ''))) AS BIGINT) AS n_ws,
        |       round(CAST(sum(len(regexp_extract_all(text,
        |              ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))) AS DOUBLE)
        |             / greatest(sum(len(list_filter(regexp_split_to_array(text, ' '),
        |                                x -> x <> ''))), 1), 4) AS fertility
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) {
      (s, dir) =>
        val bpe = size(regexp_extract_all(col("text"),
          lit(" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"), lit(0))).cast("long")
        val ws = size(toks(col("text"))).cast("long")
        Tables.documents(s, dir)
          .select(col("source"), bpe.as("bpe"), ws.as("ws"))
          .groupBy("source")
          .agg(sum("bpe").cast("long").as("n_bpe"),
            sum("ws").cast("long").as("n_ws"),
            round(sum("bpe").cast("double") / greatest(sum("ws"), lit(1L)), 4)
              .as("fertility"))
          .orderBy("source")
    },

    // Curation funnel: the per-source attrition report for a stacked filter
    // chain (length gate → ink-ratio gate → token-shape gate) — the
    // observability step every production curation run ships with. One
    // scan, conditional aggregates, one shuffle; no filter re-scans.
    QDef(
      "q_curation_funnel",
      """WITH f AS (
        |  SELECT source,
        |         CAST(length(list_filter(regexp_split_to_array(text, ' '),
        |                                 x -> x <> '')) AS BIGINT) AS n_tok,
        |         length(text) BETWEEN 100 AND 2000 AS len_ok,
        |         CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |           / greatest(length(text), 1) >= 0.7 AS ink_ok,
        |         length(list_filter(regexp_split_to_array(text, ' '),
        |                            x -> x <> '')) >= 20 AS tok_ok
        |  FROM documents
        |)
        |SELECT source, count(*) AS n_total,
        |       CAST(count(CASE WHEN len_ok THEN 1 END) AS BIGINT) AS n_len,
        |       CAST(count(CASE WHEN len_ok AND ink_ok THEN 1 END) AS BIGINT) AS n_ink,
        |       CAST(count(CASE WHEN len_ok AND ink_ok AND tok_ok THEN 1 END) AS BIGINT)
        |         AS n_kept,
        |       CAST(sum(CASE WHEN len_ok AND ink_ok AND tok_ok THEN n_tok ELSE 0 END)
        |         AS BIGINT) AS kept_tokens
        |FROM f GROUP BY source ORDER BY source""".stripMargin) {
      (s, dir) =>
        val t = col("text")
        val nTok = size(toks(t)).cast("long")
        val lenOk = length(t).between(100, 2000)
        val inkOk = length(translate(t, " ", "")).cast("double") /
          greatest(length(t), lit(1)) >= 0.7
        val tokOk = size(toks(t)) >= 20
        Tables.documents(s, dir)
          .select(col("source"), nTok.as("n_tok"), lenOk.as("len_ok"),
            inkOk.as("ink_ok"), tokOk.as("tok_ok"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_total"),
            count(when(col("len_ok"), 1)).cast("long").as("n_len"),
            count(when(col("len_ok") && col("ink_ok"), 1)).cast("long").as("n_ink"),
            count(when(col("len_ok") && col("ink_ok") && col("tok_ok"), 1))
              .cast("long").as("n_kept"),
            sum(when(col("len_ok") && col("ink_ok") && col("tok_ok"), col("n_tok"))
              .otherwise(0L)).cast("long").as("kept_tokens"))
          .orderBy("source")
    },

    // Domain mixture sampling: each source gets a target admission rate by
    // its group (1, 1/2, 1/4, 1/8 for source index % 4 = 0,1,2,3) and a
    // deterministic md5-prefix admission test — the reproducible way to
    // hit per-domain token budgets at 100 TB (no RNG, stable under
    // re-runs and repartitioning). One scan, one aggregation shuffle.
    QDef(
      "q_domain_mix",
      """WITH r AS (
        |  SELECT source, CAST(substr(source, 4) AS INT) % 4 AS grp,
        |         substr(md5(text), 1, 1) AS h1,
        |         CAST(length(list_filter(regexp_split_to_array(text, ' '),
        |                                 x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents
        |), a AS (
        |  SELECT source, grp, n_tok,
        |         CASE WHEN grp = 0 THEN TRUE
        |              WHEN grp = 1 AND h1 < '8' THEN TRUE
        |              WHEN grp = 2 AND h1 < '4' THEN TRUE
        |              WHEN grp = 3 AND h1 < '2' THEN TRUE
        |              ELSE FALSE END AS kept
        |  FROM r
        |)
        |SELECT source,
        |       CASE grp WHEN 0 THEN 1.0 WHEN 1 THEN 0.5
        |                WHEN 2 THEN 0.25 ELSE 0.125 END AS target_rate,
        |       count(*) AS n_total,
        |       CAST(count(CASE WHEN kept THEN 1 END) AS BIGINT) AS n_kept,
        |       CAST(sum(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens
        |FROM a GROUP BY source, grp ORDER BY source""".stripMargin) {
      (s, dir) =>
        val grp = expr("CAST(substr(source, 4) AS INT) % 4")
        val h1 = substring(md5(col("text")), 1, 1)
        val kept = (col("grp") === 0) ||
          (col("grp") === 1 && col("h1") < "8") ||
          (col("grp") === 2 && col("h1") < "4") ||
          (col("grp") === 3 && col("h1") < "2")
        Tables.documents(s, dir)
          .select(col("source"), grp.as("grp"), h1.as("h1"),
            size(toks(col("text"))).cast("long").as("n_tok"))
          .withColumn("kept", kept)
          .groupBy("source", "grp")
          .agg(count(lit(1)).as("n_total"),
            count(when(col("kept"), 1)).cast("long").as("n_kept"),
            sum(when(col("kept"), col("n_tok")).otherwise(0L)).cast("long").as("kept_tokens"))
          .select(col("source"),
            when(col("grp") === 0, 1.0).when(col("grp") === 1, 0.5)
              .when(col("grp") === 2, 0.25).otherwise(0.125).as("target_rate"),
            col("n_total"), col("n_kept"), col("kept_tokens"))
          .orderBy("source")
    })
}
