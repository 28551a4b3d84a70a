package graft.queries

import org.apache.spark.sql.functions._

/** Training-data-pipeline text operators over the `documents` table:
  * exact dedup, token counting, quality scoring, per-language stats.
  * (MinHash/SimHash/LSH near-dup live in graft.ops — their hash pipelines
  * are not oracle-expressible in DuckDB, so they register rows-only checks.)
  *
  * Oracle parity notes: only engine-agnostic primitives are used on both
  * sides — md5 (RFC 1321, identical hex in Spark and DuckDB), length,
  * replace, simple POSIX character classes.
  */
object TextQueries {

  val all: Seq[QDef] = Seq(
    // Per-language corpus stats.
    QDef(
      "q_doc_stats",
      """SELECT lang, count(*) AS n_docs,
        |       round(avg(n_chars), 4) AS avg_chars,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |       count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            round(avg("n_chars"), 4).as("avg_chars"),
            min("n_chars").as("min_chars"),
            max("n_chars").as("max_chars"),
            countDistinct(col("source")).as("n_sources"))
          .orderBy("lang")
    },

    // Exact dedup: hash-groupBy on content, keep lowest doc_id per group.
    // At 100 TB this is a single shuffle on a 16-byte key (md5), grouping
    // only (hash, min_id, count) — no document text moves after the map side.
    QDef(
      "q_dedup_exact",
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .groupBy(md5(col("text")).as("h"))
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy("h")
    },

    // Token counting (whitespace tokenization), corpus-level per source.
    QDef(
      "q_token_count",
      """SELECT source,
        |       CAST(sum(length(list_filter(regexp_split_to_array(text, ' '), x -> x <> ''))) AS BIGINT) AS n_tokens,
        |       CAST(sum(length(text)) AS BIGINT) AS n_chars_total
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .groupBy("source")
          .agg(
            sum(size(filter(split(col("text"), " "), x => x =!= ""))).cast("long").as("n_tokens"),
            sum(length(col("text"))).cast("long").as("n_chars_total"))
          .orderBy("source")
    },

    // Quality scoring: mean word length + whitespace ratio + a stopword
    // signal ("the" frequency), engine-agnostic string math only.
    QDef(
      "q_quality_score",
      """SELECT lang,
        |       round(avg(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |                 / length(text)), 6) AS ink_ratio,
        |       round(avg(CAST((length(text) - length(replace(text, 'the', '')))
        |                 AS DOUBLE) / 3.0), 4) AS avg_the_count
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) {
      (s, dir) =>
        val t = col("text")
        // literal replace/translate, not regexp_replace: the java.util.regex
        // engine on full document text was the single most expensive scalar
        // in the bench (~8x the literal codegen'd ops), for a fixed pattern
        Tables.documents(s, dir)
          .groupBy("lang")
          .agg(
            round(avg(length(translate(t, " ", "")).cast("double") / length(t)), 6)
              .as("ink_ratio"),
            round(avg((length(t) - length(replace(t, lit("the")))).cast("double") / 3.0), 4)
              .as("avg_the_count"))
          .orderBy("lang")
    },

    // Repetition signals (the Gopher/MassiveText-style quality filters:
    // duplicate-n-gram fraction and most-frequent-2-gram coverage) per
    // document. Scale shape: the dup fractions are pure map-side list math
    // (no shuffle); the top-gram coverage is a (doc_id, gram) group-by whose
    // map-side partial aggregation bounds the shuffle to distinct pairs.
    QDef(
      "q_repetition",
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(text, ' '), x -> x <> '') AS t
        |  FROM documents WHERE doc_id < 100
        |), grams AS (
        |  SELECT doc_id,
        |         -- range(a, b) is EXCLUSIVE of b: i runs 1..len-1 (2-grams)
        |         -- and 1..len-2 (3-grams)
        |         list_transform(range(1, greatest(len(t), 1)),
        |                        i -> t[i] || ' ' || t[i+1]) AS g2,
        |         list_transform(range(1, greatest(len(t) - 1, 1)),
        |                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS g3
        |  FROM toks
        |), dup AS (
        |  SELECT doc_id,
        |         round(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
        |               / greatest(len(g2), 1), 6) AS dup_2gram_frac,
        |         round(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE)
        |               / greatest(len(g3), 1), 6) AS dup_3gram_frac
        |  FROM grams
        |), top AS (
        |  SELECT doc_id,
        |         round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_2gram_frac
        |  FROM (SELECT doc_id, g, count(*) AS c
        |        FROM (SELECT doc_id, unnest(g2) AS g FROM grams)
        |        GROUP BY doc_id, g)
        |  GROUP BY doc_id
        |)
        |SELECT dup.doc_id AS doc_id, dup_2gram_frac, dup_3gram_frac,
        |       coalesce(top_2gram_frac, 0.0) AS top_2gram_frac
        |FROM dup LEFT JOIN top ON dup.doc_id = top.doc_id
        |ORDER BY dup.doc_id""".stripMargin) {
      (s, dir) =>
        val t = filter(split(col("text"), " "), x => x =!= "")
        def ngrams(tc: org.apache.spark.sql.Column, n: Int) =
          when(size(tc) >= n,
            transform(sequence(lit(1), size(tc) - (n - 1)),
              i => concat_ws(" ", (0 until n).map(o => element_at(tc, i + o)): _*)))
            .otherwise(array())
        val base = Tables.documents(s, dir).where(col("doc_id") < 100)
          .select(col("doc_id"), ngrams(t, 2).as("g2"), ngrams(t, 3).as("g3"))
        val dup = base.select(col("doc_id"),
          round(lit(1.0) - size(array_distinct(col("g2"))).cast("double")
            / greatest(size(col("g2")), lit(1)), 6).as("dup_2gram_frac"),
          round(lit(1.0) - size(array_distinct(col("g3"))).cast("double")
            / greatest(size(col("g3")), lit(1)), 6).as("dup_3gram_frac"))
        val top = base.select(col("doc_id"), explode(col("g2")).as("g"))
          .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(round(max("c").cast("double") / sum("c"), 6).as("top_2gram_frac"))
        dup.join(top, Seq("doc_id"), "left")
          .select(col("doc_id"), col("dup_2gram_frac"), col("dup_3gram_frac"),
            coalesce(col("top_2gram_frac"), lit(0.0)).as("top_2gram_frac"))
          .orderBy("doc_id")
    },

    // Benchmark decontamination (train/eval n-gram overlap — the pipeline
    // step that drops training docs leaking evaluation data): per eval doc
    // (doc_id < 20), the fraction of its distinct 3-grams that appear in ANY
    // train doc (doc_id >= 20). Scale shape: one equi-join on the gram key
    // with both sides pre-deduped map-side; at 100 TB the join key becomes
    // xxhash64(gram) so only 8-byte hashes shuffle — kept as strings here
    // for oracle parity.
    QDef(
      "q_decontaminate",
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(text, ' '), x -> x <> '') AS t
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
        |                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g3
        |  FROM toks
        |), eval_g AS (
        |  SELECT doc_id, unnest(g3) AS g FROM grams WHERE doc_id < 20
        |), train_g AS (
        |  SELECT DISTINCT unnest(g3) AS g FROM grams WHERE doc_id >= 20
        |)
        |SELECT e.doc_id AS doc_id,
        |       count(*) AS n_grams,
        |       CAST(count(t.g) AS BIGINT) AS n_hit,
        |       round(CAST(count(t.g) AS DOUBLE) / count(*), 6) AS overlap_frac
        |FROM eval_g e LEFT JOIN train_g t ON e.g = t.g
        |GROUP BY e.doc_id ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
        val t = filter(split(col("text"), " "), x => x =!= "")
        val g3 = when(size(t) >= 3,
          array_distinct(transform(sequence(lit(1), size(t) - 2),
            i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))))
          .otherwise(array())
        val grams = Tables.documents(s, dir).select(col("doc_id"), g3.as("g3"))
        val evalG = grams.where(col("doc_id") < 20)
          .select(col("doc_id"), explode(col("g3")).as("g"))
        val trainG = grams.where(col("doc_id") >= 20)
          .select(explode(col("g3")).as("g")).distinct()
          .withColumn("hit", lit(1))
        evalG.join(trainG, Seq("g"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            count(col("hit")).cast("long").as("n_hit"),
            round(count(col("hit")).cast("double") / count(lit(1)), 6).as("overlap_frac"))
          .orderBy("doc_id")
    },

    // Deterministic hash-range sampling: the RNG-free way to sample at
    // 100 TB (reproducible across engines, re-runs, and repartitioning) —
    // md5-prefix admission, ~1/8 of the corpus, summarized per language.
    QDef(
      "q_hash_sample",
      """SELECT lang, count(*) AS n, min(doc_id) AS mn, max(doc_id) AS mx
        |FROM documents WHERE substr(md5(text), 1, 1) IN ('0', '1')
        |GROUP BY lang ORDER BY lang""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .where(substring(md5(col("text")), 1, 1).isin("0", "1"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n"), min("doc_id").as("mn"), max("doc_id").as("mx"))
          .orderBy("lang")
    },

    // Document fingerprint sample: md5 prefix as a cheap content fingerprint
    // for the smallest 50 doc_ids (stable across engines).
    QDef(
      "q_fingerprint",
      """SELECT doc_id, substr(md5(text), 1, 16) AS fp
        |FROM documents ORDER BY doc_id LIMIT 50""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), substring(md5(col("text")), 1, 16).as("fp"))
          .orderBy("doc_id")
          .limit(50)
    })
}
