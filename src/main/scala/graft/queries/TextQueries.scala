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
