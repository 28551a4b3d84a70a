package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: find and mask
  * emails, phone numbers, IPv4 addresses, and SSN-shaped identifiers before
  * a corpus is used for model training.
  *
  * Pure `regexp_count` / `regexp_replace` Column composition — map-only,
  * whole-stage-codegen'd, zero shuffles: at 100 TB this runs at scan speed
  * and composes with any downstream filter/write without a repartition.
  * Patterns are deliberately RE2-compatible (no backrefs/lookaround) so the
  * same regexes run in Spark (java.util.regex), DuckDB (RE2), and any
  * downstream filtering stack.
  */
object Pii {

  /** Category → pattern. Order matters for [[redact]]: SSN before phone
    * (both are digit-dash shapes; the 3-2-4 SSN grouping must win).
    */
  val patterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4"  -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "ssn"   -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "phone" -> "\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b")

  private val byName = patterns.toMap

  /** Occurrence count of one PII category in a text column. */
  def count(text: Column, category: String): Column =
    regexp_count(text, lit(byName(category)))

  /** Mask every PII category with its `[CATEGORY]` placeholder, in the
    * canonical order (emails first — they may contain digit runs that the
    * later numeric patterns would otherwise split).
    */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (acc, (name, re)) =>
      regexp_replace(acc, re, s"[${name.toUpperCase}]")
    }

  /** True if the text contains any known PII category — the cheap
    * pre-filter a redaction pass runs first so clean documents (the vast
    * majority of a crawled corpus) skip the rewrite entirely.
    */
  def containsPii(text: Column): Column =
    patterns.map { case (_, re) => text.rlike(re) }.reduce(_ || _)
}
