package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver testdata dirs (TESTDATA.md).
  *
  * All queries receive `(spark, sfDir)` and read tables through here so that
  * column pruning / predicate pushdown reach the parquet scans unimpeded.
  */
object Tables {
  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` arrives as naive (isAdjustedToUTC=false) parquet
    * timestamps — µs in the current testdata, TIMESTAMP(NANOS) in earlier
    * drops. Spark reads the former as TIMESTAMP_NTZ and (with
    * spark.sql.legacy.parquet.nanosAsLong=true, set by every session
    * builder in graft) the latter as a raw long. Normalize both to
    * TimestampType: sessions run with UTC timezone, so the NTZ→TZ cast is
    * wall-clock-preserving and matches DuckDB's naive read, and `ns div
    * 1000` is lossless because the generator emits µs-resolution values.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    // the NTZ→TZ cast below is wall-clock-preserving ONLY under UTC; a
    // session built without it would silently shift every ts value
    val tz = s.conf.get("spark.sql.session.timeZone", java.util.TimeZone.getDefault.getID)
    require(tz == "UTC",
      s"Tables.events requires spark.sql.session.timeZone=UTC (got $tz): " +
        "the naive-timestamp normalization would shift wall-clock values")
    val raw = apply(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  def lineitem(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = apply(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "region")
  def documents(s: SparkSession, dir: String): DataFrame = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")
}

/** One registrable query: the Spark implementation plus (optionally) the
  * equivalent DuckDB SQL the driver uses as a correctness oracle.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, None)
}
