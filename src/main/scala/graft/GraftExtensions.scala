package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Spark-native deployment entry point: activate the whole graft function
  * surface (sketch aggregates, combine()/finalize(), date_round,
  * hypothetical-set aggregates, json aggs, ...) in every session of a
  * cluster with
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * — the Spark counterpart of the reference being loaded as a database
  * extension (`CREATE EXTENSION pipelinedb`, pipelinedb--1.0.0.sql:1-2801):
  * the engine's SQL surface exists without any library call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.injectInto(ext)
}
