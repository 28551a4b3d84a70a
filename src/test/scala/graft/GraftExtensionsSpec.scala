package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-deployment path: `spark.sql.extensions=graft.GraftExtensions`
  * must expose the full SQL function surface in a session that never calls
  * GraftFunctions.register.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions exposes the function surface") {
    // force a genuinely new session (getOrCreate would reuse the suite-wide
    // default); extensions are applied at session construction from conf
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions drives the same injection hook that
      // `--conf spark.sql.extensions=graft.GraftExtensions` invokes at
      // session construction; the conf-string path itself needs the conf
      // present when the SparkContext launches, which a shared-context test
      // JVM cannot arrange deterministically.
      val s = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")

      // scalar sketch surface: constant-folded empties + mutators + readers
      val card = s.sql(
        "SELECT hll_cardinality(hll_add(hll_add(hll_empty(), 'a'), 'b')) AS c")
        .collect()(0).getLong(0)
      assert(card == 2L)
      // aggregate surface + date_round
      import s.implicits._
      val df = Seq(("a", 1.0), ("a", 2.0), ("b", 9.0)).toDF("k", "v")
      df.createOrReplaceTempView("ext_t")
      val got = s.sql(
        """SELECT k, hll_cardinality(hll_agg(v)) AS nd,
          |       freq(freq_agg(k), 'a') AS fa
          |FROM ext_t GROUP BY k ORDER BY k""".stripMargin).collect()
      assert(got.map(_.getLong(1)).toSeq == Seq(2L, 1L))
      assert(s.sql("SELECT date_round(timestamp'2024-01-01 00:07:55', '5 minutes') AS t")
        .collect()(0).getTimestamp(0).toString.startsWith("2024-01-01 00:05:00"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
