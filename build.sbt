ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pipelinedbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked run's stdout through unprefixed: the bench harness parses
// the single JSON result line, and sbt's default logger decoration ("[info] ")
// would break that parse.
outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// The local-cluster[...] specs own their SparkContext (a JVM singleton
// with a different master), so they run in their OWN forked JVM; every
// other suite shares the default group's JVM as before.
Test / testGrouping := {
  // SPARK_SCALA_VERSION: the launcher's getScalaVersion() needs it to
  // build the forked executor command under local-cluster[...] (the
  // distribution at /opt/spark has no source-build dirs to infer it from)
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withEnvVars(Map("SPARK_SCALA_VERSION" -> "2.13"))
  val (cluster, rest) =
    (Test / definedTests).value.partition(_.name.endsWith("ClusterSpec"))
  Seq(
    new Tests.Group("cluster", cluster, Tests.SubProcess(forkOpts)),
    new Tests.Group("rest", rest, Tests.SubProcess(forkOpts)),
  ).filter(_.tests.nonEmpty)
}
// Forked test groups run SERIALLY: each group's JVM takes the full -Xmx
// (default 8g) and the cluster group additionally spawns two 2048 MB
// executor JVMs — concurrent groups would oversubscribe memory on
// smaller boxes.
// (sbt tags every forked test-group task with ForkedTestGroup itself)
concurrentRestrictions in Global += Tags.limit(Tags.ForkedTestGroup, 1)
