ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "djangocalaccessrawdataspark"
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
// The bench/verify contract is a bare JSON line on stdout. sbt's default
// LoggedOutput prefixes every forked-process line with "[info] ", which is
// why the driver recorded `parsed: null` for the bench in every round
// through r20. StdoutOutput passes the forked JVM's stdout through
// verbatim (stderr likewise stays on stderr).
outputStrategy := Some(StdoutOutput)
// ...and the "[success] Total time..." epilogue otherwise lands AFTER the
// contract line, polluting the driver's bounded tail capture.
Global / showSuccess := false
// consumed by the command engine, not by tasks — silence the unused-key lint
Global / excludeLintKeys += showSuccess
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
// The full suite is 40-60 min sequential in this sandbox — it overflowed
// the driver's verification window in round 20 (tests_ok unobservable:
// the forked JVM was shut down mid-suite). Partition the suites across
// N forked JVMs run CONCURRENTLY: each test JVM is a local[4] session
// and graft scratch state is pid-scoped (GraftSession.scratchDir), so
// JVM isolation is the safe parallelism axis — 21 specs mutate shared
// session confs, which rules out in-JVM parallel suites. N=6 × local[4]
// fits the 32-core box; override with SPARK_GRAFT_TEST_FORKS (set 1 to
// restore the old single-JVM run).
val testForkN = sys.env.getOrElse("SPARK_GRAFT_TEST_FORKS", "6").toInt
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val env = (Test / envVars).value
  tests.sortBy(_.name).zipWithIndex
    .groupBy(_._2 % testForkN).toSeq.sortBy(_._1)
    .map { case (i, group) =>
      Tests.Group(
        name = s"fork$i",
        tests = group.map(_._1),
        runPolicy = Tests.SubProcess(ForkOptions()
          .withRunJVMOptions(opts)
          .withEnvVars(env)))
    }
}
// sbt's default restrictions cap concurrent forked test groups at 1;
// lift just that cap (keep an overall task ceiling)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(testForkN + 2, 4)),
  Tags.limit(Tags.ForkedTestGroup, testForkN))
