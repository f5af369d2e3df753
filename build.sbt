ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "aoseventstreamerspark"
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
// Pass the forked run's stdout through RAW (no "[info] " prefix): the
// driver parses graft.Bench's one-line JSON from the process output, and
// sbt's default LoggedOutput decorates every line, breaking json.loads.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[32] runs 32 concurrent tasks in ONE JVM, and the dedup/vector
  // queries cache signature tables: 8g GC-thrashed exactly the heavy
  // queries (the round-3 driver bench showed small queries flat but
  // cache-heavy ones 3-8x slower than isolated runs). The box has
  // 128 GiB; give the forked run a real share of it.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Commit the heap up front: without -Xms the JVM starts ~2g and grows
  // toward Xmx through GC-driven expansion, which taxes whichever
  // queries run first (bench q02-q09 measured 4-6x their isolated-warm
  // times purely from heap-growth churn).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Bounded GC log for post-hoc diagnosis of driver-run regressions
  // (distinguishes JVM pauses from host CPU-steal stalls: a 20s wall
  // spike with <1s of logged pause time is the host, not us).
  "-Xlog:gc*:file=/tmp/gc.log:time,uptime:filecount=1,filesize=50m",
)
