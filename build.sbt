ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "joinexamplespark"
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
// The forked run's stdout must reach the console VERBATIM: sbt's default
// logger prefixes every forked-output line with "[info] ", which broke the
// driver's last-line JSON parse of Bench's compact summary (BENCH_r11.json
// "parsed": null). StdoutOutput pipes the child's stdout straight through.
run / outputStrategy := Some(StdoutOutput)
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
  // the block scorers' SIMD prefilter kernel (functions/SimdDot.java);
  // a JVM without the module falls back to the scalar kernel at runtime
  // (BlockVec's availability probe), so this flag is an optimization,
  // not a requirement
  "--add-modules=jdk.incubator.vector",
)
// SimdDot.java imports jdk.incubator.vector (NOT in ct.sym, so no
// --release here); JavaThenScala lets scalac read its .class signature
// instead of parsing vector-typed internals from source
javacOptions ++= Seq("--add-modules", "jdk.incubator.vector",
  "-encoding", "UTF-8")
compileOrder := CompileOrder.JavaThenScala
// forked javac (in-process javax.tools inside sbt's module-less JVM
// trips an IllegalAccessError on the incubator classes)
javaHome := Some(file(sys.props("java.home")))
