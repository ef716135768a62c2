// Quickstart example: compiles against the PUBLISHED library artifact
// (run `sbt publishLocal` in the repo root first), not the repo's
// source tree — this is the build a downstream user writes.
scalaVersion := "2.13.17"
name := "graft-quickstart"

libraryDependencies += "etlshdesignspark" %% "etlshdesignspark" % "0.1.0"

// Spark jars ship with the image (zero-egress environment); a normal
// deployment would use `"org.apache.spark" %% "spark-sql" % "4.x" % Provided`.
unmanagedBase := file("/opt/spark/jars")

run / fork := true
javaOptions ++= Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
