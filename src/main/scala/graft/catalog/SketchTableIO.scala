package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}

/**
 * Iceberg-layout snapshot seam for sketch tables (SURVEY.md §7.2: no
 * Iceberg jar ships in this environment, so the table format is
 * reduced to its load-bearing core and kept swappable):
 *
 *   root/data/v<N>/part-*.parquet   immutable data files
 *   root/manifests/v<N>.json        commit metadata: version, parent,
 *                                   files, row count, metrics, ts
 *
 * Commit protocol = write data files first, then publish the manifest
 * with an atomic rename — a crash mid-commit leaves orphan data files
 * but never a readable half-commit (same guarantee Iceberg's metadata
 * pointer swap gives). Readers resolve a manifest (latest or any past
 * version — time travel) and read exactly its file list, so concurrent
 * readers always see a consistent snapshot. Swapping in real Iceberg
 * replaces this one class.
 */
class SketchTableIO(val spark: SparkSession, val root: String) {

  private def manifestDir = Paths.get(root, "manifests")
  private def dataDir(v: Long) = Paths.get(root, "data", s"v$v")
  private def manifestPath(v: Long) = manifestDir.resolve(s"v$v.json")

  Files.createDirectories(manifestDir)

  def versions: Seq[Long] = {
    val it = Files.list(manifestDir).iterator()
    val vs = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (it.hasNext) {
      val n = it.next().getFileName.toString
      if (n.startsWith("v") && n.endsWith(".json"))
        vs += n.stripPrefix("v").stripSuffix(".json").toLong
    }
    vs.toSeq.sorted
  }

  def currentVersion: Long = versions.lastOption.getOrElse(0L)

  /** Commit a new snapshot; returns its version. */
  def commit(df: DataFrame, metrics: Map[String, Long] = Map.empty): Long = {
    val v = currentVersion + 1
    df.write.mode("errorifexists").parquet(dataDir(v).toString)
    val files = Files.list(dataDir(v)).iterator()
    val fileList = scala.collection.mutable.ArrayBuffer.empty[String]
    while (files.hasNext) {
      val p = files.next()
      if (p.getFileName.toString.endsWith(".parquet")) fileList += p.toString
    }
    val rows = spark.read.parquet(fileList.toSeq: _*).count()
    val metricsJson = metrics.map { case (k, x) => s""""$k":$x""" }.mkString(",")
    val json =
      s"""{"version":$v,"parent":${v - 1},"rows":$rows,"ts":${System.currentTimeMillis()},""" +
        s""""metrics":{$metricsJson},""" +
        s""""files":[${fileList.sorted.map(f => "\"" + f + "\"").mkString(",")}]}"""
    // publish atomically: manifest appears complete or not at all
    val tmp = manifestDir.resolve(s".v$v.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, manifestPath(v), StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** Read a snapshot (default: latest). Reads exactly the manifest's files. */
  def read(version: Long = -1): DataFrame = {
    val v = if (version == -1) currentVersion else version
    require(Files.exists(manifestPath(v)), s"no snapshot v$v")
    val json = Files.readString(manifestPath(v))
    val files = "\"files\":\\[([^\\]]*)\\]".r.findFirstMatchIn(json).get.group(1)
      .split(",").filter(_.nonEmpty).map(_.stripPrefix("\"").stripSuffix("\""))
    spark.read.parquet(files.toIndexedSeq: _*)
  }

  def manifest(version: Long): String = Files.readString(manifestPath(version))
}
