package graft.ckpt

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-style snapshot layer (SURVEY.md §7.2 constraint C1: no Iceberg
  * runtime jar ships in this sandbox, so the snapshot/manifest mechanics are
  * implemented directly — Parquet data files + JSON manifests committed by
  * atomic rename; a real Iceberg catalog can slot in behind the same trait).
  *
  * Layout:
  * {{{
  *   root/manifest/v<N>.json     // immutable snapshot manifest
  *   root/manifest/LATEST        // current version number (atomic rename)
  *   root/data/<table>/v<N>/     // parquet written by snapshot N
  * }}}
  *
  * Commit protocol (all-or-nothing, resume-exact — SURVEY §7.5):
  *  1. write each table's parquet under data/<table>/v<N>/
  *  2. write manifest to a temp file, fsync, rename to v<N>.json
  *  3. rename LATEST.tmp → LATEST pointing at N
  * A crash before (3) leaves LATEST at the previous snapshot; orphan data
  * dirs are ignored because readers only follow manifest-referenced paths.
  */
final class SnapshotStore(rootDir: String, spark: SparkSession) {
  private val mapper = new ObjectMapper
  private val root = Paths.get(rootDir)
  private val manifestDir = root.resolve("manifest")
  Files.createDirectories(manifestDir)

  final case class Manifest(
      version: Long,
      parent: Long,
      epoch: Long,
      tables: Map[String, Seq[String]],
      counters: Map[String, Long])

  def latestVersion(): Option[Long] = {
    val f = manifestDir.resolve("LATEST")
    if (Files.exists(f)) Some(Files.readString(f).trim.toLong) else None
  }

  def latest(): Option[Manifest] = latestVersion().map(readManifest)

  def readManifest(v: Long): Manifest = {
    val node = mapper.readTree(Files.readString(manifestDir.resolve(s"v$v.json")))
    val tables = node.get("tables").properties().asScala.map { e =>
      e.getKey -> e.getValue.elements().asScala.map(_.asText()).toSeq
    }.toMap
    val counters = node.get("counters").properties().asScala.map { e =>
      e.getKey -> e.getValue.asLong()
    }.toMap
    Manifest(node.get("version").asLong(), node.get("parent").asLong(),
      node.get("epoch").asLong(), tables, counters)
  }

  def readTable(m: Manifest, table: String): Option[DataFrame] =
    m.tables.get(table).filter(_.nonEmpty).map(ps => spark.read.parquet(ps: _*))

  /** Commit a new snapshot. `replace` tables point only at this commit's
    * files; `append` tables carry the parent's file list forward plus the
    * new files (fetch_log / metrics lineage accumulate this way without
    * rewriting history). Tables named in `partitionedBy` are written with
    * hive-style partition dirs so predicates on the partition column prune
    * whole directories at read time (e.g. frontier by `state`: the
    * scheduler's state='pending' scan never touches fetched/failed files).
    */
  def commit(epoch: Long, replace: Map[String, DataFrame],
      append: Map[String, DataFrame], counters: Map[String, Long],
      partitionedBy: Map[String, String] = Map.empty): Manifest = {
    val parent = latest()
    val v = parent.map(_.version + 1).getOrElse(0L)

    def write(table: String, df: DataFrame): String = {
      val dir = root.resolve("data").resolve(table).resolve(s"v$v").toString
      val w = df.write.mode("overwrite")
      partitionedBy.get(table).fold(w)(c => w.partitionBy(c)).parquet(dir)
      dir
    }

    val replaced = replace.map { case (t, df) => t -> Seq(write(t, df)) }
    val appended = append.map { case (t, df) =>
      val prev = parent.flatMap(_.tables.get(t)).getOrElse(Seq.empty)
      t -> (prev :+ write(t, df))
    }
    val m = Manifest(v, parent.map(_.version).getOrElse(-1L), epoch,
      replaced ++ appended, counters)

    val node: ObjectNode = mapper.createObjectNode()
    node.put("version", m.version)
    node.put("parent", m.parent)
    node.put("epoch", m.epoch)
    val tn = node.putObject("tables")
    m.tables.foreach { case (t, ps) =>
      val a = tn.putArray(t); ps.foreach(a.add)
    }
    val cn = node.putObject("counters")
    m.counters.foreach { case (k, x) => cn.put(k, x) }

    atomicWrite(manifestDir.resolve(s"v$v.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node))
    atomicWrite(manifestDir.resolve("LATEST"), v.toString)
    m
  }

  private def atomicWrite(target: Path, content: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
