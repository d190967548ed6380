package graft.queries

import java.io.File

/** Write-once stamped oracle fixtures (shared by the spans and frontier-log
  * fixtures — one copy of the concurrency-sensitive machinery).
  *
  * A fixture is deterministic in its parameters, so a present marker stamped
  * with those parameters means the tree on disk is already byte-equivalent
  * to what a rewrite would produce; skipping the rewrite keeps fixture-
  * backed queries pure reads (no hidden parquet write in the bench timing).
  * Rebuilds assemble in a session-unique sibling directory — stamp included
  * — and ARRIVE by a single atomic rename, so no reader ever sees a partial
  * or mixed-writer tree: two fresh JVMs racing to populate each build their
  * own tmp, one rename wins, the loser discards its tmp and re-validates the
  * winner's stamp (content is deterministic, so any winner is correct).
  * Callers must bump a version token inside `stamp` whenever the generator
  * changes, or stale fixtures from older generators would keep validating.
  */
object Fixtures {

  def stampOk(dir: File, stamp: String): Boolean = {
    val m = new File(dir, "_GRAFT_STAMP")
    // isFile→read has a TOCTOU window: a racing JVM's move-aside rename can
    // remove the stamp between the check and the read. A vanished stamp is
    // just "stale — rebuild/re-validate", never a crash.
    try m.isFile &&
      new String(java.nio.file.Files.readAllBytes(m.toPath)) == stamp
    catch { case _: java.io.IOException => false }
  }

  /** Ensure `targetPath` holds a stamped fixture, building via `build`
    * (which receives the tmp assembly dir) when absent or stale. Callers
    * keep their own once-per-JVM fast-path flag; this method is the slow
    * path and is safe to race across JVMs.
    */
  def ensure(targetPath: String, stamp: String)(build: File => Unit): Unit = {
    val target = new File(targetPath)
    if (stampOk(target, stamp)) return
    val tmp = new File(target.getParentFile,
      s"${target.getName}.tmp.${java.util.UUID.randomUUID()}")
    try {
      build(tmp)
      java.nio.file.Files.write(
        new File(tmp, "_GRAFT_STAMP").toPath, stamp.getBytes)
      // re-check right before the swap: another JVM may have renamed a
      // complete fixture into place while this one was building
      if (!stampOk(target, stamp)) {
        // a stale/partial tree is moved ASIDE by rename, not deleted in
        // place: deleteRecursively-then-rename would expose a long
        // partially-deleted window, and could destroy a tree a racing
        // builder just committed after our re-check. The move-aside keeps
        // every committed tree intact (POSIX readers with open handles
        // follow the rename) and shrinks the target-absent window to the
        // gap between two renames of a complete tree.
        val aside = new File(target.getParentFile,
          s"${target.getName}.old.${java.util.UUID.randomUUID()}")
        if (target.exists() && !target.renameTo(aside)) {
          // another JVM moved/replaced it concurrently; fall through — the
          // stamp check below decides who won
          ()
        }
        if (!tmp.renameTo(target)) {
          // lost the rename race — the winner's tree is complete (its stamp
          // was written before its rename), keep it
          require(stampOk(target, stamp),
            s"fixture rename failed and $target has no valid stamp")
        }
        if (aside.exists()) {
          new scala.reflect.io.Directory(aside).deleteRecursively()
        }
      }
    } finally {
      // also reached when build() throws — a failed assembly must not
      // leak one UUID-named tmp tree per crash
      if (tmp.exists()) new scala.reflect.io.Directory(tmp).deleteRecursively()
    }
  }
}
