package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Fixtures

/** The write-once stamped-fixture protocol (queries/Fixtures.scala) that the
  * spans and frontier-log oracle fixtures share. Pure JVM — no Spark.
  */
class FixturesSpec extends AnyFunSuite {

  private def tmpRoot(): File = {
    val d = Files.createTempDirectory("graft-fixtures-spec").toFile
    d.deleteOnExit(); d
  }

  private def readFile(f: File): String =
    new String(Files.readAllBytes(f.toPath))

  test("builds once, then validates by stamp without rebuilding") {
    val root = tmpRoot()
    val target = new File(root, "fix")
    var builds = 0
    Fixtures.ensure(target.toString, "v1") { tmp =>
      tmp.mkdirs(); builds += 1
      Files.write(new File(tmp, "data.txt").toPath, "alpha".getBytes)
    }
    assert(builds == 1)
    assert(readFile(new File(target, "data.txt")) == "alpha")
    assert(Fixtures.stampOk(target, "v1"))
    // second ensure with the same stamp must be a pure read
    Fixtures.ensure(target.toString, "v1") { _ => builds += 1 }
    assert(builds == 1)
  }

  test("stale stamp forces a rebuild that replaces the old tree") {
    val root = tmpRoot()
    val target = new File(root, "fix")
    Fixtures.ensure(target.toString, "v1") { tmp =>
      tmp.mkdirs()
      Files.write(new File(tmp, "data.txt").toPath, "old".getBytes)
    }
    Fixtures.ensure(target.toString, "v2") { tmp =>
      tmp.mkdirs()
      Files.write(new File(tmp, "data.txt").toPath, "new".getBytes)
    }
    assert(readFile(new File(target, "data.txt")) == "new")
    assert(Fixtures.stampOk(target, "v2"))
    assert(!Fixtures.stampOk(target, "v1"))
    // the swap must leave neither tmp assemblies nor moved-aside old trees
    val debris = root.listFiles().map(_.getName).filter(_ != "fix")
    assert(debris.isEmpty, s"swap debris left: ${debris.mkString(",")}")
  }

  test("unstamped debris at the target path is replaced, not trusted") {
    val root = tmpRoot()
    val target = new File(root, "fix")
    target.mkdirs() // a crashed writer's partial tree: no stamp
    Files.write(new File(target, "junk.txt").toPath, "partial".getBytes)
    Fixtures.ensure(target.toString, "v1") { tmp =>
      tmp.mkdirs()
      Files.write(new File(tmp, "data.txt").toPath, "good".getBytes)
    }
    assert(Fixtures.stampOk(target, "v1"))
    assert(!new File(target, "junk.txt").exists())
    assert(readFile(new File(target, "data.txt")) == "good")
  }

  test("a build that throws leaves no tmp debris behind") {
    val root = tmpRoot()
    val target = new File(root, "fix")
    intercept[RuntimeException] {
      Fixtures.ensure(target.toString, "v1") { tmp =>
        tmp.mkdirs()
        Files.write(new File(tmp, "half.txt").toPath, "partial".getBytes)
        sys.error("generator crashed")
      }
    }
    assert(root.listFiles().isEmpty, "failed assembly leaked files")
    // a later successful ensure still works
    Fixtures.ensure(target.toString, "v1") { tmp =>
      tmp.mkdirs()
      Files.write(new File(tmp, "data.txt").toPath, "ok".getBytes)
    }
    assert(Fixtures.stampOk(target, "v1"))
  }

  test("losing the rename race keeps the winner's tree and drops the tmp") {
    val root = tmpRoot()
    val target = new File(root, "fix")
    // simulate the race: while this JVM is inside build(), the "winner"
    // renames a complete stamped fixture into place
    Fixtures.ensure(target.toString, "v1") { tmp =>
      tmp.mkdirs()
      Files.write(new File(tmp, "data.txt").toPath, "loser".getBytes)
      target.mkdirs()
      Files.write(new File(target, "data.txt").toPath, "winner".getBytes)
      Files.write(new File(target, "_GRAFT_STAMP").toPath, "v1".getBytes)
    }
    // the loser must keep the winner's (complete, stamped) tree
    assert(readFile(new File(target, "data.txt")) == "winner")
    // and its own tmp assembly must be gone
    val leftovers = root.listFiles().map(_.getName).filter(_ != "fix")
    assert(leftovers.isEmpty, s"tmp debris left: ${leftovers.mkString(",")}")
  }
}
