package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Staging

/** Lifecycle contract of the stage-once fixture cache: a spec bump stages
  * into a FRESH generation dir, and the reaper removes the superseded
  * sibling (plus its lock) so fixture regeneration cannot accumulate disk
  * for the life of a dev box — while anything NOT fingerprint-shaped under
  * the same root is out of the reaper's namespace and must survive.
  */
class StagingSpec extends AnyFunSuite {

  private def newSourceDir(): File = {
    val d = Files.createTempDirectory("graft_staging_src").toFile
    Files.writeString(new File(d, "data.parquet").toPath, "payload")
    d.deleteOnExit()
    d
  }

  private def root(name: String, src: File): File =
    new File(sys.props("java.io.tmpdir"),
      s"${name}_${src.getAbsolutePath.replaceAll("[^A-Za-z0-9.]", "_")}")

  test("spec bump stages a new generation and reaps the stale one") {
    val src = newSourceDir()
    val name = "graft_reaptest"
    val genA = Staging.stagedDir(name, src.getAbsolutePath, "specA") { d =>
      Files.writeString(new File(d, "part-0").toPath, "A")
    }
    assert(new File(genA, "_staged").exists(), "generation A staged")
    // an unrelated, non-fingerprint-named sibling: outside the reaper's
    // namespace, must never be touched
    val foreign = new File(root(name, src), "not-a-fingerprint")
    foreign.mkdirs()

    val genB = Staging.stagedDir(name, src.getAbsolutePath, "specB") { d =>
      Files.writeString(new File(d, "part-0").toPath, "B")
    }
    assert(genB.getName != genA.getName, "spec bump changes the fingerprint")
    assert(new File(genB, "_staged").exists(), "generation B staged")
    assert(!genA.exists(), "stale generation A reaped after B staged")
    assert(!new File(root(name, src), genA.getName + ".lock").exists(),
      "stale generation A's lock file reaped too")
    assert(foreign.exists(), "non-fingerprint sibling untouched by reaper")
  }

  test("re-staging under an unchanged spec reuses the generation") {
    val src = newSourceDir()
    var stages = 0
    def stage() = Staging.stagedDir("graft_reusetest",
      src.getAbsolutePath, "spec") { d =>
      stages += 1
      Files.writeString(new File(d, "part-0").toPath, "X")
    }
    val first = stage()
    val second = stage()
    assert(first == second && stages == 1,
      "unchanged fingerprint must be served from the staged cache")
  }
}
