package graft.operators

import java.io.File

/** Idempotent once-per-sfDir fixture staging: compute a tmpdir-rooted
  * location from (name, sfDir), run `write` exactly once — guarded by an
  * underscore marker file, which Spark's file sources ignore — and return
  * the directory. One home for the stage-once idiom so a fix to it (e.g.
  * the crash-between-write-and-marker window) lands everywhere at once.
  * A partially-staged dir (no marker) is re-staged from scratch; writers
  * use overwrite semantics so that is safe.
  */
private[operators] object Staging {
  def stagedDir(name: String, sfDir: String)(write: File => Unit): File =
    synchronized {
      val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      val dir = new File(sys.props("java.io.tmpdir"), s"${name}_$tag")
      val done = new File(dir, "_staged")
      if (!done.exists()) {
        dir.mkdirs()
        write(dir)
        done.createNewFile()
      }
      dir
    }
}
