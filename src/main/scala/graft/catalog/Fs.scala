package graft.catalog

import java.nio.file.{Files, Path}

/** Shared local-filesystem helpers for the catalog layer. */
private[catalog] object Fs {

  /** Recursive delete, closing the walk stream (Files.walk holds directory
    * descriptors until closed).
    */
  def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }
  }
}
