package graft.operators

/** Local-filesystem helpers shared by the storage layer, the catalog
  * and the query/test scaffolding (one definition of recursive delete
  * instead of a copy per call site).
  */
object Fs {

  /** Recursively delete `f` (no-op if absent). Does not follow
    * symlinks into their targets — `listFiles` of a symlinked dir is
    * only walked if the link resolves, and the link itself is what is
    * deleted.
    */
  def deleteTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteTree))
    f.delete()
    ()
  }

  def deleteTree(p: java.nio.file.Path): Unit = deleteTree(p.toFile)

  def deleteTree(path: String): Unit = deleteTree(new java.io.File(path))
}
