package graft.util

/** Local-filesystem tree helpers shared by the store/index publish
  * protocols and the bench/gate temp-dir hygiene — one definition, so a
  * future behavioral fix (symlink safety, retry semantics) lands once
  * (review r10: six private copies had accumulated).
  */
object Fs {

  /** Recursive delete; tolerates a missing path. */
  def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete()
  }

  /** Recursive copy (dirs created as needed; files must not pre-exist). */
  def copyTree(src: java.io.File, dst: java.io.File): Unit =
    if (src.isDirectory) {
      dst.mkdirs()
      Option(src.listFiles()).foreach(_.foreach(c =>
        copyTree(c, new java.io.File(dst, c.getName))))
    } else {
      java.nio.file.Files.copy(src.toPath, dst.toPath)
      ()
    }
}
