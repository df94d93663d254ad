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

  /** One warning per JVM when the filesystem rejects directory fsync. */
  private val fsyncDirUnsupported =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  /** One warning per JVM when a file can't be opened writable for fsync. */
  private val fsyncFileReadOnly =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  /** fsync a file's bytes (data durability, not just journaled metadata).
    * Opened READ+WRITE so `force` is specified to flush the file's data on
    * every JVM, not just Linux — the JavaDoc only guarantees `force` for
    * writes made *through the forcing channel*, and a READ-only handle's
    * behavior for other writers' bytes is unspecified (ADVICE r10).
    * On a read-only file or permission-restricted FS the WRITE *open*
    * throws where the pre-r11 READ-open force used to succeed; ONLY that
    * open failure triggers the READ-open fallback (one-shot loud warning,
    * same pattern as `fsyncDir`). A `force` failure — on either channel —
    * is a REAL durability failure (an EIO here is the kernel reporting
    * the writeback error ONCE; a retry on a fresh handle would observe
    * the already-cleared state, the fsyncgate pattern) and must propagate
    * so the commit that depends on this file being durable fails instead
    * of publishing a reference to non-durable data (ADVICE r12). Fallback
    * failures are logged EVERY time, not just the first.
    */
  def fsyncFile(f: java.io.File): Unit = {
    val writableOpen =
      try Right(java.nio.channels.FileChannel.open(f.toPath,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.READ))
      catch { case e: java.io.IOException => Left(e) }
    writableOpen match {
      case Right(ch) =>
        // force() failures propagate: the open succeeded, so an error here
        // is the filesystem refusing durability, not a permissions quirk.
        try ch.force(true) finally ch.close()
      case Left(openErr) =>
        if (fsyncFileReadOnly.compareAndSet(false, true))
          org.slf4j.LoggerFactory.getLogger(Fs.getClass).warn(
            s"writable open for fsync unavailable ($f: " +
              s"${openErr.getMessage}) — falling back to READ-open force; " +
              "data durability of other writers' bytes is unspecified on " +
              "this JVM/filesystem", openErr)
        try {
          val ch = java.nio.channels.FileChannel.open(f.toPath,
            java.nio.file.StandardOpenOption.READ)
          try ch.force(true) finally ch.close()
        } catch {
          case e: java.io.IOException =>
            org.slf4j.LoggerFactory.getLogger(Fs.getClass).warn(
              s"READ-open fsync fallback failed for $f — propagating; the " +
                "pending commit must not publish against non-durable data", e)
            throw e
        }
    }
  }

  /** fsync a directory entry table (persists renames/creates/unlinks in
    * it); skipped where the FS rejects directory handles — but LOUDLY,
    * once: commit protocols whose crash-ordering argument rests on
    * "record durable before visible" degrade to best-effort on such
    * filesystems, and operators deserve a signal rather than silently
    * weakened guarantees (ADVICE r7).
    */
  def fsyncDir(d: java.io.File): Unit =
    try {
      val ch = java.nio.channels.FileChannel.open(d.toPath,
        java.nio.file.StandardOpenOption.READ)
      try ch.force(true) finally ch.close()
    } catch {
      case e: java.io.IOException =>
        if (fsyncDirUnsupported.compareAndSet(false, true))
          org.slf4j.LoggerFactory.getLogger(Fs.getClass).warn(
            s"directory fsync unavailable on this filesystem ($d: " +
              s"${e.getMessage}) — crash-ordering guarantees that rest on " +
              "directory-entry durability are best-effort here", e)
    }

  /** fsync every regular file and directory under `root` (bottom-up), so
    * a commit record published AFTER this call can never reference torn
    * data on a power cut — the data-before-manifest ordering the
    * object-store commit protocol needs on a local filesystem
    * (ADVICE r10). Cost is one fdatasync per file; commit-sized
    * generation dirs make that cheap relative to the write itself.
    */
  def fsyncTree(root: java.io.File): Unit =
    if (root.isDirectory) {
      Option(root.listFiles()).foreach(_.foreach(fsyncTree))
      fsyncDir(root)
    } else if (root.isFile) fsyncFile(root)
}
