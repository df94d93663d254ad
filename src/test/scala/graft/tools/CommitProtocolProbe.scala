package graft.tools

/** Microbench for the r14 content-atomic manifest publish (VERDICT r14
  * #6): the staged-write→force→hard-link→unlink protocol versus the
  * pre-r14 CREATE_NEW direct write+force it replaced. The r14 claim was
  * "nothing measurable" — this turns the claim into a number for
  * SCALING §25.
  *
  * Measures ONLY the file-op protocol (no Spark, no store logic): N
  * commits of a manifest-sized payload into sequential version slots,
  * fresh directory per variant, wall time per protocol. Run:
  *
  *   sbt "Test/runMain graft.tools.CommitProtocolProbe [N] [payloadBytes] [reps]"
  */
object CommitProtocolProbe {

  private def fsyncDir(d: java.io.File): Unit =
    graft.util.Fs.fsyncDir(d)

  /** r14 protocol: bytes staged+forced OUTSIDE the listing namespace,
    * slot claimed by atomic create-exclusive hard link, staging unlinked,
    * dirent table forced.
    */
  private def stagedLinkCommit(root: java.io.File, version: Long,
      payload: Array[Byte]): Unit = {
    val staging = new java.io.File(root,
      s".staging-${java.util.UUID.randomUUID().toString}.json")
    val ch = java.nio.channels.FileChannel.open(staging.toPath,
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val buf = java.nio.ByteBuffer.wrap(payload)
      while (buf.hasRemaining) ch.write(buf)
      ch.force(true)
    } finally ch.close()
    val f = new java.io.File(root, f"manifest-$version%012d.json")
    java.nio.file.Files.createLink(f.toPath, staging.toPath)
    staging.delete()
    fsyncDir(root)
  }

  /** pre-r14 protocol: claim the slot with CREATE_NEW, write+force into
    * it (the torn-visible window the r14 fix closed).
    */
  private def directCommit(root: java.io.File, version: Long,
      payload: Array[Byte]): Unit = {
    val f = new java.io.File(root, f"manifest-$version%012d.json")
    val ch = java.nio.channels.FileChannel.open(f.toPath,
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val buf = java.nio.ByteBuffer.wrap(payload)
      while (buf.hasRemaining) ch.write(buf)
      ch.force(true)
    } finally ch.close()
    fsyncDir(root)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100)
    val size = args.lift(1).map(_.toInt).getOrElse(4096)
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val payload = Array.tabulate[Byte](size)(i => (i % 251).toByte)
    def runOnce(label: String,
        commit: (java.io.File, Long, Array[Byte]) => Unit): Double = {
      val root = java.nio.file.Files
        .createTempDirectory("graft-commitprobe").toFile
      try {
        val t0 = System.nanoTime()
        (1L to n.toLong).foreach(v => commit(root, v, payload))
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"$label%-12s $n commits: $ms%9.1f ms  (${ms / n}%6.3f ms/commit)")
        ms
      } finally graft.util.Fs.rmTree(root)
    }
    // alternate variants rep by rep so machine drift hits both equally
    val staged = scala.collection.mutable.Buffer[Double]()
    val direct = scala.collection.mutable.Buffer[Double]()
    (1 to reps).foreach { _ =>
      staged += runOnce("staged+link", stagedLinkCommit)
      direct += runOnce("direct", directCommit)
    }
    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"median staged+link: ${median(staged.toSeq)}%9.1f ms / $n")
    println(f"median direct:      ${median(direct.toSeq)}%9.1f ms / $n")
    println(f"overhead: ${(median(staged.toSeq) / median(direct.toSeq) - 1) * 100}%5.1f %%")
  }
}
