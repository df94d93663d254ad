package graft.tools

import java.nio.charset.StandardCharsets

/** Measures the ONE O(committed-windows) term in the versioned manifest
  * protocol (VERDICT r18 #3): every commit re-reads (decode) and
  * re-writes (encode + conditional PUT) the whole `manifest-<v>.json`,
  * and GC re-decodes `keepVersions` manifests per call — so commit
  * latency grows with the number of committed windows even though the
  * DATA side stays O(delta). This probe prices a commit at 1k / 10k /
  * 100k pre-seeded window entries, splitting decode / encode / PUT, so
  * SCALING can state the measured ceiling and the crossover where the
  * Iceberg-style sharded manifest list becomes necessary.
  *
  * The payload replicates [[graft.streaming.VersionedManifestMaintainer]]'s
  * wire format exactly (JSON object, windows array of
  * {w, batch, model(64-hex), writer, gen}, trailing SHA-256 line); the
  * PUT replicates its staged-write → force → create-exclusive hard link
  * → dirent fsync. No Spark involved — this is pure driver-side work.
  *
  *   sbt "Test/runMain graft.tools.ManifestCeilingProbe [reps]"
  */
object ManifestCeilingProbe {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def encode(version: Long, windows: Int): Array[Byte] = {
    val node = mapper.createObjectNode()
    node.put("version", version)
    node.put("model", "a" * 64)
    node.putArray("history")
    val w = node.putArray("windows")
    (0 until windows).foreach { i =>
      val o = w.addObject()
      o.put("w", i.toLong); o.put("batch", i.toLong)
      o.put("model", "a" * 64); o.put("writer", "writer-0")
      o.put("gen", s"wgen-$i-b$i")
    }
    node.putArray("retractions")
    val payload = mapper.writeValueAsString(node)
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    s"$payload\n$digest\n".getBytes(StandardCharsets.UTF_8)
  }

  private def decode(bytes: Array[Byte]): Int = {
    val s = new String(bytes, StandardCharsets.UTF_8)
    val nl = s.lastIndexOf('\n', s.length - 2)
    val payload = s.substring(0, nl)
    val digest = s.substring(nl + 1).trim
    val want = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    require(digest == want, "torn")
    mapper.readTree(payload).get("windows").size()
  }

  private def put(root: java.io.File, version: Long,
      payload: Array[Byte]): Unit = {
    val staging = new java.io.File(root,
      s".staging-${java.util.UUID.randomUUID()}.json")
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
    graft.util.Fs.fsyncDir(root)
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(20)
    println("windows,bytes,decode_ms,encode_ms,put_ms,commit_ms")
    Seq(1000, 10000, 100000).foreach { n =>
      val work = java.nio.file.Files.createTempDirectory("graft-mceil")
      try {
        val root = work.toFile
        // pre-seed the newest manifest at n windows
        put(root, 1L, encode(1L, n))
        val bytes = java.nio.file.Files.readAllBytes(
          new java.io.File(root, f"manifest-${1L}%012d.json").toPath)
        var decodeNs = 0L; var encodeNs = 0L; var putNs = 0L
        (0 until reps).foreach { r =>
          val t0 = System.nanoTime()
          val got = decode(bytes)
          val t1 = System.nanoTime()
          require(got == n)
          val payload = encode(2L + r, n + 1) // the commit adds one window
          val t2 = System.nanoTime()
          put(root, 2L + r, payload)
          val t3 = System.nanoTime()
          decodeNs += t1 - t0; encodeNs += t2 - t1; putNs += t3 - t2
        }
        def ms(x: Long): Double = math.rint(x / reps / 1e3) / 1e3
        val commit = ms(decodeNs + encodeNs + putNs)
        println(s"$n,${bytes.length},${ms(decodeNs)},${ms(encodeNs)}," +
          s"${ms(putNs)},$commit")
      } finally graft.util.Fs.rmTree(work.toFile)
    }
  }
}
