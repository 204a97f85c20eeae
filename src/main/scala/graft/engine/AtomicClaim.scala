package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}

/** Atomically claim `dst` with `tmp`'s content: succeeds IFF `dst` did
  * not exist, exactly once under any interleaving.
  *
  * On HDFS-like filesystems a plain rename already refuses an existing
  * destination (returns false), which is what every commit protocol
  * here relies on. On the LOCAL filesystem, however, Hadoop's rename
  * bottoms out in POSIX rename(2), which silently REPLACES an existing
  * destination — two racing commits could BOTH report success and the
  * later rename would clobber the earlier manifest (caught by
  * ConcurrentCommitSpec under repetition: two appenders returning the
  * same version). For `file://` the claim is therefore a hard LINK:
  * link(2) fails EEXIST atomically in the kernel, so exactly one racer
  * wins; the winner then unlinks its tmp name.
  *
  * Filesystems that mount as `file://` but lack hard links (overlayfs
  * layers, some network mounts) surface as FileSystemException /
  * UnsupportedOperationException from link(2) — NOT a lost race. Those
  * degrade to an exclusive-create copy: O_EXCL create of `dst` is also
  * a kernel-atomic claim (exactly one creator wins), and the manifest
  * is small, so the copy costs what the original write did. Only the
  * winner copies; a lost create race still returns false. */
object AtomicClaim {
  def claim(fs: FileSystem, tmp: Path, dst: Path): Boolean =
    if (fs.getScheme == "file") {
      val t = java.nio.file.Paths.get(tmp.toUri.getPath)
      val d = java.nio.file.Paths.get(dst.toUri.getPath)
      try {
        java.nio.file.Files.createLink(d, t)
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException => claimByCreate(t, d, fs, tmp)
        case _: java.nio.file.FileSystemException
          if !java.nio.file.Files.exists(d) => claimByCreate(t, d, fs, tmp)
      }
    } else fs.rename(tmp, dst)

  /** Exclusive-create fallback claim for link-less filesystems:
    * CREATE_NEW is atomic (exactly one racer creates `dst`), then the
    * winner copies the tmp content in. Caveat vs the link path: a
    * reader opening `dst` between create and close can see a partial
    * file — the degraded mode trades the link's full atomicity for
    * still-correct mutual exclusion (no commit is ever LOST; a racing
    * read can transiently fail and retry). */
  private def claimByCreate(t: java.nio.file.Path, d: java.nio.file.Path,
                            fs: FileSystem, tmp: Path): Boolean =
    try {
      val out = java.nio.file.Files.newOutputStream(d,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      try java.nio.file.Files.copy(t, out) finally out.close()
      fs.delete(tmp, false)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }
}
