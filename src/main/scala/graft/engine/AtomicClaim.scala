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
  * wins; the winner then unlinks its tmp name. */
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
      }
    } else fs.rename(tmp, dst)
}
