package graft.hadoop

import java.io.{File, FileNotFoundException, IOException}
import java.nio.file.{Files, LinkOption, NoSuchFileException}
import java.nio.file.attribute.{PosixFileAttributes, PosixFilePermission}
import java.util.EnumSet

import org.apache.hadoop.fs.{FileStatus, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Exec-free local filesystem (registered as `fs.file.impl` by
  * [[graft.GraftSession]]).
  *
  * Hadoop's stock `RawLocalFileSystem` shells out to a child process
  * when `libhadoop.so` (NativeIO) is absent — which it is in a plain
  * Spark-jars deployment like this one:
  *
  *  - `setPermission` → `Shell.execCommand("chmod", ...)` — and the
  *    `LocalFSFileOutputStream` constructor calls it for EVERY file
  *    created (RawLocalFileSystem.java:517,1179 in hadoop 3.4.2), so a
  *    partitioned parquet write pays one fork+exec per data file,
  *    per `.crc` sidecar, and per directory;
  *  - `getFileStatus`/`listStatus` → the `Stat` helper, which runs the
  *    `stat(1)` binary per path when available.
  *
  * From a JVM holding a multi-GB heap, each fork+exec costs
  * milliseconds to (under memory pressure) hundreds of milliseconds,
  * serialized in the kernel across the 32 executor threads — jstack
  * sampling during the e2e bench showed `ProcessImpl.forkAndExec` as
  * the top runnable frame of the write phase, and identical writes
  * swinging 7s → 100s within one JVM as its resident set grew. None of
  * this exists on a real cluster (HDFS/S3A never shell out), so the
  * forks are pure local-mode measurement distortion — and eliminating
  * them makes local timings reflect the PLANS, which is what the bench
  * is for.
  *
  * Everything here is java.nio.file calls with identical POSIX
  * semantics; the rare cases NIO cannot express (setuid/setgid/sticky
  * bits) fall back to the stock exec path.
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {

  import NioLocalFileSystem._

  /** chmod without the child process. NIO cannot set the three
    * non-permission mode bits; those (never used by Spark/parquet
    * writes) keep the stock behavior. */
  override def setPermission(p: Path, permission: FsPermission): Unit =
    if (permission == null) ()
    else if ((permission.toShort & 0xE00) != 0) // setuid/setgid/sticky
      super.setPermission(p, permission)
    else {
      try Files.setPosixFilePermissions(pathToFile(p).toPath,
        toNio(permission))
      catch {
        case e: NoSuchFileException =>
          throw new FileNotFoundException(e.getMessage)
      }
      ()
    }

  /** mkdir + chmod, both exec-free (the stock version chmods through
    * [[setPermission]] when NativeIO is missing — our override already
    * fixes that — but keep the pair explicit and atomic-ish here). */
  override protected def mkOneDirWithMode(p: Path, p2f: File,
      permission: FsPermission): Boolean = {
    val created = p2f.mkdir()
    if (created && permission != null) setPermission(p, permission)
    created
  }

  /** stat(2) via NIO instead of forking stat(1). Dereferences symlinks
    * exactly like the stock dereferencing status. */
  override def getFileStatus(f: Path): FileStatus = {
    val file = pathToFile(f)
    val attrs =
      try Files.readAttributes(file.toPath, classOf[PosixFileAttributes])
      catch {
        case e: NoSuchFileException =>
          throw new FileNotFoundException(
            s"File $f does not exist: ${e.getMessage}")
      }
    val qualified = f.makeQualified(getUri, getWorkingDirectory)
    new FileStatus(
      attrs.size(), // dirs report the inode size, matching File.length()
      attrs.isDirectory,
      1,
      getDefaultBlockSize(f),
      attrs.lastModifiedTime().toMillis,
      attrs.lastAccessTime().toMillis,
      toFs(attrs.permissions()),
      attrs.owner().getName,
      attrs.group().getName,
      null,
      qualified)
  }

  /** One readdir + one stat per child, no subprocesses. Mirrors the
    * stock contract: FNFE on a missing path, single-element array for
    * a plain file, children otherwise (the `.crc` filtering belongs to
    * the Checksum wrapper above us). */
  override def listStatus(f: Path): Array[FileStatus] = {
    val file = pathToFile(f)
    if (!file.exists())
      throw new FileNotFoundException(s"File $f does not exist")
    if (file.isFile) Array(getFileStatus(f))
    else {
      val names = file.list()
      if (names == null)
        throw new IOException(s"Error accessing directory $f")
      names.sorted.flatMap { n =>
        // 3-arg Path: a ':' in a child name must not parse as a URI
        // scheme; and a child deleted between readdir and stat (temp
        // files of a concurrent writer) is skipped, not fatal — the
        // stock RawLocalFileSystem contract for both.
        try Some(getFileStatus(new Path(f, new Path(null, null, n))))
        catch { case _: FileNotFoundException => None }
      }
    }
  }
}

/** `file://` FileSystem with the stock checksum wrapper over the
  * exec-free raw layer — the drop-in replacement for
  * `org.apache.hadoop.fs.LocalFileSystem`. */
class NioLocalFileSystem
    extends LocalFileSystem(new NioRawLocalFileSystem)

object NioLocalFileSystem {

  private val NioBits: Array[(PosixFilePermission, Int)] = {
    import PosixFilePermission._
    Array(OWNER_READ -> 0x100, OWNER_WRITE -> 0x80, OWNER_EXECUTE -> 0x40,
      GROUP_READ -> 0x20, GROUP_WRITE -> 0x10, GROUP_EXECUTE -> 0x8,
      OTHERS_READ -> 0x4, OTHERS_WRITE -> 0x2, OTHERS_EXECUTE -> 0x1)
  }

  private[graft] def toNio(p: FsPermission)
      : java.util.Set[PosixFilePermission] = {
    val bits = p.toShort & 0x1FF
    val s = EnumSet.noneOf(classOf[PosixFilePermission])
    NioBits.foreach { case (perm, bit) => if ((bits & bit) != 0) s.add(perm) }
    s
  }

  private[graft] def toFs(s: java.util.Set[PosixFilePermission])
      : FsPermission = {
    var bits = 0
    NioBits.foreach { case (perm, bit) => if (s.contains(perm)) bits |= bit }
    new FsPermission(bits.toShort)
  }
}
