package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import scala.util.Using

/** Storage seam for the commit protocol — the small set of METADATA
  * primitives the single-writer lock (`Incremental.acquire`) and the
  * manifest-commit protocol (`Snapshots`) need from the storage layer.
  *
  * Data reads/writes already go through Spark's Hadoop IO stack and are
  * storage-agnostic; only the commit-control files (lock sidecar,
  * `_current` pointer, snapshot-dir listing/vacuum) were bound to
  * `java.nio` before this seam existed. The reference leans on DuckDB's
  * single-file lock (`dbt_project/profiles.yml:5-7`) — one process, one
  * file, transactional by construction; a parquet lake on a cluster has
  * to bring its own, and WHICH primitive is atomic depends on the store:
  *
  *  - local POSIX: `CREATE_NEW` and `ATOMIC_MOVE` are atomic →
  *    [[CommitStore.local]] (the default; all in-sandbox specs run here).
  *  - HDFS: `FileSystem.create(path, overwrite=false)` and `rename` are
  *    atomic namespace ops → [[CommitStore.hadoop]].
  *  - object stores (S3 etc.): rename is copy+delete and create is
  *    last-writer-wins; `createNew` must map to a conditional-put
  *    (If-None-Match) or an external arbiter — the Delta LogStore /
  *    Iceberg commit-metadata pattern. That binding plugs in HERE, as
  *    another [[CommitStore]], without touching the protocol code.
  *
  * Contract notes: `createNew` must be atomic create-if-absent (returns
  * false, never corrupts, when the path exists); `rename` must be atomic
  * and return false when the source is missing or the destination exists
  * (with `replaceExisting=false`).
  */
trait CommitStore {

  /** Atomically create `path` with `content` iff it does not exist.
    * @return true iff this call created the file. */
  def createNew(path: String, content: Array[Byte]): Boolean

  /** Full contents, or None if the path does not exist (a concurrent
    * delete between exists-check and read must surface as None too). */
  def read(path: String): Option[Array[Byte]]

  /** Overwrite-write (NOT atomic; stage to a tmp path + [[rename]]). */
  def write(path: String, content: Array[Byte]): Unit

  /** Atomic rename of a file or directory.
    * @return true iff the rename happened. */
  def rename(src: String, dst: String, replaceExisting: Boolean): Boolean

  /** Delete a single file. @return true iff it existed. */
  def delete(path: String): Boolean

  def deleteRecursively(path: String): Unit

  def exists(path: String): Boolean

  /** Last-modified time (epoch ms), None if missing. */
  def modifiedMs(path: String): Option[Long]

  /** Child names (not paths) of a directory; empty if missing. */
  def list(dir: String): Seq[String]

  def mkdirs(path: String): Unit
}

object CommitStore {

  /** The default binding: `java.nio` on the local filesystem, where
    * `CREATE_NEW` and `ATOMIC_MOVE` are genuinely atomic syscalls. */
  val local: CommitStore = new LocalCommitStore

  /** Bind the protocol to the Hadoop `FileSystem` API (resolved per-path
    * from the path's scheme). On HDFS both `create(overwrite=false)` and
    * `rename` are atomic NameNode ops, so the protocol's guarantees carry
    * over unchanged. On `file://` Hadoop's RawLocalFileSystem implements
    * create-no-overwrite as check-then-act — fine for functional tests,
    * but the local [[CommitStore.local]] binding is the one with the
    * atomicity guarantee on this filesystem. */
  def hadoop(): CommitStore =
    new HadoopCommitStore(new org.apache.hadoop.conf.Configuration())

  def hadoop(conf: org.apache.hadoop.conf.Configuration): CommitStore =
    new HadoopCommitStore(conf)
}

/** java.nio implementation — atomic on POSIX. */
final class LocalCommitStore extends CommitStore {
  private def p(s: String): Path = Paths.get(s)

  override def createNew(path: String, content: Array[Byte]): Boolean =
    try {
      Files.write(p(path), content,
        java.nio.file.StandardOpenOption.CREATE_NEW)
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }

  override def read(path: String): Option[Array[Byte]] =
    try Some(Files.readAllBytes(p(path)))
    catch { case _: java.io.IOException => None }

  override def write(path: String, content: Array[Byte]): Unit =
    Files.write(p(path), content)

  override def rename(src: String, dst: String,
      replaceExisting: Boolean): Boolean =
    try {
      if (replaceExisting)
        Files.move(p(src), p(dst), StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      else
        Files.move(p(src), p(dst), StandardCopyOption.ATOMIC_MOVE)
      true
    } catch { case _: java.io.IOException => false }

  override def delete(path: String): Boolean =
    try Files.deleteIfExists(p(path))
    catch { case _: java.io.IOException => false }

  override def deleteRecursively(path: String): Unit =
    if (Files.exists(p(path)))
      // walk() holds a directory fd until closed (ADVICE r4: leaked fds)
      Using.resource(Files.walk(p(path))) { s =>
        s.sorted(Comparator.reverseOrder[Path]()).forEach(f =>
          Files.delete(f))
      }

  override def exists(path: String): Boolean = Files.exists(p(path))

  override def modifiedMs(path: String): Option[Long] =
    try Some(Files.getLastModifiedTime(p(path)).toMillis)
    catch { case _: java.io.IOException => None }

  override def list(dir: String): Seq[String] =
    if (!Files.exists(p(dir))) Seq.empty
    else Using.resource(Files.list(p(dir))) { s =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      s.forEach(c => buf += c.getFileName.toString)
      buf.toSeq
    }

  override def mkdirs(path: String): Unit = Files.createDirectories(p(path))
}

/** Hadoop `FileSystem` implementation — the cluster binding (HDFS-class
  * stores; see [[CommitStore.hadoop]] for the per-store atomicity map).
  * Renames go through `FileContext`, whose `Options.Rename` carries the
  * dest-exists semantics `FileSystem.rename`'s boolean swallows. */
final class HadoopCommitStore(conf: org.apache.hadoop.conf.Configuration)
    extends CommitStore {
  import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path => HPath}

  private def fs(p: HPath): FileSystem = p.getFileSystem(conf)

  override def createNew(path: String, content: Array[Byte]): Boolean = {
    val hp = new HPath(path)
    try {
      val out = fs(hp).create(hp, /*overwrite=*/ false)
      try out.write(content) finally out.close()
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case e: java.io.IOException
          if e.getMessage != null && e.getMessage.contains("exists") =>
        false
    }
  }

  override def read(path: String): Option[Array[Byte]] = {
    val hp = new HPath(path)
    try {
      val in = fs(hp).open(hp)
      try Some(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in))
      finally in.close()
    } catch { case _: java.io.IOException => None }
  }

  override def write(path: String, content: Array[Byte]): Unit = {
    val hp = new HPath(path)
    val out = fs(hp).create(hp, /*overwrite=*/ true)
    try out.write(content) finally out.close()
  }

  override def rename(src: String, dst: String,
      replaceExisting: Boolean): Boolean =
    try {
      val fc = FileContext.getFileContext(new HPath(src).toUri, conf)
      fc.rename(new HPath(src), new HPath(dst),
        (if (replaceExisting) Options.Rename.OVERWRITE
         else Options.Rename.NONE))
      true
    } catch { case _: java.io.IOException => false }

  override def delete(path: String): Boolean = {
    val hp = new HPath(path)
    try fs(hp).delete(hp, /*recursive=*/ false)
    catch { case _: java.io.IOException => false }
  }

  override def deleteRecursively(path: String): Unit = {
    val hp = new HPath(path)
    if (fs(hp).exists(hp)) { fs(hp).delete(hp, /*recursive=*/ true); () }
  }

  override def exists(path: String): Boolean = {
    val hp = new HPath(path)
    fs(hp).exists(hp)
  }

  override def modifiedMs(path: String): Option[Long] = {
    val hp = new HPath(path)
    try Some(fs(hp).getFileStatus(hp).getModificationTime)
    catch { case _: java.io.IOException => None }
  }

  override def list(dir: String): Seq[String] = {
    val hp = new HPath(dir)
    try fs(hp).listStatus(hp).toSeq.map(_.getPath.getName)
    catch { case _: java.io.IOException => Seq.empty }
  }

  override def mkdirs(path: String): Unit = {
    val hp = new HPath(path)
    fs(hp).mkdirs(hp); ()
  }
}
