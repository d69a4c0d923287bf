package graft.index

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Tiny JSON + filesystem helpers for index metadata and checkpoint
  * manifests (Jackson ships with Spark; local FS is the sandbox stand-in
  * for the object store the reference writes markers to). */
object Json {
  private val mapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m
  }

  def write[T](path: String, value: T): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    // write-then-rename so a manifest is never observed half-written
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.writeString(tmp, mapper.writerWithDefaultPrettyPrinter.writeValueAsString(value))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def read[T](path: String, clazz: Class[T]): T =
    mapper.readValue(Files.readString(Paths.get(path)), clazz)

  /** Raw string sidecar (e.g. a schema JSON), same write-then-rename. */
  def writeString(path: String, s: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.writeString(tmp, s)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def readString(path: String): String = Files.readString(Paths.get(path))

  def exists(path: String): Boolean = Files.exists(Paths.get(path))

  def deleteRecursively(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }
  }

  /** Publish `from` at `to` without ever destroying a live `to` before the
    * replacement is in place: the existing target is renamed aside to
    * `to + ".old"`, the staging dir renamed in, and only then is the old
    * dir deleted. If the process dies between the two renames, the target
    * is missing but `to + ".old"` is intact — [[recoverSwap]] restores it. */
  def atomicMove(from: String, to: String): Unit = {
    val old = to + ".old"
    deleteRecursively(old) // leftover of a prior completed-but-uncleaned swap
    val toPath = Paths.get(to)
    if (Files.exists(toPath))
      Files.move(toPath, Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(from), toPath, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  /** Undo an interrupted [[atomicMove]]: if `to` is missing but `to + ".old"`
    * exists, the previous publish died mid-swap — put the old dir back. */
  def recoverSwap(to: String): Unit = {
    val old = Paths.get(to + ".old")
    if (Files.exists(old) && !Files.exists(Paths.get(to)))
      Files.move(old, Paths.get(to), StandardCopyOption.ATOMIC_MOVE)
  }
}
