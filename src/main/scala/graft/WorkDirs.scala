package graft

import java.nio.file.{Files, Path, Paths}

/** Scratch-directory discipline for query entries that materialize to disk
  * (layout rewrites, store mutations, streaming checkpoints).
  *
  * Round-4 hygiene verdict: ten query entries minted `nanoTime()`-stamped
  * dirs under java.io.tmpdir and never deleted them — every verify+bench
  * cycle leaked ~10 table copies, unbounded across rounds. The discipline
  * here bounds that to ONE copy per query name at any moment:
  *
  *  - all scratch lives under a single per-JVM root (pid-suffixed, so an
  *    sbt test JVM and a bench JVM never collide);
  *  - [[fresh]] gives a query a per-name subdir and WIPES it on every
  *    call — repeated bench/verify invocations reuse the path instead of
  *    accumulating copies;
  *  - a shutdown hook removes the whole root when the JVM exits, leaving
  *    /tmp flat after any run.
  */
object WorkDirs {

  private lazy val root: Path = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_work_${ProcessHandle.current().pid()}")
    Files.createDirectories(p)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p)))
    p
  }

  /** Scratch path for `name`, wiped of any previous contents. The dir
    * itself is NOT pre-created: parquet writers in ErrorIfExists mode
    * refuse an existing path, so callers that need the dir create it. */
  def fresh(name: String): String = {
    val d = resolveUnder(name)
    deleteRecursively(d)
    d.toString
  }

  /** Stable path for `name` (NOT wiped): for warehouse dirs that are
    * legitimately reused across calls within the JVM. Still under the
    * root, so JVM exit cleans it up. */
  def stable(name: String): String = resolveUnder(name).toString

  /** The session root — exposed so tests can assert flatness. */
  def rootDir: String = root.toString

  /** Delete a scratch path previously minted by [[fresh]]/[[stable]] —
    * the superseded-generation reclaim in [[graft.ArtifactMemo]]. Refuses
    * paths outside the work root (the same containment check as
    * [[fresh]]), so a corrupted memo entry can never aim this at real
    * data. Best-effort like the shutdown hook. */
  def drop(path: String): Unit = {
    val p = Paths.get(path).normalize()
    require(p.startsWith(root), s"drop path escapes the work root: $path")
    deleteRecursively(p)
  }

  private def resolveUnder(name: String): Path = {
    val d = root.resolve(name).normalize()
    require(d.startsWith(root), s"scratch name escapes the work root: $name")
    d
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverseIterator
        .foreach(f => try Files.deleteIfExists(f) catch { case _: java.io.IOException => () })
    }
}
