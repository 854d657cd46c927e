package graft

import java.nio.file.{Files, Path}

import org.scalatest.{BeforeAndAfterAll, Suite}

/** Temp-dir hygiene for specs: every directory handed out by
  * [[tempDir]] is registered and recursively deleted in `afterAll`, so
  * a suite run leaves no /tmp debris (the round-10 review counted 19
  * `annstream*` leftovers, ~100 KB each, after one suite run — the
  * production paths clean up after themselves and the test suite is
  * held to the same standard). Deletion is best-effort: a suite must
  * never fail on cleanup.
  */
trait TempDirs extends BeforeAndAfterAll { this: Suite =>
  private val created = scala.collection.mutable.ListBuffer.empty[Path]

  def tempDir(prefix: String): Path = synchronized {
    val p = Files.createTempDirectory(prefix)
    created += p
    p
  }

  override def afterAll(): Unit =
    try super.afterAll()
    finally synchronized {
      import scala.jdk.CollectionConverters._
      for (p <- created)
        try {
          // Files.walk holds open DirectoryStreams until closed
          val walk = Files.walk(p)
          try walk.iterator().asScala.toSeq.reverseIterator
            .foreach(f => try Files.deleteIfExists(f)
            catch { case _: Exception => () })
          finally walk.close()
        } catch { case _: Exception => () }
    }
}
