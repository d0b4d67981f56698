package graft.streaming

import org.apache.spark.sql.DataFrame

/** Deterministic file-feed staging for streaming gates and specs: a
  * FileStreamSource orders newly-discovered files by modification time
  * (path is the tie-break), so a test whose semantics depend on ARRIVAL
  * ORDER must pin both. [[writePinned]] writes a DataFrame as exactly
  * ONE parquet file under the feed dir with a caller-chosen name and
  * mtime. The dance (coalesce(1) → find the single part file → move →
  * pin mtime → drop the part-less write dir) is subtle enough — the
  * directory stream must close, a multi-part write must refuse rather
  * than silently stage a partial slice, and the write dir must vanish
  * so the stream sees only pinned files — that it lives here once
  * instead of inline at each staging site. */
object FeedStaging {

  /** Stage `df` as the single pinned file `feedDir/<name>.parquet` with
    * modification time `mtimeMs`; returns the staged path. An EMPTY
    * frame still stages one (zero-row) file — callers that need
    * non-emptiness assert it themselves with their own diagnostic. */
  def writePinned(df: DataFrame, feedDir: java.nio.file.Path,
      name: String, mtimeMs: Long): java.nio.file.Path = {
    import scala.jdk.CollectionConverters._
    // dot-prefixed: Spark's file listing skips hidden paths, so even a
    // reader already watching the feed dir never sees the staging
    val tmp = feedDir.resolve(s".tmp_$name")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = java.nio.file.Files.list(tmp)
    val part =
      try listing.iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
      finally listing.close()
    require(part.size == 1,
      s"FeedStaging.writePinned: expected exactly one part file for " +
        s"'$name', found ${part.size} — coalesce(1) did not hold")
    val dst = feedDir.resolve(s"$name.parquet")
    // pin the mtime WHILE the file is still hidden, then move: the move
    // preserves it, so a reader already watching the feed dir can never
    // list the file with a wall-clock mtime that breaks the pinned
    // arrival order (the whole point of pinning)
    java.nio.file.Files.setLastModifiedTime(part.head,
      java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    java.nio.file.Files.move(part.head, dst)
    graft.TempDirs.deleteRecursively(tmp)
    dst
  }
}
