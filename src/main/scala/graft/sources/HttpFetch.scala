package graft.sources

import java.io.InputStream
import java.net.URI
import java.nio.file.{Files, Path, StandardCopyOption}

/** Out-of-engine ingest utility (SURVEY §2.1 S4): download a source file to
  * the raw layer with the reference's semantics (`scripts/fetch_data.py:12-26`):
  * idempotent skip-if-exists, stream to a temp file, atomic move into place
  * (so a crashed download never leaves a truncated raw file behind —
  * stronger than the reference, which wrote in place).
  *
  * Accepts any stream-able URI (http/https/file); in the zero-egress test
  * environment only file:// is exercised.
  */
object HttpFetch {

  /** Returns true if a fetch happened, false if the target already existed. */
  def fetchIfMissing(url: String, dest: Path): Boolean = {
    if (Files.exists(dest)) return false
    Files.createDirectories(dest.toAbsolutePath.getParent)
    val tmp = Files.createTempFile(dest.toAbsolutePath.getParent, ".fetch_", ".part")
    var in: InputStream = null
    try {
      in = URI.create(url).toURL.openStream()
      Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
      Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
      true
    } finally {
      if (in != null) in.close()
      Files.deleteIfExists(tmp)
    }
  }
}
