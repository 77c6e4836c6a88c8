package graft

import java.net.URI
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A local-disk FileSystem registered under the scheme `graftfs://` — the
  * cluster-storage stand-in for specs. Paths like `graftfs:///tmp/x` are
  * valid Hadoop paths (Spark reads/writes parquet through them) but are
  * NEVER resolvable by `java.io.File` / `java.nio.file` (the raw string
  * is not a local path), so a spec that drives store/state code through
  * a `graftfs://` directory proves the code path touches storage only
  * via the Hadoop FileSystem API — the property an HDFS/S3 deployment
  * needs. A `java.io.File(path).exists()` probe that survives in the
  * code under test reads false forever here, exactly as it would on a
  * real cluster filesystem.
  *
  * Registered in [[SparkSpec]] via `spark.hadoop.fs.graftfs.impl`. No
  * AbstractFileSystem (FileContext) binding is registered on purpose:
  * the scheme also exercises Bundle.renameOverwrite's non-FileContext
  * fallback path.
  */
class GraftTestFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
  // RawLocalFileSystem.checkPath insists on its own (file) scheme; any
  // absolute path is fine here — the delegate resolves by URI path only.
  override def checkPath(path: Path): Unit = ()
}
