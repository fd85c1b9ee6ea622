package graft.lake

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.RawLocalFileSystem

/** Test-only Hadoop FileSystem with a NON-`file` scheme and a real
  * authority component, storing bytes on local disk. Registering it as
  * `graftfs://testhost/...` lets the suite prove that no `file://`
  * assumption leaks through the lake's path handling: qualification,
  * authority round-tripping, executor-side fragment IO via Spark, and
  * HadoopLakeIO's generic (rename-if-absent, non-hard-link) publish
  * branch — the code path an hdfs:// root takes. (Object-store
  * conditional-PUT commits are contract-tested separately by
  * [[ConditionalPutLakeSpec]] over a rename-refusing fake store.) */
class GraftTestFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = GraftTestFileSystem.NAME
}

object GraftTestFileSystem {
  val NAME: URI = URI.create("graftfs://testhost/")

  /** Register the scheme on a Configuration (idempotent). */
  def register(conf: Configuration): Unit = {
    conf.set("fs.graftfs.impl", classOf[GraftTestFileSystem].getName)
    // one shared instance per JVM is fine for tests; disable the cache so
    // a stale pre-registration instance can never be returned
    conf.setBoolean("fs.graftfs.impl.disable.cache", false)
  }
}
