package graft

import org.apache.hadoop.fs.{Path => HadoopPath}

package object lake {
  /** nio-style path arithmetic over Hadoop paths, so lake code reads the
    * same whether the root is a bare local dir or a filesystem URI. */
  implicit final class HPathOps(private val p: HadoopPath) extends AnyVal {
    def resolve(child: String): HadoopPath = new HadoopPath(p, child)
    /** Basename, nio `getFileName.toString` analogue. */
    def baseName: String = p.getName
  }
}
