package graft.lake

import org.apache.hadoop.fs.Path
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 [[TableCatalog]] over a root directory of lake datasets, so SQL
  * can address them by NAME (the missing piece after the `USING lake`
  * path-based door):
  *
  * {{{
  *   spark.sql.catalog.lake      = graft.lake.LakeCatalog
  *   spark.sql.catalog.lake.root = /data/lake
  *
  *   CREATE TABLE lake.db.events (id BIGINT, name STRING)
  *   SELECT * FROM lake.db.events VERSION AS OF 3   -- time travel
  *   INSERT INTO lake.db.events VALUES ...
  *   DROP TABLE lake.db.events
  * }}}
  *
  * Layout: `<root>/<namespace...>/<table>` is one [[LakeDataset]] root.
  * Namespaces are directories. All reads route through [[LakeTable]]
  * (zonemap/bloom/value-set pruning + vectorized parquet); writes commit
  * through the optimistic manifest protocol. */
class LakeCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var root: String = _
  private var io: LakeIO = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name: set spark.sql.catalog.$name.root"))
    io = LakeIO.forRoot(root)
    io.mkdirs(new Path(root))
  }

  override def name(): String = catalogName

  private def dirOf(ident: Identifier) =
    (ident.namespace().toSeq :+ ident.name())
      .foldLeft(new Path(root))(_ resolve _)

  /** Maintenance procedures under the `system` namespace:
    * `CALL <cat>.system.optimize_zorder/compact/vacuum(...)`. */
  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    if (!(ident.namespace().isEmpty ||
        ident.namespace().sameElements(Array("system"))))
      throw new IllegalArgumentException(
        s"procedures live in the system namespace, got $ident")
    LakeProcedures.load(ident.name().toLowerCase,
      parts => parts.foldLeft(new Path(root))(_ resolve _).toString)
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      LakeProcedures.Names.map(Identifier.of(Array("system"), _)).toArray
    else Array.empty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(new Path(root))(_ resolve _)
    if (!io.exists(dir)) return Array.empty
    io.listNames(dir)
      .filter(n => LakeDataset.exists(dir.resolve(n).toString))
      .map(n => Identifier.of(namespace, n))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    if (!LakeDataset.exists(dir.toString))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident)
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", dir.toString)
    new LakeTable(dir.toString, new CaseInsensitiveStringMap(opts), None)
  }

  /** `SELECT ... VERSION AS OF n` routes here. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident)
    if (!LakeDataset.exists(dir.toString))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident)
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", dir.toString)
    // a numeric ref pins a version; anything else is a tag
    if (version.forall(_.isDigit)) opts.put("versionAsOf", version)
    else opts.put("tag", version)
    new LakeTable(dir.toString, new CaseInsensitiveStringMap(opts), None)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "lake: partition transforms are not supported (layout is managed)")
    val dir = dirOf(ident)
    if (LakeDataset.exists(dir.toString))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    io.mkdirs(dir.getParent)
    val ds = LakeDataset.create(SparkSession.active, dir.toString, schema)
    // persist engine-relevant TBLPROPERTIES (`write.*`, e.g. write.dml.mode);
    // Spark-internal keys (provider/owner/...) stay out of the manifest
    val writeProps = properties.asScala.filter(_._1.startsWith("write."))
    if (writeProps.nonEmpty) ds.setProperties(writeProps.toMap)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val ds = LakeDataset.open(SparkSession.active, dirOf(ident).toString)
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1, "nested columns not supported")
        ds.addColumns(StructType(Seq(
          org.apache.spark.sql.types.StructField(
            a.fieldNames().head, a.dataType(), a.isNullable))))
      case r: TableChange.RenameColumn =>
        require(r.fieldNames().length == 1, "nested columns not supported")
        ds.renameColumn(r.fieldNames().head, r.newName())
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames().length == 1, "nested columns not supported")
        ds.dropColumns(Seq(d.fieldNames().head))
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames().length == 1, "nested columns not supported")
        ds.alterColumnType(u.fieldNames().head, u.newDataType())
      // ALTER TABLE ... SET/UNSET TBLPROPERTIES — reserved keys steer the
      // engine (e.g. `write.dml.mode = mor` for merge-on-read DML)
      case p: TableChange.SetProperty =>
        ds.setProperties(Map(p.property() -> p.value()))
      case p: TableChange.RemoveProperty =>
        ds.removeProperties(Seq(p.property()))
      case other =>
        throw new UnsupportedOperationException(s"lake: $other")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!LakeDataset.exists(dir.toString)) return false
    io.deleteRecursive(dir)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    val from = dirOf(oldIdent)
    val to = dirOf(newIdent)
    require(LakeDataset.exists(from.toString), s"no table $oldIdent")
    require(!io.exists(to), s"table $newIdent exists")
    io.mkdirs(to.getParent)
    io.move(from, to)
  }

  // ---- namespaces (directories) ----

  override def listNamespaces(): Array[Array[String]] = {
    val r = new Path(root)
    io.listNames(r)
      .filter(n => io.isDirectory(r.resolve(n)) &&
        !LakeDataset.exists(r.resolve(n).toString))
      .map(n => Array(n))
      .toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] = {
    if (!io.isDirectory(namespace.foldLeft(new Path(root))(_ resolve _)))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(namespace.toSeq)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit =
    io.mkdirs(namespace.foldLeft(new Path(root))(_ resolve _))

  override def alterNamespace(namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit =
    throw new UnsupportedOperationException("lake: alterNamespace")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val dir = namespace.foldLeft(new Path(root))(_ resolve _)
    if (!io.exists(dir)) return false
    if (!cascade && io.listNames(dir).nonEmpty) return false
    io.deleteRecursive(dir)
  }
}
