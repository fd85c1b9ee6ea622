package graft.server

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** Registry coverage for the wire-protocol server: the round-trip entry
  * starts a [[WireServer]] on an ephemeral loopback port, executes the
  * shared SQL through a raw-socket [[WireClient]], and rebuilds a typed
  * DataFrame from the text-format wire results — so the driver's DuckDB
  * hash gate certifies the full path: Spark plan → toLocalIterator →
  * protocol framing → text encoding → client parse → typed values.
  * (Reference surface: the plandb psql-wire binary, cmd/main/main.go:68.)
  */
object WireQueries {

  private val roundtripSql =
    """SELECT n_regionkey,
      |       count(*) AS nations,
      |       min(n_name) AS first_name,
      |       CAST(round(avg(n_nationkey) * 100) AS BIGINT) AS avg_key_c
      |FROM nation
      |GROUP BY n_regionkey""".stripMargin

  /** Text-format decode per type OID (the inverse of WireServer.textValue
    * for the types the round-trip exercises). */
  private def decoder(oid: Int): (DataType, String => Any) = oid match {
    case 16 => (BooleanType, s => s == "t")
    case 21 => (ShortType, s => s.toShort)
    case 23 => (IntegerType, s => s.toInt)
    case 20 => (LongType, s => s.toLong)
    case 700 => (FloatType, s => s.toFloat)
    case 701 => (DoubleType, s => s.toDouble)
    case _ => (StringType, identity[String])
  }

  /** Run `sql` through a live wire server over `sfDir`'s views and decode
    * the text results into a typed DataFrame. */
  def roundtrip(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    val server = new WireServer(spark, port = 0, Tables.register(_, sfDir))
    try {
      val conn = new WireClient.Conn("127.0.0.1", server.boundPort)
      try {
        val res = conn.query(sql).head
        val decoders = res.fields.map { case (_, oid) => decoder(oid) }
        val schema = StructType(res.fields.zip(decoders).map {
          case ((name, _), (dt, _)) => StructField(name, dt)
        })
        val rows = res.rows.map { r =>
          Row.fromSeq(r.zip(decoders).map {
            case (cell, (_, dec)) => cell.map(dec).orNull
          })
        }
        spark.createDataFrame(
          new java.util.ArrayList[Row](scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), schema)
      } finally conn.close()
    } finally server.close()
  }

  private val extendedSql =
    """SELECT o_orderpriority,
      |       count(*) AS n_orders,
      |       CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS total_c
      |FROM orders
      |WHERE o_custkey BETWEEN 10 AND 500 AND o_orderstatus = 'O'
      |GROUP BY o_orderpriority""".stripMargin

  /** The same query phrased with $n placeholders for the EXTENDED cycle:
    * Parse/Bind/Describe/Execute with three typed parameters. */
  private val extendedParamSql =
    """SELECT o_orderpriority,
      |       count(*) AS n_orders,
      |       CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS total_c
      |FROM orders
      |WHERE o_custkey BETWEEN $1 AND $2 AND o_orderstatus = $3
      |GROUP BY o_orderpriority""".stripMargin

  /** Extended-protocol round trip with parameter binding: the oracle runs
    * the literal SQL, the engine runs the $n form with the values bound
    * through Bind — hash-equal iff placeholder rewrite, typed binding,
    * portal execution, and framing all agree with the literal plan. */
  def extendedRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val server = new WireServer(spark, port = 0, Tables.register(_, sfDir))
    try {
      val conn = new WireClient.Conn("127.0.0.1", server.boundPort)
      try {
        val res = conn.queryExtended(extendedParamSql,
          Seq(20 -> Some("10"), 20 -> Some("500"), 25 -> Some("O")),
          maxRows = 2) // exercise portal suspension on the way
        val decoders = res.fields.map { case (_, oid) => decoder(oid) }
        val schema = StructType(res.fields.zip(decoders).map {
          case ((name, _), (dt, _)) => StructField(name, dt)
        })
        val rows = res.rows.map { r =>
          Row.fromSeq(r.zip(decoders).map {
            case (cell, (_, dec)) => cell.map(dec).orNull
          })
        }
        spark.createDataFrame(
          new java.util.ArrayList[Row](scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), schema)
      } finally conn.close()
    } finally server.close()
  }

  /** Catalog introspection over the wire: the pg_class/pg_namespace join a
    * pg client runs (psql `\dt` shape, with pg-isms the PgDialect shim
    * rewrites), filtered to the driver's fixed table set so the listing is
    * deterministic under any session's extra temp views. The oracle states
    * the same fact through DuckDB's information_schema. */
  private val catalogTables = graft.Tables.all.map(t => s"'$t'")
    .mkString("(", ", ", ")")

  private val catalogWireSql =
    s"""SELECT c.relname AS table_name
       |FROM pg_catalog.pg_class c
       |     LEFT JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
       |WHERE c.relkind IN ('r','p')
       |  AND n.nspname !~ '^pg_'
       |  AND pg_catalog.pg_table_is_visible(c.oid)
       |  AND c.relname IN $catalogTables
       |ORDER BY 1""".stripMargin

  private val catalogOracleSql =
    s"""SELECT table_name FROM information_schema.tables
       |WHERE table_name IN $catalogTables
       |ORDER BY 1""".stripMargin

  val all: Seq[Q] = Seq(
    Q("wire_roundtrip", roundtripSql)((s, dir) => roundtrip(s, dir, roundtripSql)),
    Q("wire_extended", extendedSql)((s, dir) => extendedRoundtrip(s, dir)),
    Q("wire_catalog", catalogOracleSql)(
      (s, dir) => roundtrip(s, dir, catalogWireSql))
  )
}
