package graft.server

import graft.{SparkTestBase, Tables}

/** Wire-protocol server oracle: a raw-socket client (no pg library — the
  * framing itself is under test) drives the simple-query cycle and pins
  * message-level behavior against the public protocol spec. */
class WireServerSpec extends SparkTestBase {

  private def withServer[A](f: WireClient.Conn => A): A = {
    val server = new WireServer(spark, 0, Tables.register(_, sf0001))
    try {
      val conn = new WireClient.Conn("127.0.0.1", server.boundPort)
      try f(conn) finally conn.close()
    } finally server.close()
  }

  test("startup handshake reports server parameters and reaches ready") {
    withServer { conn =>
      assert(conn.parameters("server_encoding") == "UTF8")
      assert(conn.parameters.contains("server_version"))
      assert(conn.parameters("TimeZone") == "UTC")
    }
  }

  test("simple query returns typed row description and text rows") {
    withServer { conn =>
      val res = conn.query(
        "SELECT 1 AS i, CAST(2 AS BIGINT) AS l, 'x' AS s, " +
          "CAST(1.5 AS DOUBLE) AS d, true AS b, CAST(NULL AS INT) AS n").head
      assert(res.fields.map(_._1) == Vector("i", "l", "s", "d", "b", "n"))
      assert(res.fields.map(_._2) == Vector(23, 20, 25, 701, 16, 23))
      assert(res.rows == Vector(Vector(
        Some("1"), Some("2"), Some("x"), Some("1.5"), Some("t"), None)))
      assert(res.tag == "SELECT 1")
    }
  }

  test("queries run against the registered testdata views") {
    withServer { conn =>
      val res = conn.query(
        "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey").head
      assert(res.rows.size == 5)
      assert(res.rows.head(1).get == "AFRICA")
      assert(res.tag == "SELECT 5")
    }
  }

  test("txn control: pg tags, and ROLLBACK warns there is no transaction") {
    withServer { conn =>
      assert(conn.query("BEGIN").head.tag == "BEGIN")
      assert(conn.query("START TRANSACTION").head.tag == "START TRANSACTION")
      assert(conn.query("COMMIT").head.tag == "COMMIT")
      assert(conn.query("END").head.tag == "COMMIT")
      assert(conn.notices.isEmpty) // BEGIN/COMMIT stay silent no-ops
      // ROLLBACK must NOT let a client believe persisted writes were
      // undone: stock pg's outside-a-transaction WARNING 25P01 rides
      // along with the ROLLBACK tag
      val r = conn.query("ROLLBACK").head
      assert(r.tag == "ROLLBACK")
      assert(conn.notices.exists(n => n.sqlState == "25P01" &&
        n.message.contains("no transaction")), conn.notices.toString)
      // same warning on the extended-protocol path (JDBC autocommit(false))
      conn.notices.clear()
      assert(conn.queryExtended("ROLLBACK").tag == "ROLLBACK")
      assert(conn.notices.exists(_.sqlState == "25P01"))
    }
  }

  test("multiple statements in one Query message get one result each") {
    withServer { conn =>
      val res = conn.query(
        "SELECT count(*) AS c FROM region; SELECT count(*) AS c FROM nation")
      assert(res.size == 2)
      assert(res(0).rows.head.head.get == "5")
      assert(res(1).rows.head.head.get == "25")
    }
  }

  test("a quoted semicolon does not split the statement") {
    withServer { conn =>
      val res = conn.query("SELECT 'a;b' AS s")
      assert(res.size == 1)
      assert(res.head.rows.head.head.get == "a;b")
    }
  }

  test("errors surface as ErrorResponse and the connection stays usable") {
    withServer { conn =>
      val e = intercept[WireClient.ServerError] {
        conn.query("SELECT * FROM no_such_table_xyz")
      }
      assert(e.message.nonEmpty)
      // connection survives the error and serves the next query
      val res = conn.query("SELECT 42 AS v").head
      assert(res.rows.head.head.get == "42")
    }
  }

  test("empty query yields no results and stays ready") {
    withServer { conn =>
      assert(conn.query("   ").isEmpty)
      assert(conn.query("SELECT 7 AS v").head.rows.head.head.get == "7")
    }
  }

  test("concurrent connections are served independently") {
    val server = new WireServer(spark, 0, Tables.register(_, sf0001))
    try {
      val results = new java.util.concurrent.ConcurrentHashMap[Int, String]()
      val threads = (0 until 4).map { i =>
        new Thread(() => {
          val c = new WireClient.Conn("127.0.0.1", server.boundPort)
          try results.put(i,
            c.query(s"SELECT $i + count(*) AS v FROM region").head
              .rows.head.head.get)
          finally c.close()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(30000))
      assert((0 until 4).forall(i => results.get(i) == (i + 5).toString))
    } finally server.close()
  }

  test("CancelRequest kills the running statement; connection survives") {
    val server = new WireServer(spark, 0, Tables.register(_, sf0001))
    try {
      val victim = new WireClient.Conn("127.0.0.1", server.boundPort)
      try {
        assert(victim.backendKey._1 > 0)
        val result = scala.concurrent.Future {
          // minutes of codegen'd work at local[4] — cannot finish before
          // the cancel lands
          victim.query("SELECT sum(id % 97) AS s FROM range(300000000000)")
        }(scala.concurrent.ExecutionContext.global)
        Thread.sleep(1500) // let the job start
        WireClient.cancel("127.0.0.1", server.boundPort, victim.backendKey)
        val e = intercept[WireClient.ServerError] {
          scala.concurrent.Await.result(result,
            scala.concurrent.duration.Duration(60, "s"))
        }
        assert(e.sqlState == "57014", s"got ${e.sqlState}: ${e.message}")
        // the session is still alive and serves the next statement
        assert(victim.query("SELECT 5 AS v").head.rows.head.head.get == "5")
      } finally victim.close()
    } finally server.close()
  }

  test("a wrong cancel secret is ignored") {
    val server = new WireServer(spark, 0, Tables.register(_, sf0001))
    try {
      val conn = new WireClient.Conn("127.0.0.1", server.boundPort)
      try {
        WireClient.cancel("127.0.0.1", server.boundPort,
          (conn.backendKey._1, conn.backendKey._2 + 1))
        assert(conn.query("SELECT 6 AS v").head.rows.head.head.get == "6")
      } finally conn.close()
    } finally server.close()
  }

  test("reference-style DDL + pg COPY run over the wire") {
    withServer { conn =>
      conn.query("CREATE DATABASE IF NOT EXISTS wire_ddl")
      try {
        conn.query("USE wire_ddl")
        val create = conn.query(
          "CREATE TABLE T1 ( A INTEGER NOT NULL, B VARCHAR(10), " +
            "PRIMARY KEY (A) )")
        assert(create.head.tag == "CREATE TABLE")
        val f = java.nio.file.Files.createTempFile("wire-", ".tbl")
        java.nio.file.Files.writeString(f, "1|x\n2|y\n")
        val copied = conn.query(
          s"COPY t1 FROM '$f' (FORMAT csv, DELIMITER '|')")
        assert(copied.head.rows.head.head.get == "2")
        val res = conn.query("SELECT a, b FROM t1 ORDER BY a").head
        assert(res.rows.map(_.head.get) == Vector("1", "2"))
        // PK violation surfaces as a wire error, connection stays live
        intercept[WireClient.ServerError] {
          conn.query(s"COPY t1 FROM '$f' (FORMAT csv, DELIMITER '|')")
        }
        assert(conn.query("SELECT count(*) AS c FROM t1").head
          .rows.head.head.get == "2")
      } finally conn.query(
        "USE default; DROP DATABASE IF EXISTS wire_ddl CASCADE")
    }
  }

  test("extended protocol binds typed text parameters") {
    withServer { conn =>
      val res = conn.queryExtended(
        "SELECT $1 + 1 AS i, $2 * 2 AS l, upper($3) AS s, $4 / 2 AS d, " +
          "NOT $5 AS b, $6 AS n, $7 AS dt",
        Seq(
          23 -> Some("41"), 20 -> Some("100"), 25 -> Some("abc"),
          701 -> Some("3.5"), 16 -> Some("t"), 23 -> None,
          1082 -> Some("1998-12-01")))
      assert(res.rows == Vector(Vector(
        Some("42"), Some("200"), Some("ABC"), Some("1.75"), Some("f"),
        None, Some("1998-12-01"))))
      assert(res.tag == "SELECT 1")
    }
  }

  test("a placeholder used twice binds one value to both sites") {
    withServer { conn =>
      val res = conn.queryExtended(
        "SELECT n_name FROM nation WHERE n_nationkey BETWEEN $1 AND $1 + 2 " +
          "ORDER BY n_nationkey",
        Seq(23 -> Some("5")))
      assert(res.rows.map(_.head.get) ==
        Vector("NATION_5", "NATION_6", "NATION_7"))
    }
  }

  test("dollar-digit inside a string literal is not a placeholder") {
    withServer { conn =>
      val res = conn.queryExtended(
        "SELECT '$1' AS lit, $1 AS bound", Seq(23 -> Some("9")))
      assert(res.rows == Vector(Vector(Some("$1"), Some("9"))))
    }
  }

  test("parameters bind against the registered tables") {
    withServer { conn =>
      val res = conn.queryExtended(
        "SELECT count(*) AS c FROM nation WHERE n_regionkey = $1",
        Seq(20 -> Some("2")))
      assert(res.rows.head.head.get == "5")
    }
  }

  test("Execute max-rows suspends the portal and resumes across fetches") {
    withServer { conn =>
      val res = conn.queryExtended(
        "SELECT n_nationkey FROM nation ORDER BY n_nationkey", maxRows = 7)
      assert(res.rows.map(_.head.get.toInt) == (0 until 25).toVector)
      assert(res.tag == "SELECT 25") // cumulative count across suspensions
    }
  }

  test("binary-format fixed-width parameters decode") {
    withServer { conn =>
      def be4(v: Int) =
        java.nio.ByteBuffer.allocate(4).putInt(v).array()
      def be8(v: Double) =
        java.nio.ByteBuffer.allocate(8).putDouble(v).array()
      val res = conn.queryExtended(
        "SELECT $1 * 2 AS i, $2 + 0.5 AS d",
        binaryParams = Seq(23 -> Some(be4(21)), 701 -> Some(be8(1.25))))
      assert(res.rows == Vector(Vector(Some("42"), Some("1.75"))))
    }
  }

  test("Describe statement reports parameter OIDs and result fields") {
    withServer { conn =>
      val (oids, fields) = conn.describeStatement(
        "SELECT n_name FROM nation WHERE n_nationkey = $1 AND n_name <> $2",
        Seq(20, 25))
      assert(oids == Vector(20, 25))
      assert(fields.map(_._1) == Vector("n_name"))
      assert(fields.map(_._2) == Vector(25))
    }
  }

  test("bind with too few parameters errors; connection stays usable") {
    withServer { conn =>
      val e = intercept[WireClient.ServerError] {
        conn.queryExtended(
          "SELECT $1 + $2 AS v", Seq(23 -> Some("1")))
      }
      assert(e.sqlState == "08P01")
      assert(conn.query("SELECT 3 AS v").head.rows.head.head.get == "3")
    }
  }

  test("an unparseable parameter value errors at bind, not execute") {
    withServer { conn =>
      val e = intercept[WireClient.ServerError] {
        conn.queryExtended("SELECT $1 AS v", Seq(23 -> Some("not-a-number")))
      }
      assert(e.sqlState == "22P02")
      assert(conn.query("SELECT 4 AS v").head.rows.head.head.get == "4")
    }
  }

  test("after an extended-cycle error the server skips until Sync") {
    withServer { conn =>
      // pipelined: Parse + failing Bind (too few params) + Describe +
      // Execute + Sync, all before reading. Per the protocol the server
      // must answer ParseComplete, ErrorResponse, then DISCARD the
      // Describe and Execute (no NoData / EmptyQueryResponse) until Sync.
      conn.send('P') { b =>
        b.writeByte(0)
        b.write("SELECT $1 + $2 AS v".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        b.writeByte(0)
        b.writeShort(2); b.writeInt(23); b.writeInt(23)
      }
      conn.send('B') { b =>
        b.writeByte(0); b.writeByte(0)
        b.writeShort(0)
        b.writeShort(1)                      // only one of two params
        b.writeInt(1); b.write("7".getBytes)
        b.writeShort(0)
      }
      conn.send('D') { b => b.writeByte('P'); b.writeByte(0) }
      conn.send('E') { b => b.writeByte(0); b.writeInt(0) }
      conn.send('S') { _ => () }
      conn.flushOut()
      val replies = Iterator.continually(conn.readMessage())
        .takeWhile(_._1 != 'Z').map(_._1).toVector
      assert(replies == Vector('1', 'E'),
        s"expected ParseComplete + ErrorResponse only, got $replies")
      // connection is clean after Sync
      assert(conn.query("SELECT 11 AS v").head.rows.head.head.get == "11")
    }
  }

  test("placeholders inside SQL comments are not parameters") {
    withServer { conn =>
      val res = conn.queryExtended(
        "SELECT $1 AS v -- ignore $2 here\n /* and /* $3 */ here */",
        Seq(23 -> Some("5")))
      assert(res.rows.head.head.get == "5")
    }
  }

  test("re-Execute of a completed DML portal does not run it twice") {
    withServer { conn =>
      conn.query("CREATE DATABASE IF NOT EXISTS wire_portal; USE wire_portal")
      try {
        conn.query("CREATE TABLE pt ( A INTEGER )")
        // Parse+Bind an INSERT portal, Execute it twice in one cycle
        conn.send('P') { b =>
          b.writeByte(0)
          b.write("INSERT INTO pt VALUES (1)".getBytes)
          b.writeByte(0); b.writeShort(0)
        }
        conn.send('B') { b =>
          b.writeByte(0); b.writeByte(0)
          b.writeShort(0); b.writeShort(0); b.writeShort(0)
        }
        conn.send('E') { b => b.writeByte(0); b.writeInt(0) }
        conn.send('E') { b => b.writeByte(0); b.writeInt(0) }
        conn.send('S') { _ => () }
        conn.flushOut()
        val replies = Iterator.continually(conn.readMessage())
          .takeWhile(_._1 != 'Z').map(_._1).toVector
        // ParseComplete, BindComplete, CommandComplete, CommandComplete
        assert(replies == Vector('1', '2', 'C', 'C'), s"got $replies")
        assert(conn.query("SELECT count(*) AS c FROM pt").head
          .rows.head.head.get == "1")
      } finally conn.query(
        "USE default; DROP DATABASE IF EXISTS wire_portal CASCADE")
    }
  }

  test("binding more portals than the cap errors cleanly") {
    // the cap is read per-connection at message-loop entry, so a conf set
    // before connecting applies to the new connection
    val prev = spark.conf.getOption("spark.graft.wire.maxPortals")
    spark.conf.set("spark.graft.wire.maxPortals", "2")
    try withServer { conn =>
      conn.send('P') { b =>
        b.writeByte(0)
        b.write("SELECT 1 AS v".getBytes)
        b.writeByte(0); b.writeShort(0)
      }
      Seq("pa", "pb", "pc").foreach { name =>
        conn.send('B') { b =>
          b.write(name.getBytes); b.writeByte(0)   // named portal
          b.writeByte(0)                           // unnamed statement
          b.writeShort(0); b.writeShort(0); b.writeShort(0)
        }
      }
      conn.send('S') { _ => () }
      conn.flushOut()
      var err: Option[WireClient.ServerError] = None
      var binds = 0
      var done = false
      while (!done) {
        val (typ, body) = conn.readMessage()
        typ match {
          case '2' => binds += 1
          case 'E' => err = Some(WireClient.parseError(body))
          case 'Z' => done = true
          case _ => ()
        }
      }
      assert(binds == 2)
      assert(err.exists(_.sqlState == "53000"), s"got $err")
      // connection survives
      assert(conn.query("SELECT 9 AS v").head.rows.head.head.get == "9")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.wire.maxPortals", v)
      case None => spark.conf.unset("spark.graft.wire.maxPortals")
    }
  }

  private def withAuth[A](mode: String, users: String)(f: Int => A): A = {
    spark.conf.set("spark.graft.wire.auth", mode)
    spark.conf.set("spark.graft.wire.users", users)
    val server = new WireServer(spark, 0)
    try f(server.boundPort)
    finally {
      server.close()
      spark.conf.unset("spark.graft.wire.auth")
      spark.conf.unset("spark.graft.wire.users")
    }
  }

  test("cleartext password auth: right password in, wrong password out") {
    withAuth("password", "alice:s3cret,bob:hunter2") { port =>
      val conn = new WireClient.Conn("127.0.0.1", port,
        user = "alice", password = "s3cret")
      try assert(conn.query("SELECT 1 AS v").head.rows.head.head.get == "1")
      finally conn.close()

      val bad = intercept[WireClient.ServerError](
        new WireClient.Conn("127.0.0.1", port,
          user = "alice", password = "wrong"))
      assert(bad.sqlState == "28P01")
    }
  }

  test("SCRAM-SHA-256: full exchange authenticates, bad/unknown rejected") {
    withAuth("scram-sha-256", "carol:tops3cret") { port =>
      // success implies the client also verified the SERVER signature
      // (Conn throws on a v= mismatch), i.e. mutual authentication
      val conn = new WireClient.Conn("127.0.0.1", port,
        user = "carol", password = "tops3cret")
      try assert(conn.query("SELECT 2 AS v").head.rows.head.head.get == "2")
      finally conn.close()

      val badPw = intercept[WireClient.ServerError](
        new WireClient.Conn("127.0.0.1", port,
          user = "carol", password = "nope"))
      assert(badPw.sqlState == "28P01")

      // unknown user: mock exchange — same error as a wrong password,
      // so the failure does not reveal whether the role exists
      val noUser = intercept[WireClient.ServerError](
        new WireClient.Conn("127.0.0.1", port,
          user = "mallory", password = "tops3cret"))
      assert(noUser.sqlState == "28P01")
    }
  }

  test("trust mode (default) still connects with no credentials") {
    withAuth("trust", "") { port =>
      val conn = new WireClient.Conn("127.0.0.1", port)
      try assert(conn.query("SELECT 3 AS v").head.rows.head.head.get == "3")
      finally conn.close()
    }
  }

  test("wire round-trip DataFrame matches direct execution") {
    Tables.register(spark, sf0001)
    val sql = "SELECT n_regionkey, count(*) AS nations FROM nation " +
      "GROUP BY n_regionkey"
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .sorted
    val viaWire = pairs(WireQueries.roundtrip(spark, sf0001, sql))
    val direct = pairs(spark.sql(sql))
    assert(viaWire.sameElements(direct))
  }
}
