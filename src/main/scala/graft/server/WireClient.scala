package graft.server

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

/** Minimal PostgreSQL-protocol client — the test/round-trip counterpart of
  * [[WireServer]], speaking the same public v3 framing from the frontend
  * side (startup → simple query → terminate). Kept deliberately dumb: raw
  * message framing, text-format results only, no TLS, so a server bug
  * cannot hide behind a lenient client library. Speaks the three auth
  * exchanges the server offers: trust, cleartext password, and
  * SCRAM-SHA-256 (with server-signature verification on the final step).
  */
object WireClient {

  /** One result set: field (name, typeOid) pairs, text rows (None = NULL),
    * and the CommandComplete tag. */
  final case class Result(
      fields: Vector[(String, Int)],
      rows: Vector[Vector[Option[String]]],
      tag: String)

  final case class ServerError(sqlState: String, message: String)
      extends RuntimeException(s"$sqlState: $message")

  final class Conn(host: String, port: Int, user: String = "graft",
      database: String = "graft", password: String = "")
      extends AutoCloseable {
    private val socket = new Socket(host, port)
    socket.setTcpNoDelay(true)
    private val in = new DataInputStream(
      new BufferedInputStream(socket.getInputStream))
    private val out = new DataOutputStream(
      new BufferedOutputStream(socket.getOutputStream))

    /** Startup parameters visible after connect (ParameterStatus). */
    val parameters: mutable.Map[String, String] = mutable.Map.empty

    /** NoticeResponses observed during query cycles (severity+state+msg
      * parse the same fields as an error), for asserting server warnings. */
    val notices: mutable.Buffer[ServerError] = mutable.Buffer.empty

    /** BackendKeyData (pid, secret) — the cancel key for this session. */
    @volatile var backendKey: (Int, Int) = (0, 0)

    // StartupMessage: int32 len, int32 protocol, k\0v\0... \0
    locally {
      val body = new java.io.ByteArrayOutputStream()
      val b = new DataOutputStream(body)
      b.writeInt(196608)
      Seq("user" -> user, "database" -> database).foreach { case (k, v) =>
        b.write(k.getBytes(UTF_8)); b.writeByte(0)
        b.write(v.getBytes(UTF_8)); b.writeByte(0)
      }
      b.writeByte(0)
      out.writeInt(4 + body.size())
      body.writeTo(out)
      out.flush()
      drainUntilReady() // auth + parameter status + backend key
    }

    /** Run one simple query; returns results per statement in the string. */
    def query(sql: String): Vector[Result] = {
      out.writeByte('Q')
      val bytes = sql.getBytes(UTF_8)
      out.writeInt(4 + bytes.length + 1)
      out.write(bytes); out.writeByte(0)
      out.flush()

      val results = Vector.newBuilder[Result]
      var fields = Vector.empty[(String, Int)]
      var rows = Vector.newBuilder[Vector[Option[String]]]
      var err: Option[ServerError] = None
      var done = false
      while (!done) {
        val (typ, body) = readMessage()
        typ match {
          case 'T' =>
            fields = parseRowDescription(body)
            rows = Vector.newBuilder
          case 'D' => rows += parseDataRow(body)
          case 'C' =>
            results += Result(fields, rows.result(), cString(body, 0)._1)
            fields = Vector.empty; rows = Vector.newBuilder
          case 'I' => () // EmptyQueryResponse
          case 'E' => err = Some(parseError(body))
          case 'Z' => done = true
          case 'N' => notices += parseError(body)
          case 'S' | 'A' => () // params/async — ignore
          case other =>
            throw new IOException(s"unexpected message '$other' in query cycle")
        }
      }
      err.foreach(throw _)
      results.result()
    }

    /** Extended-protocol round trip: Parse($n SQL, declared OIDs) → Bind
      * (text-format params, None = NULL) → Describe portal → Execute →
      * Sync. `maxRows` > 0 exercises portal suspension: rows arrive in
      * Execute-sized batches off one bound portal until CommandComplete. */
    def queryExtended(
        sql: String,
        params: Seq[(Int, Option[String])] = Nil,
        maxRows: Int = 0,
        binaryParams: Seq[(Int, Option[Array[Byte]])] = Nil): Result = {
      // Parse (unnamed statement)
      send('P') { b =>
        b.writeByte(0)                       // statement name ""
        b.write(sql.getBytes(UTF_8)); b.writeByte(0)
        val oids = if (binaryParams.nonEmpty) binaryParams.map(_._1)
          else params.map(_._1)
        b.writeShort(oids.size)
        oids.foreach(b.writeInt)
      }
      // Bind (unnamed portal)
      send('B') { b =>
        b.writeByte(0); b.writeByte(0)       // portal "", statement ""
        if (binaryParams.nonEmpty) {
          b.writeShort(1); b.writeShort(1)   // one format code: all binary
          b.writeShort(binaryParams.size)
          binaryParams.foreach {
            case (_, None) => b.writeInt(-1)
            case (_, Some(v)) => b.writeInt(v.length); b.write(v)
          }
        } else {
          b.writeShort(0)                    // all text
          b.writeShort(params.size)
          params.foreach {
            case (_, None) => b.writeInt(-1)
            case (_, Some(v)) =>
              val bytes = v.getBytes(UTF_8)
              b.writeInt(bytes.length); b.write(bytes)
          }
        }
        b.writeShort(0)                      // result formats: default text
      }
      send('D') { b => b.writeByte('P'); b.writeByte(0) } // Describe portal
      send('E') { b => b.writeByte(0); b.writeInt(maxRows) }
      send('S') { _ => () }                  // Sync — server flushes here
      out.flush()

      var fields = Vector.empty[(String, Int)]
      val rows = Vector.newBuilder[Vector[Option[String]]]
      var tag = ""
      var err: Option[ServerError] = None
      var suspended = false
      var done = false
      while (!done) {
        val (typ, body) = readMessage()
        typ match {
          case '1' | '2' | 'n' => ()         // ParseComplete/BindComplete/NoData
          case 'T' => fields = parseRowDescription(body)
          case 'D' => rows += parseDataRow(body)
          case 's' => suspended = true       // PortalSuspended
          case 'C' => tag = cString(body, 0)._1; suspended = false
          case 'I' => suspended = false
          case 'N' => notices += parseError(body)
          case 'E' => err = Some(parseError(body)); suspended = false
          case 'Z' =>                        // ReadyForQuery after Sync
            if (suspended && err.isEmpty) {
              // next fetch batch: the portal survives Sync on this server
              suspended = false
              send('E') { b => b.writeByte(0); b.writeInt(maxRows) }
              send('S') { _ => () }
              out.flush()
            } else done = true
          case other =>
            throw new IOException(s"unexpected message '$other' in extended cycle")
        }
      }
      err.foreach(throw _)
      Result(fields, rows.result(), tag)
    }

    /** Parse + Describe statement only: returns the declared/padded
      * parameter OIDs and the result field (name, oid) pairs. */
    def describeStatement(
        sql: String, oids: Seq[Int] = Nil): (Vector[Int], Vector[(String, Int)]) = {
      send('P') { b =>
        b.writeByte(0)
        b.write(sql.getBytes(UTF_8)); b.writeByte(0)
        b.writeShort(oids.size); oids.foreach(b.writeInt)
      }
      send('D') { b => b.writeByte('S'); b.writeByte(0) }
      send('S') { _ => () }
      out.flush()
      var paramOids = Vector.empty[Int]
      var fields = Vector.empty[(String, Int)]
      var err: Option[ServerError] = None
      var ready = false
      while (!ready) readMessage() match {
        case ('t', body) =>
          val n = readShort(body, 0)
          paramOids = Vector.tabulate(n)(i => readInt(body, 2 + i * 4))
        case ('T', body) => fields = parseRowDescription(body)
        case ('E', body) => err = Some(parseError(body))
        case ('Z', _) => ready = true
        case _ => ()
      }
      err.foreach(throw _)
      (paramOids, fields)
    }

    private[server] def send(typ: Char)(write: DataOutputStream => Unit): Unit = {
      val body = new java.io.ByteArrayOutputStream()
      write(new DataOutputStream(body))
      out.writeByte(typ)
      out.writeInt(4 + body.size())
      body.writeTo(out)
    }

    private[server] def flushOut(): Unit = out.flush()

    override def close(): Unit = {
      try { out.writeByte('X'); out.writeInt(4); out.flush() }
      catch { case _: IOException => () }
      socket.close()
    }

    // ------------------------------------------------------------ plumbing

    private def drainUntilReady(): Unit = {
      // SCRAM frontend state across the R-message exchange
      var scramNonce = ""
      var scramBare = ""
      var expectServerSig: Option[String] = None
      var ready = false
      while (!ready) {
        val (typ, body) = readMessage()
        typ match {
          case 'R' =>
            val code = readInt(body, 0)
            code match {
              case 0 => () // AuthenticationOk
              case 3 =>    // AuthenticationCleartextPassword
                send('p') { b =>
                  b.write(password.getBytes(UTF_8)); b.writeByte(0)
                }
                flushOut()
              case 10 =>   // AuthenticationSASL — start SCRAM-SHA-256
                scramNonce = WireAuth.freshNonce(
                  new java.security.SecureRandom())
                scramBare = s"n=,r=$scramNonce"
                val first = ("n,," + scramBare).getBytes(UTF_8)
                send('p') { b =>
                  b.write(WireAuth.Mechanism.getBytes(UTF_8)); b.writeByte(0)
                  b.writeInt(first.length); b.write(first)
                }
                flushOut()
              case 11 =>   // AuthenticationSASLContinue — server-first
                val serverFirst = new String(body, 4, body.length - 4, UTF_8)
                val a = WireAuth.attrs(serverFirst)
                val fullNonce = a('r')
                if (!fullNonce.startsWith(scramNonce))
                  throw new IOException("server tampered with SCRAM nonce")
                val salted = WireAuth.saltedPassword(
                  password, WireAuth.unb64(a('s')), a('i').toInt)
                val noProof = s"c=biws,r=$fullNonce" // biws = b64("n,,")
                val authMessage =
                  scramBare + "," + serverFirst + "," + noProof
                val ck = WireAuth.clientKey(salted)
                val proof = WireAuth.xor(ck,
                  WireAuth.hmac(WireAuth.storedKey(ck), authMessage))
                expectServerSig = Some(WireAuth.b64(
                  WireAuth.hmac(WireAuth.serverKey(salted), authMessage)))
                val fin =
                  (noProof + s",p=${WireAuth.b64(proof)}").getBytes(UTF_8)
                send('p') { b => b.write(fin) }
                flushOut()
              case 12 =>   // AuthenticationSASLFinal — verify the server
                val v = WireAuth.attrs(
                  new String(body, 4, body.length - 4, UTF_8)).get('v')
                if (v != expectServerSig)
                  throw new IOException(
                    "SCRAM server signature mismatch — not the real server")
              case other =>
                throw new IOException(s"unsupported auth request $other")
            }
          case 'S' =>
            val (k, p) = cString(body, 0); val (v, _) = cString(body, p)
            parameters(k) = v
          case 'K' => backendKey = (readInt(body, 0), readInt(body, 4))
          case 'E' => throw parseError(body)
          case 'Z' => ready = true
          case 'N' => () // NoticeResponse
          case other => throw new IOException(s"unexpected startup msg '$other'")
        }
      }
    }

    private[server] def readMessage(): (Char, Array[Byte]) = {
      val typ = in.readByte().toChar
      val len = in.readInt()
      val body = new Array[Byte](len - 4)
      in.readFully(body)
      (typ, body)
    }
  }

  /** Fire a CancelRequest for another session's backend key (its own
    * connection, per the protocol — the victim continues independently). */
  def cancel(host: String, port: Int, key: (Int, Int)): Unit = {
    val s = new Socket(host, port)
    try {
      val out = new DataOutputStream(s.getOutputStream)
      out.writeInt(16); out.writeInt(80877102)
      out.writeInt(key._1); out.writeInt(key._2)
      out.flush()
    } finally s.close()
  }

  private type IOException = java.io.IOException

  private def parseRowDescription(b: Array[Byte]): Vector[(String, Int)] = {
    val n = readShort(b, 0)
    var pos = 2
    val out = Vector.newBuilder[(String, Int)]
    (0 until n).foreach { _ =>
      val (name, p) = cString(b, pos)
      val oid = readInt(b, p + 6)
      out += ((name, oid))
      pos = p + 18 // tableOID(4) attnum(2) typeOID(4) typlen(2) typmod(4) fmt(2)
    }
    out.result()
  }

  private def parseDataRow(b: Array[Byte]): Vector[Option[String]] = {
    val n = readShort(b, 0)
    var pos = 2
    val out = Vector.newBuilder[Option[String]]
    (0 until n).foreach { _ =>
      val len = readInt(b, pos); pos += 4
      if (len < 0) out += None
      else { out += Some(new String(b, pos, len, UTF_8)); pos += len }
    }
    out.result()
  }

  private[server] def parseError(b: Array[Byte]): ServerError = {
    var pos = 0
    var state = ""; var message = ""
    while (pos < b.length && b(pos) != 0) {
      val code = b(pos).toChar
      val (v, p) = cString(b, pos + 1)
      code match {
        case 'C' => state = v
        case 'M' => message = v
        case _ => ()
      }
      pos = p
    }
    ServerError(state, message)
  }

  private def cString(b: Array[Byte], from: Int): (String, Int) = {
    var end = from
    while (end < b.length && b(end) != 0) end += 1
    (new String(b, from, end - from, UTF_8), math.min(end + 1, b.length))
  }

  private def readShort(b: Array[Byte], at: Int): Int =
    ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)

  private def readInt(b: Array[Byte], at: Int): Int =
    ((b(at) & 0xff) << 24) | ((b(at + 1) & 0xff) << 16) |
      ((b(at + 2) & 0xff) << 8) | (b(at + 3) & 0xff)
}
