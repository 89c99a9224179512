package graft.pipeline.testkit

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicInteger

/** Minimal in-process FTP server (testkit — shipped in main scope so
  * benchmark queries can exercise the real FTP stack without infra), rooted at
  * a sandbox directory. Supports exactly the verbs our client speaks:
  * USER/PASS/TYPE/PASV/PORT/RETR/STOR/NLST/SIZE/RNFR/RNTO/DELE/CWD/MKD/
  * NOOP/QUIT. Mirrors the role of
  * the live test FTP host in the reference's integration tier
  * (/root/reference/tests/test_ftp_integration.py:39-207) without
  * external infra.
  *
  * Concurrency: one thread per control connection, so pool tests can hold
  * several sessions open at once. `connectionsOpened` counts sessions for
  * pool-reuse assertions.
  */
final class FakeFtpServer(root: Path, user: String = "u", pass: String = "p",
    nlstFullPaths: Boolean = false, pasvZeroHost: Boolean = false,
    // RFC 959 leaves RNTO-overwrite server-defined; `true` mimics servers
    // (IIS, some vsftpd configs) that reply 550 when the target exists
    rntoRefusesOverwrite: Boolean = false,
    // first N RNTOs reply 450 (transient) WITHOUT renaming — mimics a
    // flaky server; clients must not treat this like overwrite-refusal
    rntoTransientFailures: Int = 0,
    // every RNTO replies 550 WITHOUT renaming — mimics a write-protected
    // target dir (permission denied); same code as overwrite-refusal,
    // so clients must probe target existence before resolving by DELE
    rntoDenied: Boolean = false,
    // SIZE is an RFC 3659 extension; `true` mimics servers without it
    noSize: Boolean = false,
    // LIST is universal in practice but its line format is not mandated;
    // `true` replies 502 so clients must fall back to NLST + CWD probing
    noList: Boolean = false,
    // first N MKDs reply 550 WITHOUT creating — mimics a transient
    // quota/permission blip; clients must retry the walk on later uploads
    mkdFailures: Int = 0,
    // kill-switch: the first `storKillCount` STORs accept only
    // `storKillAfterBytes` payload bytes, then drop BOTH the data and the
    // control connection without a 226 — a server/network death mid-upload
    // (task-failure injection for retry-idempotence proofs). The partial
    // temp file REMAINS on disk, as it would on a real server.
    storKillAfterBytes: Long = -1L,
    storKillCount: Int = 0) {
  private val server = new ServerSocket(0)
  val port: Int = server.getLocalPort
  val connectionsOpened = new AtomicInteger(0)

  private val rntoTransientLeft = new AtomicInteger(rntoTransientFailures)
  private val mkdFailuresLeft = new AtomicInteger(mkdFailures)
  private val storKillsLeft = new AtomicInteger(storKillCount)

  /** Per-verb command totals (RETR/SIZE/NLST/…) across all sessions —
    * lets specs assert a column-pruned scan performed zero RETRs. */
  private val commandCounts =
    new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
  def commandCount(cmd: String): Int =
    Option(commandCounts.get(cmd.toUpperCase)).map(_.get).getOrElse(0)

  /** Per-(verb, exact argument) totals — lets specs assert e.g. that a
    * recursive scan LISTed each directory exactly once. */
  private val commandArgCounts =
    new java.util.concurrent.ConcurrentHashMap[(String, String), AtomicInteger]()
  def commandCount(cmd: String, arg: String): Int =
    Option(commandArgCounts.get((cmd.toUpperCase, arg))).map(_.get).getOrElse(0)
  @volatile private var running = true

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        // interactive protocol: small command/reply packets must not sit
        // in Nagle's buffer waiting for the peer's (delayed, up to 40 ms)
        // ACK — the write-write-read pattern around data transfers
        // (150 → payload → 226) otherwise stalls every file by one
        // delayed-ACK period
        s.setTcpNoDelay(true)
        connectionsOpened.incrementAndGet()
        new Thread(() => handle(s), "fake-ftp-session").start()
      } catch { case _: Throwable => () }
    }
  }, "fake-ftp-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = { running = false; server.close() }

  private def handle(sock: Socket): Unit = {
    val in = new BufferedReader(new InputStreamReader(sock.getInputStream, US_ASCII))
    val out = sock.getOutputStream
    def reply(s: String): Unit = { out.write((s + "\r\n").getBytes(US_ASCII)); out.flush() }
    var cwd = root
    // ONE passive-mode listener per session, reused across transfers: a
    // fresh ServerSocket per PASV exhausts the ephemeral port range under
    // load (10k+ transfers/min leave every port with a TIME_WAIT tuple,
    // and bind(0) without SO_REUSEADDR refuses them all → BindException).
    // Real servers (vsftpd pasv_min_port pools) reuse listener ports the
    // same way; RFC 959 allows 227 to repeat a port.
    var data: ServerSocket = null
    var activeTarget: Option[(String, Int)] = None
    var loggedIn = false
    var renameFrom: Path = null // pending RNFR target
    // data connection: PASV listener if armed, else PORT connect-back
    // a 5xx reply AFTER the client already connected (it connects as
    // soon as 227 arrives, before sending the verb) leaves a dead
    // connection in the listener backlog; the next accept would grab it
    // and transfer zero bytes. Disarm on those paths — errors are rare,
    // so the extra re-bind never pressures the port range.
    def disarmData(): Unit =
      if (data != null) { data.close(); data = null }
    def openData(): Socket = {
      val d = activeTarget match {
        case Some((h, p)) => activeTarget = None; new Socket(h, p)
        case None => data.accept()
      }
      d.setTcpNoDelay(true)
      d
    }
    reply("220 FakeFTP ready")
    try {
      var line = in.readLine()
      while (line != null) {
        val (cmd, arg) = line.split(" ", 2) match {
          case Array(c, a) => (c.toUpperCase, a)
          case Array(c) => (c.toUpperCase, "")
        }
        commandCounts.computeIfAbsent(cmd, _ => new AtomicInteger(0)).incrementAndGet()
        commandArgCounts.computeIfAbsent((cmd, arg), _ => new AtomicInteger(0)).incrementAndGet()
        cmd match {
          case "USER" => reply(if (arg == user) "331 need password" else "530 unknown user")
          case "PASS" =>
            if (arg == pass) { loggedIn = true; reply("230 logged in") }
            else reply("530 bad password")
          case _ if !loggedIn => reply("530 not logged in")
          case "TYPE" => reply("200 type set")
          case "NOOP" => reply("200 ok")
          case "PASV" =>
            if (data == null) {
              data = new ServerSocket()
              data.setReuseAddress(true)
              data.bind(new InetSocketAddress(0))
            }
            val p = data.getLocalPort
            // pasvZeroHost mimics NAT'd servers that advertise 0,0,0,0 —
            // clients must fall back to the control-connection host
            val hostPart = if (pasvZeroHost) "0,0,0,0" else "127,0,0,1"
            reply(s"227 Entering Passive Mode ($hostPart,${p / 256},${p % 256})")
          case "PORT" =>
            // active mode: server connects back to the client's listener
            val parts = arg.split(",").map(_.trim.toInt)
            if (parts.length != 6) reply("501 bad PORT")
            else {
              activeTarget = Some((parts.take(4).mkString("."), parts(4) * 256 + parts(5)))
              reply("200 PORT ok")
            }
          case "RETR" =>
            val f = resolve(cwd, arg)
            if (!Files.exists(f) || Files.isDirectory(f)) {
              disarmData(); reply(s"550 $arg: no such file")
            }
            else {
              reply("150 opening data connection")
              val d = openData()
              try Files.copy(f, d.getOutputStream)
              finally d.close()
              reply("226 transfer complete")
            }
          case "STOR" =>
            val f = resolve(cwd, arg)
            if (!Files.exists(f.getParent)) {
              disarmData(); reply(s"550 ${arg}: parent missing")
            }
            else if (storKillAfterBytes >= 0 && storKillsLeft.getAndDecrement() > 0) {
              reply("150 opening data connection")
              val d = openData()
              try {
                // accept a prefix of the payload, leave the partial file
                // on disk, then die without a 226 — including the control
                // connection, so the client's session is unusable too
                val is = d.getInputStream
                val os = Files.newOutputStream(f)
                try {
                  val buf = new Array[Byte](1)
                  var copied = 0L
                  var n = 0
                  while (copied < storKillAfterBytes && { n = is.read(buf); n > 0 }) {
                    os.write(buf, 0, n); copied += n
                  }
                } finally os.close()
              } finally d.close()
              sock.close()
              return
            }
            else {
              reply("150 opening data connection")
              val d = openData()
              try Files.copy(d.getInputStream, f,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
              finally d.close()
              reply("226 transfer complete")
            }
          case "NLST" =>
            val d0 = resolve(cwd, arg)
            if (!Files.isDirectory(d0)) {
              disarmData(); reply(s"550 $arg: no such directory")
            }
            else {
              reply("150 opening data connection")
              val d = openData()
              try {
                import scala.jdk.CollectionConverters._
                // real servers commonly return FULL paths from NLST;
                // `nlstFullPaths = true` mimics that for client robustness tests.
                // Directories ARE included — real NLST lists them, and
                // clients that need to discriminate must probe (CWD/SIZE)
                val prefix =
                  if (!nlstFullPaths) ""
                  else if (arg.endsWith("/")) arg else s"$arg/"
                val names = Files.list(d0).iterator().asScala
                  .map(p => s"$prefix${p.getFileName.toString}").toSeq.sorted
                  .mkString("", "\r\n", "\r\n")
                d.getOutputStream.write(names.getBytes(US_ASCII))
                d.getOutputStream.flush()
              } finally d.close()
              reply("226 transfer complete")
            }
          case "LIST" =>
            val d0 = resolve(cwd, arg)
            if (noList) { disarmData(); reply("502 LIST not implemented") }
            else if (!Files.isDirectory(d0)) {
              disarmData(); reply(s"550 $arg: no such directory")
            }
            else {
              reply("150 opening data connection")
              val d = openData()
              try {
                import scala.jdk.CollectionConverters._
                // unix `ls -l` line format — the de-facto standard clients parse
                val lines = Files.list(d0).iterator().asScala.toSeq
                  .sortBy(_.getFileName.toString)
                  .map { p =>
                    // symlink check FIRST: isDirectory/size follow links
                    if (Files.isSymbolicLink(p))
                      s"lrwxrwxrwx 1 $user $user 0 Jan 01 00:00 " +
                        s"${p.getFileName} -> ${Files.readSymbolicLink(p)}"
                    else if (Files.isDirectory(p))
                      s"drwxr-xr-x 2 $user $user 0 Jan 01 00:00 ${p.getFileName}"
                    else
                      s"-rw-r--r-- 1 $user $user ${Files.size(p)} Jan 01 00:00 ${p.getFileName}"
                  }.mkString("", "\r\n", "\r\n")
                d.getOutputStream.write(lines.getBytes(US_ASCII))
                d.getOutputStream.flush()
              } finally d.close()
              reply("226 transfer complete")
            }
          case "RNFR" =>
            val f = resolve(cwd, arg)
            if (Files.exists(f)) { renameFrom = f; reply("350 ready for RNTO") }
            else reply(s"550 $arg: no such file")
          case "RNTO" =>
            if (renameFrom == null) reply("503 RNFR required first")
            else if (rntoTransientLeft.getAndDecrement() > 0) {
              renameFrom = null
              reply(s"450 $arg: requested action not taken, try again")
            } else if (rntoDenied) {
              renameFrom = null
              reply(s"550 $arg: permission denied")
            } else {
              val t = resolve(cwd, arg)
              if (rntoRefusesOverwrite && Files.exists(t)) {
                renameFrom = null
                reply(s"550 $arg: file exists")
              } else try {
                Files.move(renameFrom, t,
                  java.nio.file.StandardCopyOption.REPLACE_EXISTING)
                renameFrom = null
                reply("250 rename ok")
              } catch { case _: Throwable => reply(s"550 $arg: rename failed") }
            }
          case "DELE" =>
            val f = resolve(cwd, arg)
            if (Files.deleteIfExists(f)) reply("250 deleted")
            else reply(s"550 $arg: no such file")
          case "SIZE" =>
            val f = resolve(cwd, arg)
            if (noSize) reply("502 SIZE not implemented")
            else if (Files.isRegularFile(f)) reply(s"213 ${Files.size(f)}")
            else reply(s"550 $arg: no such file")
          case "CWD" =>
            val t = resolve(cwd, arg)
            if (Files.isDirectory(t)) { cwd = t; reply("250 ok") }
            else reply(s"550 $arg: no such directory")
          case "MKD" =>
            val t = resolve(cwd, arg)
            if (mkdFailuresLeft.getAndDecrement() > 0)
              reply(s"550 $arg: cannot create (transient)")
            else
              try { Files.createDirectory(t); reply(s"""257 "$arg" created""") }
              catch { case _: Throwable => reply(s"550 $arg: cannot create") }
          case "QUIT" => reply("221 bye"); return
          case other => reply(s"502 $other not implemented")
        }
        line = in.readLine()
      }
    } catch { case t: Throwable => System.err.println(s"FAKEFTP session died: $t") }
    finally {
      if (data != null) data.close()
      sock.close()
    }
  }

  private def resolve(cwd: Path, arg: String): Path = {
    val p = if (arg.startsWith("/")) root.resolve(arg.drop(1)) else cwd.resolve(arg)
    val n = p.normalize()
    if (!n.startsWith(root)) root else n // sandbox escape → clamp to root
  }
}
