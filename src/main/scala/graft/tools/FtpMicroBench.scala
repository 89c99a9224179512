package graft.tools

import java.nio.file.Files

import graft.pipeline.testkit.FakeFtpServer
import graft.pipeline.transfer.FtpClient

object FtpMicroBench {
  def main(args: Array[String]): Unit = {
    val root = Files.createTempDirectory("graft-ftp-micro")
    Files.createDirectories(root.resolve("d"))
    for (i <- 1 to 300)
      Files.write(root.resolve(s"d/f$i.bin"), ("x" * 400).getBytes)
    val srv = new FakeFtpServer(root)
    val c = new FtpClient("127.0.0.1", srv.port)
    c.connect(); c.login("u", "p")
    // warm
    for (i <- 1 to 10) c.retrBytes(s"/d/f$i.bin")
    var tPasv = 0L; var tRetr = 0L
    val t0 = System.nanoTime()
    for (i <- 1 to 300) c.retrBytes(s"/d/f$i.bin")
    val dt = (System.nanoTime() - t0) / 1e6
    println(f"300 RETR in $dt%.1f ms = ${dt / 300}%.2f ms/file")
    // isolate control-channel latency: NOOP round trips
    val t1 = System.nanoTime()
    for (_ <- 1 to 300) c.cmd("NOOP")
    val dt1 = (System.nanoTime() - t1) / 1e6
    println(f"300 NOOP in $dt1%.1f ms = ${dt1 / 300}%.2f ms/cmd")
    // isolate data-channel setup: PASV-only round trips
    val t2 = System.nanoTime()
    for (_ <- 1 to 300) c.cmd("PASV")
    val dt2 = (System.nanoTime() - t2) / 1e6
    println(f"300 PASV in $dt2%.1f ms = ${dt2 / 300}%.2f ms/cmd")
    c.quit(); c.close(); srv.stop()
  }
}
