package graft.streaming
object HllCheckTmp {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local(4, "hllcheck")
    try {
      val r = s.sql("SELECT hll_sketch_estimate(hll_union_agg(sk)) FROM (SELECT hll_sketch_agg(id, 14) sk FROM range(1000) GROUP BY id % 4)").head().getLong(0)
      println(s"HLL OK estimate=$r")
    } catch { case e: Throwable => println(s"HLL MISSING: ${e.getMessage.take(100)}") }
    s.stop()
  }
}
