package graft.tools

/** Quick ambient probe: the same fixed FNV loops as Bench's anchors
  * (1-thread and n-thread), printed once — compare against the committed
  * bench_full.json anchors to tell machine noise from plan changes.
  * NOT part of the driver contract. */
object Anchor {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(32)
    def once(t0: Long): Double = {
      var x = 1469598103934665603L + t0
      var i = 0
      while (i < 200000000) { x = (x ^ i) * 1099511628211L; i += 1 }
      if (x == 42) print("")
      0.0
    }
    // warm
    once(0)
    val t1 = System.nanoTime(); once(0)
    val single = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val threads = (0 until n).map(t => new Thread(() => once(t)))
    threads.foreach(_.start()); threads.foreach(_.join())
    val mt = (System.nanoTime() - t2) / 1e9
    println(f"[anchor] cpu=$single%.3f cpu_mt($n)=$mt%.3f")
  }
}
