package graft.tools

import java.util.concurrent.{Callable, Executors, TimeUnit}

/** Calibration: aggregate memory read bandwidth at P threads — each thread
  * streams its own 256 MB byte array (sum fold, defeats dead-code
  * elimination), so the measurement is pure DRAM traffic with zero locking.
  * Places a measured ceiling next to the vCPU ladder in BENCH/BASELINE.md:
  * if aggregate GB/s stops growing past P threads, no scan-bound job can
  * scale past P on this box regardless of its compute efficiency.
  */
object MemBandwidth {
  /** Per-thread array: large enough to defeat caches, capped so P threads
    * stay within ~4 GB total heap. */
  private def arrBytes(p: Int): Int = math.min(256L << 20, (2048L << 20) / p).toInt

  private def streamSum(a: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < a.length) { s += a(i); i += 8 } // one read per 8 bytes: cacheline-bound
    s
  }

  def main(args: Array[String]): Unit = {
    val levels = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 4, 8, 16, 32)
    println("threads,agg_gb_per_sec")
    levels.foreach { p =>
      val bytesPer = arrBytes(p)
      val pool = Executors.newFixedThreadPool(p)
      val arrays = (0 until p).map { i =>
        val a = new Array[Byte](bytesPer)
        java.util.Arrays.fill(a, (i + 1).toByte)
        a
      }
      // warm-up
      arrays.foreach(streamSum)
      val passes = 4
      val t0 = System.nanoTime()
      val futs = arrays.map { a =>
        pool.submit(new Callable[Long] {
          def call(): Long = { var s = 0L; var k = 0; while (k < passes) { s += streamSum(a); k += 1 }; s }
        })
      }
      val sink = futs.map(_.get()).sum
      val sec = (System.nanoTime() - t0) / 1e9
      pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
      val gb = p.toLong * passes * bytesPer / 1e9
      println(f"$p,${gb / sec}%.1f${if (sink == 42) "!" else ""}")
    }
  }
}
