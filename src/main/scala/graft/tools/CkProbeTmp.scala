package graft.tools
object CkProbeTmp {
  def main(args: Array[String]): Unit = {
    val c = graft.core.CuckooFilter(capacity = 1000, bucketSize = 4, maxSwaps = 500)
    Seq("key_0","key_1","key_50","key_450","key_499").foreach { k =>
      println(k + " " + c.fingerprintInfo(k))
    }
    val cc = graft.core.CountingCuckooFilter(capacity = 1000, bucketSize = 4, maxSwaps = 500)
    (0 until 500).foreach { i =>
      val before = cc.insertedElements
      (0 until (i % 3 + 1)).foreach(_ => cc.add(s"key_$i"))
      val delta = cc.insertedElements - before
      if (delta != (i % 3 + 1)) println(s"ccf count anomaly at key_$i: delta=$delta expected=${i % 3 + 1}")
    }
    println("ccf total " + cc.insertedElements + " unique " + cc.uniqueElements)
  }
}
