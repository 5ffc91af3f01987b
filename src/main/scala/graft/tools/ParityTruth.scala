package graft.tools

import graft.spark.ParityQueries

/** Dev tool: dump the ENGINE side of the reference-parity fixture rows
  * (q_export_parity / q_sketch_removes / q_hash_chains). The oracle literals
  * in [[graft.SparkEntry]] come from running the ACTUAL reference library
  * over the same sequences:
  *
  * {{{
  * PYTHONPATH=/root/reference python3 - <<'EOF'
  *   # build key_0..key_499 into each structure with the ParityQueries
  *   # parameters, remove key_0..key_99, print md5s/stats — see the
  *   # q_export_parity scaladoc for the exact per-structure sequences
  * EOF
  * }}}
  *
  * Every row this tool prints must equal the reference output EXCEPT the
  * qf export md5/n_bytes (the reference QuotientFilter has no export at
  * all — graft's byte codec is an engine extension, so its md5 literal is
  * engine-derived and marked as such in the oracle comment). Rerun after
  * ANY change to a sketch byte layout, hasher, or `toString` template.
  */
object ParityTruth {
  def main(args: Array[String]): Unit = {
    // sequential builds of every structure (the agg-built ones are
    // order-independent, so the sequential kernel prints the same bytes the
    // distributed agg produces — SparkAggSpec pins that equality)
    val keys = (0 until ParityQueries.NKeys).map(ParityQueries.keyName)

    val bloom = graft.core.BloomFilter.empty(1000, 0.05)
    keys.foreach(bloom.add)
    println("export_parity bloom " + ParityQueries.bloomRow(bloom.toBytes))

    val cbf = graft.core.CountingBloomFilter.empty(1000, 0.05)
    keys.zipWithIndex.foreach { case (k, i) => cbf.add(k, i % 3 + 1) }
    println("export_parity cbf " + ParityQueries.cbfRow(cbf.toBytes))

    val cms = graft.core.CountMinSketch.empty(1000, 5)
    keys.zipWithIndex.foreach { case (k, i) => cms.add(k, i % 7 + 1) }
    println("export_parity cms " + ParityQueries.cmsRow(cms.toBytes))

    println("export_parity ebf " + ParityQueries.ebfRow())
    println("export_parity cuckoo " + ParityQueries.cuckooRow())
    println("export_parity ccf " + ParityQueries.ccfRow())
    println("export_parity rbf " + ParityQueries.rbfRow())
    println("export_parity qf " + ParityQueries.qfRow())

    val cbfA = graft.core.CountingBloomFilter.empty(1000, 0.05)
    (0 until 300).foreach(i => cbfA.add(ParityQueries.keyName(i), i % 3 + 1))
    val cbfB = graft.core.CountingBloomFilter.empty(1000, 0.05)
    (200 until 500).foreach(i => cbfB.add(ParityQueries.keyName(i), i % 3 + 1))
    println("cbf_algebra " + ParityQueries.cbfAlgebraRow(cbfA.toBytes, cbfB.toBytes))

    println("removes cbf " + ParityQueries.cbfRemoveRow(cbf.toBytes))
    println("removes cms " + ParityQueries.cmsRemoveRow(cms.toBytes))
    println("removes cuckoo " + ParityQueries.cuckooRemoveRow())
    println("removes ccf " + ParityQueries.ccfRemoveRow())
    println("removes rbf " + ParityQueries.rbfPopRow())
    println("removes qf " + ParityQueries.qfRemoveRow())

    ParityQueries.ChainKeys.foreach { k =>
      val intChain = new graft.hash.ChainedIntHasher(graft.hash.Fnv.fnv1a64, "int-chain-fnv")
      def csv(a: Array[Long]) = a.map(java.lang.Long.toUnsignedString).mkString(",")
      println(s"chain $k fnv " + csv(graft.hash.Fnv1aHasher.hashes(k, 5)))
      println(s"chain $k md5 " + csv(graft.hash.Hashers.md5.hashes(k, 5)))
      println(s"chain $k sha256 " + csv(graft.hash.Hashers.sha256.hashes(k, 5)))
      println(s"chain $k fnv_int_chain " + csv(intChain.hashes(k, 5)))
    }
  }
}
