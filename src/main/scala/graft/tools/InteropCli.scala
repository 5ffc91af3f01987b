package graft.tools

import java.nio.file.{Files, Paths}

import graft.core._

/** Tiny CLI used to demonstrate byte-level interop with the reference
  * library's file format (write sketches here, load them with pyprobables,
  * and the reverse). Usage:
  *   runMain graft.tools.InteropCli export <dir>   — write bloom/cbf/cms/cuckoo exports
  *   runMain graft.tools.InteropCli load <dir>     — load those files back, print checks
  */
object InteropCli {
  def main(args: Array[String]): Unit = args match {
    case Array("export", dir) =>
      val blm = BloomFilter.empty(50, 0.01)
      (0 until 20).foreach(i => blm.add(s"url-$i"))
      Files.write(Paths.get(dir, "scala_bloom.blm"), blm.toBytes)

      val cbf = CountingBloomFilter.empty(50, 0.01)
      (0 until 20).foreach(i => cbf.add(s"url-$i", (i % 3) + 1))
      Files.write(Paths.get(dir, "scala_cbf.cbm"), cbf.toBytes)

      val cms = CountMinSketch.empty(1000, 5)
      (0 until 20).foreach(i => cms.add(s"url-$i", i + 1))
      Files.write(Paths.get(dir, "scala_cms.cms"), cms.toBytes)

      val cko = CuckooFilter(capacity = 1000)
      (0 until 20).foreach(i => cko.add(s"url-$i"))
      Files.write(Paths.get(dir, "scala_cuckoo.cko"), cko.toBytes)
      println(s"exported 4 sketches to $dir")

    case Array("load", dir) =>
      val blm = BloomFilter.fromBytes(Files.readAllBytes(Paths.get(dir, "py_bloom.blm")))
      val blmOk = (0 until 20).forall(i => blm.check(s"url-$i")) && !blm.check("absent-key")
      println(s"bloom: els_added=${blm.elsAdded} members_ok=$blmOk")

      val cms = CountMinSketch.fromBytes(Files.readAllBytes(Paths.get(dir, "py_cms.cms")))
      val cmsCounts = (0 until 5).map(i => cms.check(s"url-$i")).mkString(",")
      println(s"cms: els_added=${cms.elementsAdded} counts(url-0..4)=$cmsCounts")

      val cko = CuckooFilter.fromBytes(Files.readAllBytes(Paths.get(dir, "py_cuckoo.cko")))
      val ckoOk = (0 until 20).forall(i => cko.check(s"url-$i")) && !cko.check("absent-key")
      println(s"cuckoo: inserted=${cko.elementsAdded} members_ok=$ckoOk")

    case Array("workload", opsFile, dir) =>
      // randomized differential: apply an ops script (op \t key \t count) to
      // every structure, export — the same script runs through the reference
      // library and the exports are byte-compared
      val blm = BloomFilter.empty(5000, 0.01)
      val cbf = CountingBloomFilter.empty(2000, 0.01)
      val cms = CountMinSketch.empty(1024, 7)
      val cko = CuckooFilter(capacity = 20000)
      val ccf = CountingCuckooFilter(capacity = 20000, bucketSize = 2)
      scala.io.Source.fromFile(opsFile, "UTF-8").getLines().foreach { line =>
        val parts = line.split("\t", -1)
        val (op, key, n) = (parts(0), parts(1), parts(2).toLong)
        op match {
          case "add" =>
            blm.add(key); cbf.add(key, n); cms.add(key, n); cko.add(key); ccf.add(key)
          case "remove" =>
            cbf.remove(key, n); cms.remove(key, n)
          case other => sys.error(s"unknown op $other")
        }
      }
      Files.write(Paths.get(dir, "w_bloom.blm"), blm.toBytes)
      Files.write(Paths.get(dir, "w_cbf.cbm"), cbf.toBytes)
      Files.write(Paths.get(dir, "w_cms.cms"), cms.toBytes)
      Files.write(Paths.get(dir, "w_cuckoo.cko"), cko.toBytes)
      Files.write(Paths.get(dir, "w_ccf.cck"), ccf.toBytes)
      // quotient filter differential: the reference QF has no byte export, so
      // compare the lossless hash enumeration + elements_added instead
      val qf = QuotientFilter(12, autoExpand = true)
      scala.io.Source.fromFile(opsFile, "UTF-8").getLines().foreach { line =>
        val parts = line.split("\t", -1)
        parts(0) match {
          case "add"    => qf.add(parts(1))
          case "remove" => qf.remove(parts(1))
          case _        =>
        }
      }
      Files.writeString(Paths.get(dir, "w_qf.txt"),
        s"q=${qf.q} added=${qf.elementsAdded}\n" +
          qf.hashes().sorted.mkString("\n"))
      println("workload exports written")

    case _ =>
      System.err.println("usage: InteropCli export|load|workload <dir>")
      sys.exit(2)
  }
}
