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

    case _ =>
      System.err.println("usage: InteropCli export|load <dir>")
      sys.exit(2)
  }
}
