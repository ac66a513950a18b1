package graft.rdf

/** Standalone parser-throughput probe (no Spark): parses the same document
  * repeatedly across a configurable number of JVM threads. Isolates kernel
  * scaling from Spark-side effects. */
object ThroughputProbe {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 8
    val perThread = if (args.length > 1) args(1).toInt else 20000
    val doc = """<?xml version="1.0"?><rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:g="http://graft.dev/voc#" xml:base="http://graft.dev/doc/"><g:Document rdf:about="d123" g:source="src7"><g:lang>en</g:lang><g:chars rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">157</g:chars><g:corpus rdf:resource="corpus/src7"/></g:Document></rdf:RDF>"""
    // warmup
    (1 to 20000).foreach(_ => RdfXmlParser.parse(doc))
    val t0 = System.nanoTime()
    val ts = (1 to threads).map { _ =>
      new Thread(() => {
        var i = 0
        while (i < perThread) { RdfXmlParser.parse(doc); i += 1 }
      })
    }
    ts.foreach(_.start())
    val sampler = new Thread(() => {
      while (ts.exists(_.isAlive)) {
        Thread.sleep(1000)
        val states = ts.filter(_.isAlive).groupBy(_.getState).map { case (k, v) => s"$k=${v.size}" }
        val frames = ts.filter(_.isAlive).flatMap(t => t.getStackTrace.headOption)
          .groupBy(f => f.getClassName + "." + f.getMethodName)
          .toSeq.sortBy(-_._2.size).take(5).map { case (k, v) => s"$k=${v.size}" }
        if (states.nonEmpty) println("STATES " + states.mkString(" ") + " | TOP " + frames.mkString(" "))
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    ts.foreach(_.join())
    val secs = (System.nanoTime() - t0) / 1e9
    val docs = threads.toLong * perThread
    println(f"threads=$threads docs=$docs secs=$secs%.2f docs_per_sec=${docs / secs}%.0f per_thread=${docs / secs / threads}%.0f")
  }
}

/** Pure allocation-rate probe: how many GB/s of short-lived byte arrays can
  * N threads sustain? Distinguishes GC/bandwidth ceilings from lock
  * contention when the parser probe stops scaling. */
object AllocProbe {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 8
    val mbPerThread = if (args.length > 1) args(1).toInt else 2000
    @volatile var sink: Array[Byte] = null
    val t0 = System.nanoTime()
    val ts = (1 to threads).map { _ =>
      new Thread(() => {
        var i = 0
        val iters = mbPerThread * 64 // 16KB chunks
        while (i < iters) { sink = new Array[Byte](16 * 1024); i += 1 }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    val secs = (System.nanoTime() - t0) / 1e9
    val gb = threads.toDouble * mbPerThread / 1024
    println(f"threads=$threads gb=$gb%.1f secs=$secs%.2f gb_per_sec=${gb / secs}%.1f")
  }
}

object EnvProbe {
  def main(args: Array[String]): Unit = {
    println("availableProcessors=" + Runtime.getRuntime.availableProcessors())
    println("Cpus_allowed_list=" + scala.io.Source.fromFile("/proc/self/status").getLines()
      .filter(l => l.startsWith("Cpus_allowed_list")).mkString)
  }
}
