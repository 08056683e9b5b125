package graft.ops

/** Process-lifetime scratch directories for query-produced artifacts that
  * must OUTLIVE the query builder (lazily-read state tables, streaming
  * sink readbacks) but not the JVM: deletion is deferred to a single
  * shutdown hook, bounding the tmp-dir leak to process lifetime instead
  * of unbounded growth across bench/verify sweeps (each Bench sample
  * re-invokes every query builder).
  */
object Scratch {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(p => rm(p))
    }, "graft-scratch-cleanup"))
    ()
  }

  /** A fresh temp dir under java.io.tmpdir, deleted at JVM exit. */
  def dir(prefix: String): java.nio.file.Path = {
    hookInstalled
    val p = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")), prefix)
    registered.add(p)
    p
  }

  private def rm(root: java.nio.file.Path): Unit =
    try {
      val st = java.nio.file.Files.walk(root)
      try st.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => { java.nio.file.Files.deleteIfExists(q); () })
      finally st.close()
    } catch { case scala.util.control.NonFatal(_) => () }
}
