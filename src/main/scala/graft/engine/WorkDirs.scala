package graft.engine

/** Per-process scratch roots under /tmp for operators that materialize
  * data layouts (bucketed twins, partitioned/JSONL round-trips). Keyed
  * by pid so concurrent JVMs (a bench and a verify run on one machine)
  * never race on each other's files, and removed by a shutdown hook so
  * stale copies don't accumulate across runs (ADVICE r5). At cluster
  * scale the equivalents live on the shared filesystem with real
  * lifecycle management; /tmp-per-process is the local-mode stand-in.
  */
object WorkDirs {

  private val roots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The process-scoped root for `prefix`, creating the cleanup hook on
    * first use. The directory itself is created lazily by writers.
    * Also sweeps siblings left by DEAD processes: the shutdown hook
    * never runs on SIGKILL/OOM-kill, and pid-named dirs are never
    * reused, so without the sweep each crashed run would leak its
    * materializations (GBs at blowup scale) until /tmp fills.
    */
  def processScoped(prefix: String): String =
    roots.computeIfAbsent(prefix, p => {
      sweepStale(p)
      val root = s"/tmp/${p}_${ProcessHandle.current().pid()}"
      Runtime.getRuntime.addShutdownHook(new Thread(() => rm(new java.io.File(root))))
      root
    })

  private def sweepStale(prefix: String): Unit = {
    val self = ProcessHandle.current().pid()
    val kids = new java.io.File("/tmp").listFiles()
    if (kids != null) kids.foreach { f =>
      val name = f.getName
      // symlink guard: /tmp is world-writable — a planted
      // `prefix_<deadpid>` symlink must not let the sweep delete files
      // it points to (File.listFiles follows links); rm also re-checks
      if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath) &&
          name.startsWith(s"${prefix}_")) {
        val pid = name.stripPrefix(s"${prefix}_")
        // length cap: /tmp is world-writable, and an all-digit suffix
        // beyond Long range would make toLong throw out of the sweep
        if (pid.nonEmpty && pid.length <= 18 && pid.forall(_.isDigit) &&
            pid.toLong != self &&
            !ProcessHandle.of(pid.toLong).map[Boolean](_.isAlive).orElse(false))
          rm(f)
      }
    }
  }

  private def rm(f: java.io.File): Unit = {
    // never recurse through a symlink — delete the link itself only
    if (!java.nio.file.Files.isSymbolicLink(f.toPath)) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
    }
    f.delete()
    ()
  }

  /** Deterministic 64-bit tag for keying materializations by their
    * source (e.g. the sf dir) so different inputs never collide.
    */
  def tag64(key: String): String = {
    val hi = scala.util.hashing.MurmurHash3.stringHash(key, 0x9747b28c).toLong
    val lo = scala.util.hashing.MurmurHash3.stringHash(key, 0x85ebca6b).toLong
    java.lang.Long.toHexString((hi << 32) | (lo & 0xFFFFFFFFL))
  }
}
