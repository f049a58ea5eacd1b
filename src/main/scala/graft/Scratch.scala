package graft

/** Managed scratch directories for queries whose OPERATOR is a physical
  * write (q227's bucketed tables, q230's partitioned layout).
  *
  * Two fixes over the raw `java.io.tmpdir + dir.hashCode` scheme they
  * started with (ADVICE r12): the key is a collision-resistant MD5 digest
  * of the full input path — `String.hashCode` is 32 bits, so two distinct
  * data dirs (a ScalingProbe replica set, say) could silently share and
  * overwrite one layout — and every issued directory is registered for
  * recursive deletion at JVM exit, so Verify/Bench runs stop accumulating
  * abandoned layout trees in /tmp.
  */
object Scratch {

  private val registered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() => {
    registered.forEach(p => delete(new java.io.File(p)))
  }))

  /** This JVM's pid, baked into every issued path (ADVICE r13): two
    * concurrent JVMs pointed at the same data dir (an sbt test run
    * overlapping a Bench/Verify run) would otherwise compute the SAME
    * scratch path, and the first to exit would recursively delete the
    * other's live bucketed/partitioned layout mid-query. The trade — a
    * SIGKILL'd JVM leaves its tree for the host's tmp reaper instead of a
    * successor run overwriting it in place — is the right one: stale disk
    * is recoverable, a deleted live layout is a wrong answer. */
  private val pid: Long = java.lang.ProcessHandle.current().pid()

  /** Absolute path of a scratch directory under `java.io.tmpdir`, keyed by
    * a collision-resistant digest of `key` plus this JVM's pid (same key →
    * same path WITHIN a JVM, so re-runs stay overwrite-idempotent; disjoint
    * across JVMs, so concurrent runs can't delete each other's layouts),
    * cleaned up recursively when the JVM exits. The directory itself is
    * NOT created — writers own that. */
  def dir(prefix: String, key: String): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"), s"$prefix${tag(key)}_p$pid")
    hook
    registered.add(f.getAbsolutePath)
    f.getAbsolutePath
  }

  /** Hex MD5 of `key` — also usable directly where a catalog-safe token is
    * needed (q227 tags its bucketed table NAMES with it, so two data dirs
    * never collide on one catalog entry either). */
  def tag(key: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def delete(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(delete)
    f.delete(): Unit
  }
}
