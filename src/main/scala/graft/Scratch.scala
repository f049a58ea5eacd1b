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

  /** Absolute path of a scratch directory under `java.io.tmpdir`, keyed by
    * a collision-resistant digest of `key` (same key → same path, so
    * re-runs stay overwrite-idempotent), cleaned up recursively when the
    * JVM exits. The directory itself is NOT created — writers own that. */
  def dir(prefix: String, key: String): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"), s"$prefix${tag(key)}")
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
