package graft

/** Process-lifetime temp locations (j21's reliable-checkpoint dir, the
  * a6/a7 connector/partitioned demo stores) registered here are deleted
  * recursively by ONE JVM shutdown hook — repeated bench/verify/test runs
  * must not accumulate abandoned copies in java.io.tmpdir. (Spark's
  * ContextCleaner does not remove reliable checkpoint files unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints` was set before the
  * context started, and the deterministic per-pid store names outlive
  * their JVM by design otherwise.) */
object TempCleanup {
  private val tracked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      tracked.forEach(p => deleteRecursively(new java.io.File(p)))))

  /** Track `path` for deletion at JVM exit; returns it for chaining. */
  def register(path: String): String = {
    hookInstalled
    tracked.add(path)
    path
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
