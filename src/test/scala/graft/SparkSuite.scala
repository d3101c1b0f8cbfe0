package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for DataFrame specs — one session per JVM
  * (ScalaTest forks a single JVM; suites share via getOrCreate).
  */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", tempDir("graft-warehouse"))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Temp directory recursively deleted at JVM exit — staged parquet
    * fixtures must not accumulate across test runs (r11 advice). The
    * walk does not follow symlinks, so a fixture dir of symlinks into
    * /root/testdata deletes only the links. */
  def tempDir(prefix: String): String =
    SparkSuite.registerForCleanup(java.nio.file.Files.createTempDirectory(prefix))

  // (companion holds the shared cleanup registry)

  /** Set session confs for the duration of `f`, restoring prior values
    * (or unsetting) afterwards — the shared session must not leak conf
    * between suites. */
  def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val prior = pairs.map { case (k, _) => k -> scala.util.Try(spark.conf.get(k)).toOption }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

object SparkSuite {
  private val cleanupDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      cleanupDirs.forEach { root =>
        try {
          import scala.jdk.CollectionConverters._
          val walk = java.nio.file.Files.walk(root) // does not follow symlinks
          try walk.sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(p =>
              try java.nio.file.Files.deleteIfExists(p)
              catch { case _: java.io.IOException => () })
          finally walk.close()
        } catch { case _: java.io.IOException => () }
      }))

  private[graft] def registerForCleanup(p: java.nio.file.Path): String = {
    hookInstalled
    cleanupDirs.add(p)
    p.toString
  }
}
