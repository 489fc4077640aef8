package graft

/** Content fingerprint of the engine sources, stamped into every bench
  * artifact so per-entry min-merging can refuse to mix timings taken
  * under DIFFERENT code (ADVICE r11: after a change that legitimately
  * slows an operator, a stale faster minimum from the old artifact
  * silently survives and the composed number is one no single run can
  * reproduce). MD5 over the sorted relative paths + contents of every
  * .scala file under src/main/scala — mtime-free, so a clean checkout
  * fingerprints identically.
  */
object SrcFingerprint {
  def current(): String =
    try {
      val root = java.nio.file.Paths.get("src/main/scala")
      if (!java.nio.file.Files.isDirectory(root)) return "unknown"
      val md = java.security.MessageDigest.getInstance("MD5")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".scala"))
        .toSeq.sortBy(_.toString)
        .foreach { p =>
          md.update(root.relativize(p).toString.getBytes("UTF-8"))
          md.update(java.nio.file.Files.readAllBytes(p))
        }
      md.digest().map("%02x".format(_)).mkString
    } catch { case _: Exception => "unknown" }
}
