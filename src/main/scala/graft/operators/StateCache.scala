package graft.operators

import org.apache.spark.sql.SparkSession

/** Content-addressed build-once cache for derived on-disk state (the IVF
  * index, the incremental near-dup band-key state): fingerprint the SOURCE
  * files plus build params, build into a private temp dir, publish by a
  * single filesystem rename. Readers never see a half-written state, a
  * regenerated source at the same path (different length/mtime) gets a
  * different dir so stale state can never serve new data, and two
  * concurrent builders (the Verify and Bench JVMs) can't interleave
  * writes — whoever publishes second just discards its copy and uses the
  * published one. Extracted from IvfIndex so every cached-state user
  * shares ONE publish protocol instead of re-implementing its crash
  * windows. */
object StateCache {

  /** md5 over every data file's (path, length, mtime) + params — 128 bits,
    * so cross-corpus collisions (the 32-bit `String.hashCode` hazard) are
    * a non-issue. */
  private[graft] def fingerprint(spark: SparkSession, srcPath: String,
                          params: String): String = {
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries =
      if (!fs.exists(src)) Seq(s"absent:$src")
      else {
        val it = fs.listFiles(src, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) { val st = it.next()
          buf += s"${st.getPath}|${st.getLen}|${st.getModificationTime}" }
        // single-file table: listFiles on a file path yields that file
        buf.toSeq.sorted
      }
    java.security.MessageDigest.getInstance("MD5")
      .digest((s"$params|" + entries.mkString(";"))
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Build-if-absent; returns the published state dir. Presence is
    * detected by the _SUCCESS markers of every table in `tables`. `build`
    * receives a PRIVATE temp dir and must write all tables under it; the
    * dir is then published by one rename. */
  def ensure(spark: SparkSession, srcPath: String, params: String,
             namePrefix: String, tables: Seq[String])
            (build: String => Unit): String = {
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"$namePrefix-${fingerprint(spark, srcPath, params)}").getAbsolutePath
    def published: Boolean = tables
      .forall(t => new java.io.File(s"$dir/$t/_SUCCESS").exists())
    if (!published) {
      val tmp = dir + "-build-" + java.util.UUID.randomUUID().toString.take(8)
      build(tmp)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // a corrupt partial occupying the target (pre-atomic-publish crash
      // debris) blocks the rename; clear it — but never a complete state
      if (fs.exists(new org.apache.hadoop.fs.Path(dir)) && !published)
        fs.delete(new org.apache.hadoop.fs.Path(dir), true): Unit
      // Hadoop rename onto an EXISTING dir does not fail — local FS moves
      // tmp INSIDE it as a child and reports success — so "the target
      // appeared" must be detected by existence, not by the rename result:
      // a concurrent builder that published while we built wins, and our
      // copy is discarded rather than nested into the winner's state.
      val ok = !fs.exists(new org.apache.hadoop.fs.Path(dir)) &&
        fs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(dir))
      if (!ok) {
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true): Unit
        if (!published)
          throw new java.io.IOException(
            s"StateCache: could not publish state to $dir and no complete state is present")
      }
    }
    dir
  }
}
