package graft.operators

/** The ENSURE-ONLY routing watermark shared by every rollup that the
  * optimizer rewrite layer ([[graft.plans.RollupRoutingRule]]) may
  * substitute for a raw aggregate: `ensure`/`reEnsure` record the
  * exact data-file listing they wrote; any mutator that can make the
  * rollup a SUPERSET of the raw aggregate (an out-of-band
  * appendBatch) deletes the manifest FIRST, so a crash between the
  * delete and the append fails CLOSED (routing off), never open. The
  * rewrite routes only while [[holds]] — artifact ready AND the
  * listing still byte-matches — so an append, a torn write, or any
  * out-of-band mutation all veto routing instead of silently breaking
  * its exactness proof (the r8 advice's medium finding: the
  * fingerprint in the artifact path tracks only the RAW table and
  * cannot see rollup-side mutation). */
private[graft] object EnsureWatermark {

  private val ManifestFile = "_GRAFT_ENSURE_MANIFEST"

  private def dataListing(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String =
    fs.listStatus(p)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => s"${st.getPath.getName}:${st.getLen}")
      .sorted.mkString("\n")

  /** Record the current data-file listing as the routed build. */
  def write(path: String): Unit = {
    val (fs, p) = IndexStore.fsOf(path)
    val out = fs.create(new org.apache.hadoop.fs.Path(p, ManifestFile), true)
    try out.write(dataListing(fs, p).getBytes("UTF-8")) finally out.close()
  }

  /** Veto routing BEFORE mutating the table (call first, fail-closed). */
  def invalidate(path: String): Unit = {
    val (fs, p) = IndexStore.fsOf(path)
    fs.delete(new org.apache.hadoop.fs.Path(p, ManifestFile), false)
    ()
  }

  /** True iff the artifact is ready AND is exactly what the last
    * ensure/reEnsure built — the rewrite layer's routing
    * precondition. */
  def holds(path: String): Boolean = {
    if (!IndexStore.artifactReady(path)) return false
    val (fs, p) = IndexStore.fsOf(path)
    val m = new org.apache.hadoop.fs.Path(p, ManifestFile)
    try {
      val in = fs.open(m)
      val recorded = try {
        val bs = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bs, 4096, false)
        new String(bs.toByteArray, "UTF-8")
      } finally in.close()
      recorded == dataListing(fs, p)
    } catch { case _: java.io.FileNotFoundException => false }
  }
}
