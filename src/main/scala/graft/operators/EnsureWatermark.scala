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
  * cannot see rollup-side mutation).
  *
  * PLAN-TIME COST (r12 advice): optimizer rules call [[holds]] /
  * [[stampIfHolds]] once per candidate node, so the check must stay a
  * METADATA operation — one directory listing per call (fresh every
  * time: a stale listing would serve a mutated artifact, fail-open).
  * The recorded-manifest FILE read is memoized keyed on its
  * (mtime, length) from that same listing, so repeated checks of an
  * unchanged artifact never re-open the file; the listing itself is
  * never cached. */
private[graft] object EnsureWatermark {

  private val ManifestFile = "_GRAFT_ENSURE_MANIFEST"

  /** (manifest mtime, manifest length) → contents, per path — a
    * rewritten manifest changes both fields in the fresh listing, so
    * the cache can never serve a superseded recording. */
  private val recordedCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, String)]()

  /** RECURSIVE data-file listing: a partition-directory artifact
    * (the entity store's `bucket=` layout) keeps its data files in
    * subdirectories, and a top-level-only listing would record the
    * empty string — making the watermark vacuously true under any
    * bucket-file mutation (r13 review finding). Relative paths keep
    * flat artifacts' stamps byte-identical to the old format; the
    * walk costs one extra listStatus per subdirectory — still a
    * metadata operation. */
  private def dataListing(fs: org.apache.hadoop.fs.FileSystem,
      sts: Array[org.apache.hadoop.fs.FileStatus]): String = {
    def walk(prefix: String,
        arr: Array[org.apache.hadoop.fs.FileStatus]): Seq[String] =
      arr.toIndexedSeq.flatMap { st =>
        if (st.isFile && st.getPath.getName.endsWith(".parquet"))
          Seq(s"$prefix${st.getPath.getName}:${st.getLen}")
        else if (st.isDirectory)
          walk(s"$prefix${st.getPath.getName}/", fs.listStatus(st.getPath))
        else Seq.empty
      }
    walk("", sts).sorted.mkString("\n")
  }

  /** Record the current data-file listing as the routed build. */
  def write(path: String): Unit = {
    val (fs, p) = IndexStore.fsOf(path)
    val listing = dataListing(fs, fs.listStatus(p))
    val out = fs.create(new org.apache.hadoop.fs.Path(p, ManifestFile), true)
    try out.write(listing.getBytes("UTF-8")) finally out.close()
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
  def holds(path: String): Boolean = stampIfHolds(path).isDefined

  /** The current data-file listing when [[holds]] — None otherwise.
    * The returned stamp identifies the exact build, so callers may
    * key caches of EXPENSIVE derived reads (a stats parquet collect,
    * a schema) on it: a reEnsure writes new files → new stamp → the
    * stale entry can never serve. One fresh directory listing per
    * call; the recorded-manifest file read is memoized (see the
    * class scaladoc). */
  def stampIfHolds(path: String): Option[String] = {
    val (fs, p) = IndexStore.fsOf(path)
    val sts =
      try fs.listStatus(p)
      catch { case _: java.io.FileNotFoundException => return None }
    if (!sts.exists(st => st.isFile && st.getPath.getName == "_SUCCESS"))
      return None
    val mf = sts.find(st => st.isFile && st.getPath.getName == ManifestFile)
      .getOrElse(return None)
    val key = (mf.getModificationTime, mf.getLen)
    val cached = recordedCache.get(path)
    val recorded =
      if (cached != null && (cached._1, cached._2) == key) cached._3
      else {
        val in =
          try fs.open(mf.getPath)
          catch { case _: java.io.FileNotFoundException => return None }
        val bytes = try {
          val bs = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, bs, 4096, false)
          new String(bs.toByteArray, "UTF-8")
        } finally in.close()
        recordedCache.put(path, (key._1, key._2, bytes))
        bytes
      }
    val live = dataListing(fs, sts)
    if (recorded == live) Some(live) else None
  }
}
