package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Tiny crash-recovery manifests for compact-then-delete maintenance
  * ([[InvertedIndex.compact]], [[Dedup]]'s registry compaction).
  *
  * The compaction pattern — commit a merged output, then delete its
  * inputs — has an unavoidable window where BOTH exist; a crash there
  * leaves duplicate rows that the next merge would otherwise bake in
  * permanently (it unions inputs it does not know are copies). The
  * manifest closes that window: before the merged output is written,
  * the compactor publishes (output name, input names); on the next
  * entry, heal() replays the interrupted decision — output committed →
  * finish the deletes; output uncommitted → drop the partial output —
  * so compaction is idempotent-resumable and duplicates never survive
  * a heal. One writer per directory (the registries' existing
  * single-writer contract), so one manifest file suffices.
  */
private[graft] object Manifest {

  /** Atomically publish `lines` at `path`: write a temp sibling, then
    * rename. A crash mid-write leaves only the ignored `.tmp` file —
    * readers never see a partial manifest.
    *
    * Heal-first contract: callers MUST run [[heal]] (which clears any
    * prior manifest) before writing a new one. A delete-then-rename
    * replacement would have a window where NO manifest exists — a crash
    * there silently forgets an in-flight compaction — so replacement is
    * refused outright rather than made to look atomic.
    */
  def write(fs: FileSystem, path: Path, lines: Seq[String]): Unit = {
    require(!fs.exists(path),
      s"manifest already exists at $path: run Manifest.heal() before " +
        "publishing a new compaction (heal-first contract)")
    val tmp = new Path(path.getParent, path.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, path), s"manifest rename failed: $tmp -> $path")
  }

  def read(fs: FileSystem, path: Path): Option[Seq[String]] =
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList)
      finally in.close()
    }

  def delete(fs: FileSystem, path: Path): Unit = {
    fs.delete(path, false)
    ()
  }

  /** The replay itself, shared by every compaction site: entries are
    * `root`-relative, the first is the merge target, the rest its
    * inputs; `marker` maps a dir to its commit-marker file (plain
    * `_SUCCESS` for registry batch dirs, `stats/_SUCCESS` for index
    * segments). Target committed → finish the input deletes; target
    * uncommitted → drop it; then clear the manifest. Idempotent — a
    * crash mid-heal re-heals.
    */
  def heal(fs: FileSystem, manifest: Path, root: String,
           marker: String => Path): Unit =
    read(fs, manifest).foreach { lines =>
      val target = lines.head
      if (fs.exists(marker(s"$root/$target")))
        lines.tail.foreach(i => fs.delete(new Path(s"$root/$i"), true))
      else
        fs.delete(new Path(s"$root/$target"), true)
      delete(fs, manifest)
    }
}
