package graft.mask

import java.io.ByteArrayOutputStream

/** Git-versioned mask configs — the reference fetches its mask file from
  * a git repo at a pinned `maskFileVersion` and diffs versions to decide
  * which tables must be reloaded (tipoca-stream
  * pkg/transformer/masker/mask_config.go:84–148,
  * controllers/mask_diff.go:16–128).
  *
  * Re-expressed for this engine: configs are read with
  * `git show <ref>:<path>` against a LOCAL clone — the control plane (or
  * operator) maintains the checkout; cloning/token auth is deployment
  * tooling exactly as the reference's `git.New(...).Clone()` is, and this
  * container has no network egress to exercise it. Version pinning,
  * parsing and the version-to-version reload decision — the engine-side
  * semantics — are all here and spec-driven from real commits.
  */
object GitMaskStore {

  /** `git show <ref>:<path>` — the file's bytes at that version. `path`
    * is repo-relative. Throws with git's stderr on a bad ref/path. */
  def show(repoDir: String, ref: String, path: String): String =
    git(repoDir, "show", s"$ref:$path")

  /** Resolve a ref (branch, tag, short sha) to the full commit sha — the
    * stable version identity recorded in release audit trails. */
  def resolve(repoDir: String, ref: String): String =
    git(repoDir, "rev-parse", ref).trim

  /** The mask config as of `ref`. */
  def load(repoDir: String, ref: String, path: String): MaskConfig =
    MaskConfig.parse(show(repoDir, ref, path))

  /** Tables whose masking rules differ between the two versions — each
    * needs a `_reload_<v>` rebuild + release (SURVEY §2.7 O2/O3/O6). */
  def changedTables(repoDir: String, refCurrent: String,
      refDesired: String, path: String): Set[String] =
    MaskDiff.changedTables(
      load(repoDir, refCurrent, path), load(repoDir, refDesired, path))

  /** True when moving current→desired requires no reloads. */
  def identical(repoDir: String, refCurrent: String, refDesired: String,
      path: String): Boolean =
    MaskDiff.identical(
      load(repoDir, refCurrent, path), load(repoDir, refDesired, path))

  private def git(repoDir: String, args: String*): String = {
    val cmd = (Seq("git", "-C", repoDir) ++ args)
    // stderr goes to a temp file, NOT a pipe read after stdout: a child
    // filling the stderr pipe buffer while we block draining stdout
    // would deadlock both processes
    val errFile = java.io.File.createTempFile("graft-git-err", ".txt")
    try {
      val p = new ProcessBuilder(cmd: _*)
        .redirectError(errFile)
        .start()
      val out = new ByteArrayOutputStream()
      p.getInputStream.transferTo(out)
      val code = p.waitFor()
      if (code != 0)
        throw new IllegalArgumentException(
          s"git ${args.mkString(" ")} failed ($code): " +
            java.nio.file.Files.readString(errFile.toPath).trim)
      out.toString("UTF-8")
    } finally errFile.delete()
  }
}
