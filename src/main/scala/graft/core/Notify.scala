package graft.core

/** Release notification (tipoca-stream pkg/notify/notify.go:24–36,
  * controllers/release.go:178–206, controllers/status.go:424–460): when
  * a reloaded table (or the whole sink) goes live, a message with the
  * mask version and a version-compare link is posted to a channel.
  *
  * The engine side is the message composition and the decision of WHEN
  * to notify; the transport is one HTTP POST that the deployment wires
  * in (the reference injects a Slack client from a secret — and skips
  * notification entirely when the secret is absent, which is the `Noop`
  * default here; this container has no egress to exercise a real post).
  */
trait Notifier {
  def notify(message: String): Unit
}

object Notify {

  /** Reference behavior when no credentials are configured: do nothing
    * (release.go:187–189 nil-notifier guard). */
  object Noop extends Notifier {
    def notify(message: String): Unit = ()
  }

  /** Collecting transport — audit trails and specs. */
  final class Buffer extends Notifier {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    def notify(message: String): Unit = buf.synchronized { buf += message }
    def messages: Seq[String] = buf.synchronized(buf.toSeq)
  }

  /** Short display sha (release.go:190–193). */
  def shortSha(version: String): String =
    if (version.length >= 6) version.take(6) else version

  /** Per-topic release message (release.go:194–205): the released table,
    * a link to the mask file at the new version, and a compare link for
    * the mask changes that caused the reload. */
  def topicRelease(schema: String, table: String, repo: String,
      filePath: String, currentVersion: String,
      desiredVersion: String): String =
    s"Released table *$schema.$table* with mask-version: " +
      s"<https://github.com/$repo/blob/$desiredVersion/$filePath | " +
      s"${shortSha(desiredVersion)}> and " +
      s"<https://github.com/$repo/compare/$currentVersion...$desiredVersion" +
      s" | mask-changes>."

  /** Fleet-level message once EVERYTHING is live on the new version
    * (status.go:443–460). Returns None unless the gate holds: all topics
    * released, nothing reloading or realtime, a desired version exists
    * and differs from current — the same four guards the reference
    * checks before notifying. */
  def releaseAll(name: String, allTopics: Int, released: Int,
      reloading: Int, realtime: Int, repo: String, filePath: String,
      currentVersion: String, desiredVersion: String): Option[String] =
    if (allTopics == released && reloading == 0 && realtime == 0 &&
      desiredVersion.nonEmpty && currentVersion != desiredVersion)
      Some(s"$name has $released tables live with mask-version: " +
        s"<https://github.com/$repo/blob/$desiredVersion/$filePath | " +
        s"${shortSha(desiredVersion)}>")
    else None
}
